"""Orbax checkpoint/resume for learner + env state.

The reference has no checkpointing at all (SURVEY.md §5: policies were saved
by external trainers, notebooks/run_agent.ipynb loads a spinningup policy).
Here the full training PyTree — network/optimizer params, env lanes, replay
ring, counters — round-trips through orbax, so a run resumes mid-stream with
identical state.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, state: Any, force: bool = True) -> str:
    """Write `state` (any PyTree) to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=force)
    return path


def restore(path: str, template: Any) -> Any:
    """Load a PyTree saved by `save`; `template` supplies structure/dtypes
    (e.g. a freshly-built trainer state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
