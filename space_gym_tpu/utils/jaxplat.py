"""One place for the axon-sitecustomize platform-pin gotcha.

The environment's sitecustomize force-registers the TPU tunnel platform and
sets jax_platforms to "axon,cpu"; the JAX_PLATFORMS env var alone is NOT
honored (CLAUDE.md).  The only override that sticks is
jax.config.update("jax_platforms", "cpu") after `import jax` and before the
first backend touch.  Every CLI entry point (bench.py, tools/train.py,
tools/profile_sac.py, tools/keyboard_agent.py) routes through here so the
platform-selection semantics stay identical.
"""
from __future__ import annotations

import os


def pin_cpu_if_requested(force: bool = False) -> bool:
    """Pin jax to the CPU backend when `force` or JAX_PLATFORMS=cpu is set.
    Returns True iff the pin was applied.  Note JAX_PLATFORMS=axon (the
    ambient TPU tunnel setting) is the NORMAL TPU path, never a CPU pin."""
    env_plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not (force or env_plat == "cpu"):
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
