"""Minimal old-API `gym` shim, just enough to import and run the reference
repo (/root/reference) for golden-trajectory recording.

The real `gym` package is not installed in this image.  The reference targets
the pre-0.26 Gym API (SURVEY.md Q13): `reset() -> obs`, 4-tuple `step`,
`seed()` method, registry `register`/`make` with `max_episode_steps` handled by
a TimeLimit wrapper, and `gym.utils.seeding.np_random` returning a legacy
`np.random.RandomState` seeded through the classic sha512 hash scheme.

This shim reimplements exactly that historical behavior (it is also what
space_gym_tpu.compat reproduces on its side, so goldens are self-consistent).
Only the surface the reference actually touches is provided.
"""
from __future__ import annotations

from . import spaces, utils, envs  # noqa: F401
from .core import Env, Wrapper  # noqa: F401
from .envs.registration import make, register, registry  # noqa: F401

__version__ = "0.18.0-shim"
