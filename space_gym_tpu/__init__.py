"""space_gym_tpu — TPU-native rebuild of the Space-Gym spaceship-control RL
environment suite (reference: MIMUW-RL/space-gym).

Public surface:
  * make(env_id)            — old-Gym-API single-env adapter (drop-in)
  * make_gymnasium(env_id)  — new-API (gymnasium-style) facade for modern trainers
  * env_ids() / get_config  — typed-config registry of all upstream env IDs
  * space_gym_tpu.engine    — vectorized jit/vmap/scan env engine (the fast path)
  * space_gym_tpu.ops       — dynamics, integrators, events
"""
from .registry import env_ids, get_config, make, register  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports that pull in jax only on use."""
    if name == "EnvEngine":
        from .engine import EnvEngine

        return EnvEngine
    if name == "VectorEnv":
        from .compat.vector_env import VectorEnv

        return VectorEnv
    if name == "make_gymnasium":
        from .compat.gymnasium_api import make_gymnasium

        return make_gymnasium
    if name == "Planet":
        from .envs.config import Planet

        return Planet
    if name == "ShipParams":
        from .ops.field import ShipParams

        return ShipParams
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
