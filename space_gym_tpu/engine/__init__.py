"""Vectorized on-device env engine (the TPU-native execution path)."""
from .core import EnvEngine, EnvState, TimeStep  # noqa: F401
