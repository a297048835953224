"""Registry + make() with TimeLimit wrapping (old Gym API subset)."""
from __future__ import annotations

import importlib

from ..core import TimeLimit


class EnvSpec:
    def __init__(self, id, entry_point=None, max_episode_steps=None, kwargs=None):
        self.id = id
        self.entry_point = entry_point
        self.max_episode_steps = max_episode_steps
        self._kwargs = {} if kwargs is None else dict(kwargs)

    def make(self, **kwargs):
        merged = dict(self._kwargs)
        merged.update(kwargs)
        mod_name, attr = self.entry_point.split(":")
        cls = getattr(importlib.import_module(mod_name), attr)
        env = cls(**merged)
        env.spec = self
        return env


registry: dict[str, EnvSpec] = {}


def register(id, **kwargs):
    if id in registry:
        raise ValueError(f"Cannot re-register id: {id}")
    registry[id] = EnvSpec(id, **kwargs)


def make(id, **kwargs):
    spec = registry[id]
    env = spec.make(**kwargs)
    if spec.max_episode_steps is not None:
        env = TimeLimit(env, max_episode_steps=spec.max_episode_steps)
    return env
