"""SB3-style vectorized env adapter: NumPy in/out over the device engine.

The reference's users trained through SB3/rl-zoo (reference README.md:57-59),
whose interface is the VecEnv: `reset() -> obs[N, D]`,
`step(actions[N, ...]) -> (obs, rewards, dones, infos)` with implicit
auto-reset and the terminal observation stashed in
`infos[i]["terminal_observation"]` — exactly the engine's TimeStep contract.
This adapter lets external (torch/numpy) training code drive thousands of
on-device lanes without touching JAX.
"""
from __future__ import annotations

import numpy as np

from ..envs.config import EnvConfig
from . import spaces


class VectorEnv:
    """N lockstep envs on device, NumPy at the boundary.

    >>> venv = VectorEnv("GoalContinuous2P-v0", num_envs=4096)
    >>> obs = venv.reset()
    >>> obs, rewards, dones, infos = venv.step(actions)
    """

    def __init__(
        self,
        env_id_or_config,
        num_envs: int,
        seed: int = 0,
        physics: str = "fixed",
        substeps: int = 2,
    ):
        import jax
        import jax.numpy as jnp

        from ..engine import EnvEngine
        from ..registry import get_config

        config = env_id_or_config
        if not isinstance(config, EnvConfig):
            config = get_config(env_id_or_config)
        self.config = config
        self.num_envs = num_envs
        self.engine = EnvEngine(config, physics=physics, substeps=substeps)
        self._jax = jax
        self._key = jax.random.key(seed)
        self._state = None
        self._obs = None

        low, high = config.observation_bounds()
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        if config.continuous:
            ones = np.ones(2, dtype=np.float32)
            self.action_space = spaces.Box(-ones, ones, dtype=np.float32)
        else:
            self.action_space = spaces.Discrete(config.n_actions)

    def seed(self, seed: int):
        self._key = self._jax.random.key(seed)
        return [seed]

    def _split(self):
        self._key, sub = self._jax.random.split(self._key)
        return sub

    def reset(self) -> np.ndarray:
        self._state, self._obs = self.engine.init(self._split(), self.num_envs)
        return np.asarray(self._obs)

    def step(self, actions: np.ndarray):
        import jax.numpy as jnp

        assert self._state is not None, "Call reset() first"
        if self.config.continuous:
            actions = jnp.asarray(np.asarray(actions, np.float32))
        else:
            actions = jnp.asarray(np.asarray(actions, np.int32))
        self._state, ts = self.engine.step(self._state, actions, self._split())
        self._obs = ts.obs
        obs = np.asarray(ts.obs)
        rewards = np.asarray(ts.reward)
        dones = np.asarray(ts.done)
        truncated = np.asarray(ts.truncated)
        final_obs = np.asarray(ts.final_obs)
        infos = []
        for i in range(self.num_envs):
            if dones[i]:
                info = {"terminal_observation": final_obs[i]}
                if truncated[i]:
                    info["TimeLimit.truncated"] = True
                infos.append(info)
            else:
                infos.append({})
        return obs, rewards, dones, infos

    def close(self):
        pass
