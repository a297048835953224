"""Double-DQN for the discrete-action env family.

The reference registers its discrete variants (DoNotCrashDiscrete,
GoalDiscrete*, KeplerDiscrete — keyboard_agent.py:10-74) but ships no trainer
for them; external users would have reached for SB3 DQN.  This is the
on-device twin: same fused rollout -> ring replay -> update architecture as
models.sac/td3, with epsilon-greedy exploration, double-DQN targets and a
periodic target sync.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..engine.core import EnvEngine
from . import networks
from .replay import Transition, replay_add_slab, replay_init, replay_sample


class DQNConfig(NamedTuple):
    lanes: int = 4096
    rollout_len: int = 32
    replay_rows: int = 2048
    batch_size: int = 4096
    updates_per_iter: int = 8
    gamma: float = 0.99
    lr: float = 3e-4
    eps_start: float = 1.0
    eps_end: float = 0.05
    eps_decay_iters: int = 200
    target_sync_every: int = 32  # updates between hard target syncs
    hidden: tuple = (256, 256)
    warmup_rows: int = 32


class DQNState(NamedTuple):
    params: dict
    target_params: dict
    opt: optax.OptState
    env_state: object
    obs: jax.Array
    replay: object
    n_updates: jax.Array
    step: jax.Array


class DQNTrainer:
    """Double-DQN over one discrete EnvEngine; all public methods jitted."""

    def __init__(self, engine: EnvEngine, config: DQNConfig = DQNConfig()):
        if engine.config.continuous:
            raise ValueError("DQN requires a discrete-action env config")
        self.engine = engine
        self.cfg = config
        self.obs_dim = engine.obs_dim
        self.n_actions = engine.config.n_actions
        self.qnet = networks.MLP((*config.hidden, self.n_actions))
        self.optim = optax.adam(config.lr)

        self.init = jax.jit(self._init)
        self.train_iter = jax.jit(self._train_iter)
        self.train_iters = jax.jit(self._train_iters, static_argnames="n")
        self.eval_act = jax.jit(
            lambda p, o: jnp.argmax(self.qnet.apply(p, o), axis=-1).astype(jnp.int32)
        )

    def _init(self, key: jax.Array) -> DQNState:
        c = self.cfg
        k_q, k_env = jax.random.split(key)
        dummy = jnp.zeros((1, self.obs_dim), self.engine.dtype)
        params = self.qnet.init(k_q, dummy)
        env_state, obs = self.engine._reset_batched(k_env, c.lanes)
        return DQNState(
            params=params,
            target_params=params,
            opt=self.optim.init(params),
            env_state=env_state,
            obs=obs,
            replay=replay_init(c.replay_rows, c.lanes, self.obs_dim, 1, self.engine.dtype),
            n_updates=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32),
        )

    def _epsilon(self, step):
        c = self.cfg
        frac = jnp.clip(step.astype(jnp.float32) / c.eps_decay_iters, 0.0, 1.0)
        return c.eps_start + frac * (c.eps_end - c.eps_start)

    def _act(self, params, obs, key, eps):
        k_u, k_r = jax.random.split(key)
        greedy = jnp.argmax(self.qnet.apply(params, obs), axis=-1).astype(jnp.int32)
        random = jax.random.randint(k_r, greedy.shape, 0, self.n_actions)
        explore = jax.random.uniform(k_u, greedy.shape) < eps
        return jnp.where(explore, random, greedy)

    def _rollout(self, state: DQNState, key: jax.Array):
        eps = self._epsilon(state.step)

        def body(carry, _):
            env_state, obs, k = carry
            k, k_act, k_step = jax.random.split(k, 3)
            action = self._act(state.params, obs, k_act, eps)
            env_state, ts = self.engine._step_batched(env_state, action, k_step)
            tr = Transition(
                obs=obs,
                action=action[:, None].astype(self.engine.dtype),
                reward=ts.reward,
                next_obs=ts.final_obs,
                discount=1.0 - ts.terminated.astype(ts.reward.dtype),
            )
            return (env_state, ts.obs, k), (tr, ts.reward, ts.done)

        (env_state, obs, _), (slab, rewards, dones) = jax.lax.scan(
            body, (state.env_state, state.obs, key), None, length=self.cfg.rollout_len
        )
        return env_state, obs, slab, rewards, dones

    def _loss(self, params, state: DQNState, batch: Transition):
        c = self.cfg
        a = batch.action[:, 0].astype(jnp.int32)
        q = self.qnet.apply(params, batch.obs)
        q_sa = jnp.take_along_axis(q, a[:, None], axis=-1)[:, 0]
        # Double DQN: online net picks, target net evaluates.
        next_online = self.qnet.apply(params, batch.next_obs)
        next_a = jnp.argmax(next_online, axis=-1)
        next_target = self.qnet.apply(state.target_params, batch.next_obs)
        next_q = jnp.take_along_axis(next_target, next_a[:, None], axis=-1)[:, 0]
        target = batch.reward + c.gamma * batch.discount * next_q
        return ((q_sa - jax.lax.stop_gradient(target)) ** 2).mean()

    def _update_once(self, state: DQNState, key: jax.Array):
        c = self.cfg
        batch = replay_sample(state.replay, key, c.batch_size)
        loss, grads = jax.value_and_grad(self._loss)(state.params, state, batch)
        upd, opt = self.optim.update(grads, state.opt)
        params = optax.apply_updates(state.params, upd)
        n_updates = state.n_updates + 1
        sync = jnp.mod(n_updates, c.target_sync_every) == 0
        target = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), state.target_params, params
        )
        return (
            state._replace(params=params, target_params=target, opt=opt, n_updates=n_updates),
            {"loss": loss},
        )

    def _train_iters(self, state: DQNState, key: jax.Array, n: int):
        """n train_iters in ONE device program (lax.scan) — amortizes the
        ~1-3 ms per-dispatch tunnel latency (see SACTrainer._train_iters).
        Returns the last iteration's metrics."""
        state, ms = jax.lax.scan(
            lambda s, k: self._train_iter(s, k), state, jax.random.split(key, n))
        return state, jax.tree.map(lambda x: x[-1], ms)

    def _train_iter(self, state: DQNState, key: jax.Array):
        c = self.cfg
        k_roll, k_upd = jax.random.split(key)
        env_state, obs, slab, rewards, dones = self._rollout(state, k_roll)
        replay = replay_add_slab(state.replay, slab)
        state = state._replace(env_state=env_state, obs=obs, replay=replay)

        metrics = {}
        ready = replay.filled >= jnp.minimum(c.warmup_rows, c.replay_rows)
        fields = ("params", "target_params", "opt", "n_updates")
        for _ in range(c.updates_per_iter):
            k_upd, k_i = jax.random.split(k_upd)
            new_state, m = self._update_once(state, k_i)
            state = state._replace(**{
                f: jax.tree.map(
                    lambda n, o: jnp.where(ready, n, o),
                    getattr(new_state, f), getattr(state, f),
                )
                for f in fields
            })
            metrics = m
        metrics = dict(
            metrics,
            mean_reward=rewards.mean(),
            episodes_done=dones.sum(),
            epsilon=self._epsilon(state.step),
        )
        return state._replace(step=state.step + 1), metrics
