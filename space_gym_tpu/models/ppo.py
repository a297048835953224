"""PPO, fused with the vectorized env engine.

The third algorithm the reference's published process used: "We used the
default hyperparameters of TD3, SAC. PPO performed significantly worse"
(reference README.md:59).  This on-device twin of SB3 PPO (clipped surrogate,
GAE, advantage normalization, value clipping off, SB3 MlpPolicy defaults)
exists both as a usable trainer and to reproduce that qualitative ranking.

TPU-first deviations from SB3's per-epoch full shuffle (documented):
minibatches are formed from permuted (timestep, lane-block) TILES of 128
lanes.  Lanes are independent episodes, so a tile is 128 iid samples sharing
one timestep; permuting tiles gives each sample exactly one use per epoch
while keeping every gather a contiguous 128-row slice (per-element gathers
of a quarter-million rows cost more than the whole update on TPU — see
models/replay.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..engine.core import EnvEngine
from . import networks

LANE_TILE = 128  # minibatch granularity (one vreg lane row)


class PPOConfig(NamedTuple):
    lanes: int = 4096
    rollout_len: int = 64        # on-policy horizon per iteration
    epochs: int = 10             # SB3 n_epochs
    minibatches: int = 32        # minibatches per epoch
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    hidden: tuple = (64, 64)     # SB3 MlpPolicy default


class PPOState(NamedTuple):
    params: dict
    opt: optax.OptState
    env_state: object
    obs: jax.Array
    step: jax.Array


class PPOTrainer:
    """PPO over one EnvEngine; all public methods jitted."""

    def __init__(self, engine: EnvEngine, config: PPOConfig = PPOConfig()):
        if not engine.config.continuous:
            raise ValueError("PPO (this impl) requires a continuous-action env")
        c = config
        if (c.lanes * c.rollout_len) % (c.minibatches * LANE_TILE):
            raise ValueError(
                f"lanes*rollout_len={c.lanes * c.rollout_len} must split into "
                f"minibatches={c.minibatches} of whole {LANE_TILE}-lane tiles")
        self.engine = engine
        self.cfg = config
        self.obs_dim = engine.obs_dim
        self.action_dim = engine.config.action_dim
        self.net = networks.GaussianActorValue(self.action_dim, config.hidden)
        self.opt = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr),
        )

        self.init = jax.jit(self._init)
        self.train_iter = jax.jit(self._train_iter)
        self.train_iters = jax.jit(self._train_iters, static_argnames="n")
        self.act = jax.jit(self._act)
        self.eval_act = jax.jit(self._eval_act)

    def _init(self, key: jax.Array) -> PPOState:
        c = self.cfg
        k_net, k_env = jax.random.split(key)
        dummy = jnp.zeros((1, self.obs_dim), self.engine.dtype)
        params = self.net.init(k_net, dummy)
        env_state, obs = self.engine._reset_batched(k_env, c.lanes)
        return PPOState(
            params=params, opt=self.opt.init(params),
            env_state=env_state, obs=obs, step=jnp.asarray(0, jnp.int32),
        )

    # -------------------------------------------------------------- acting --
    def _act(self, params, obs, key):
        mean, log_std, _ = self.net.apply(params, obs)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)
        return jnp.clip(a, -1.0, 1.0)

    def _eval_act(self, params, obs):
        mean, _, _ = self.net.apply(params, obs)
        return jnp.clip(mean, -1.0, 1.0)

    # ------------------------------------------------------------- training --
    def _rollout(self, state: PPOState, key: jax.Array):
        """cfg.rollout_len on-policy steps; stores logp/value at sample time.
        NOTE (SB3 parity): the stored action is the UNCLIPPED Gaussian sample
        (SB3 buffers unclipped actions; clipping happens at the env)."""

        def body(carry, _):
            env_state, obs, k = carry
            k, k_act, k_step = jax.random.split(k, 3)
            mean, log_std, value = self.net.apply(state.params, obs)
            a = mean + jnp.exp(log_std) * jax.random.normal(
                k_act, mean.shape, mean.dtype)
            logp = networks.gaussian_logp(a, mean, log_std)
            env_state, ts = self.engine._step_batched(
                env_state, jnp.clip(a, -1.0, 1.0), k_step)
            out = dict(
                obs=obs, action=a, logp=logp, value=value,
                reward=ts.reward,
                # GAE bootstraps through truncations, not terminations
                nonterm=1.0 - ts.terminated.astype(ts.reward.dtype),
                nondone=1.0 - ts.done.astype(ts.reward.dtype),
                # Value tower only: a full apply here would also run the
                # actor tower on final_obs and discard it (the towers share
                # no torso, so this is a real 25% cut of rollout net FLOPs).
                final_value=self.net.apply(
                    state.params, ts.final_obs,
                    method=type(self.net).value),
            )
            return (env_state, ts.obs, k), (out, ts.reward, ts.done)

        (env_state, obs, _), (tr, rewards, dones) = jax.lax.scan(
            body, (state.env_state, state.obs, key), None,
            length=self.cfg.rollout_len)
        return env_state, obs, tr, rewards, dones

    def _gae(self, tr):
        """Reverse-scan GAE.  Auto-reset handling: at every done (terminated
        OR truncated) the trace stops (next state belongs to a new episode);
        bootstrap value comes from final_value — the value of the TRUE next
        obs — masked by nonterm, so truncation bootstraps and termination
        doesn't (matches the engine's TimeLimit split and SB3's
        handle_timeout_termination)."""
        c = self.cfg

        def back(adv_next, x):
            delta = (x["reward"]
                     + c.gamma * x["nonterm"] * x["final_value"]
                     - x["value"])
            # continue the lambda-trace only within the same episode
            adv = delta + c.gamma * c.gae_lambda * x["nondone"] * adv_next
            return adv, adv

        _, advs = jax.lax.scan(back, jnp.zeros_like(tr["value"][0]), tr,
                               reverse=True)
        return advs, advs + tr["value"]

    def _update_epoch(self, params, opt_state, data, key):
        """One epoch: permute (T, lane-tile) tiles, scan over minibatches."""
        c = self.cfg
        n_tiles = data["obs"].shape[0]
        tiles_per_mb = n_tiles // c.minibatches
        perm = jax.random.permutation(key, n_tiles)

        def loss_fn(p, mb):
            mean, log_std, value = self.net.apply(p, mb["obs"])
            logp = networks.gaussian_logp(mb["action"], mean, log_std)
            ratio = jnp.exp(logp - mb["logp"])
            adv = mb["adv"]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)  # SB3 per-minibatch
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - c.clip, 1 + c.clip) * adv,
            ).mean()
            vf = ((value - mb["ret"]) ** 2).mean()
            ent = jnp.sum(log_std[0] + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + c.vf_coef * vf - c.ent_coef * ent, (pg, vf)

        def mb_step(carry, idx):
            p, o = carry
            take = lambda x: x[idx].reshape(-1, *x.shape[2:])
            mb = jax.tree.map(take, data)
            (l, (pg, vf)), g = jax.value_and_grad(loss_fn, has_aux=True)(p, mb)
            upd, o = self.opt.update(g, o, p)
            return (optax.apply_updates(p, upd), o), (pg, vf)

        idxs = perm.reshape(c.minibatches, tiles_per_mb)
        (params, opt_state), (pgs, vfs) = jax.lax.scan(
            mb_step, (params, opt_state), idxs)
        return params, opt_state, pgs[-1], vfs[-1]

    def _train_iter(self, state: PPOState, key: jax.Array):
        c = self.cfg
        k_roll, k_upd = jax.random.split(key)
        env_state, obs, tr, rewards, dones = self._rollout(state, k_roll)
        adv, ret = self._gae(tr)

        # (T, L, ...) -> (T * L/128, 128, ...) lane tiles
        t_len, lanes = rewards.shape
        def tiled(x):
            return x.reshape(t_len * (lanes // LANE_TILE), LANE_TILE,
                             *x.shape[2:])
        data = {
            "obs": tiled(tr["obs"]), "action": tiled(tr["action"]),
            "logp": tiled(tr["logp"]), "adv": tiled(adv), "ret": tiled(ret),
        }

        params, opt_state = state.params, state.opt
        pg = vf = jnp.float32(0)
        for _ in range(c.epochs):
            k_upd, k_e = jax.random.split(k_upd)
            params, opt_state, pg, vf = self._update_epoch(
                params, opt_state, data, k_e)

        metrics = {
            "policy_loss": pg, "value_loss": vf,
            "mean_reward": rewards.mean(), "episodes_done": dones.sum(),
        }
        return PPOState(params=params, opt=opt_state, env_state=env_state,
                        obs=obs, step=state.step + 1), metrics

    def _train_iters(self, state: PPOState, key: jax.Array, n: int):
        """n train_iters in ONE device program (lax.scan)."""
        state, ms = jax.lax.scan(
            lambda s, k: self._train_iter(s, k), state, jax.random.split(key, n))
        return state, jax.tree.map(lambda x: x[-1], ms)
