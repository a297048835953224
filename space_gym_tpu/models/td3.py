"""Twin-Delayed DDPG (TD3), fused with the vectorized env engine.

The second of the two algorithms the reference benchmarks were trained with
externally (reference README.md:36: GoalContinuous2P "easily solved by SAC and
TD3 with default hyperparameters").  Same on-device architecture as models.sac:
one jitted `train_iter` = rollout slab -> replay insert -> clipped double-Q
updates with target policy smoothing and delayed actor/target updates.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..engine.core import EnvEngine
from . import networks
from .replay import Transition, replay_add_slab, replay_init, replay_sample


class TD3Config(NamedTuple):
    lanes: int = 4096
    rollout_len: int = 32
    replay_rows: int = 2048
    batch_size: int = 4096
    updates_per_iter: int = 4
    gamma: float = 0.99
    tau: float = 0.005
    lr: float = 3e-4
    explore_std: float = 0.1     # behavior-policy Gaussian noise
    smooth_std: float = 0.2      # target policy smoothing noise
    smooth_clip: float = 0.5
    policy_delay: int = 2        # actor/target update every k-th critic update
    hidden: tuple = (256, 256)
    warmup_rows: int = 32
    # Fused learner (models/fused_td3): all K updates in one Pallas kernel,
    # kernel-layout state cached across iters (pure-jax fallback off TPU).
    fused_updates: bool = False
    fused_block: int = 2048


class TD3State(NamedTuple):
    """With cfg.fused_updates the CANONICAL learner state is `fused`
    (models.fused_td3.FusedState); actor_params and n_updates are refreshed
    from it each train_iter, the remaining flax/opt fields stay at their init
    snapshot (read them through fused_td3.fused_unpack)."""

    actor_params: dict
    target_actor_params: dict
    critic_params: dict
    target_critic_params: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    env_state: object
    obs: jax.Array
    replay: object
    n_updates: jax.Array  # () int32 critic-update counter (for the delay)
    step: jax.Array
    fused: object = None  # fused_td3.FusedState when cfg.fused_updates


class TD3Trainer:
    """TD3 over one EnvEngine; all public methods jitted."""

    def __init__(self, engine: EnvEngine, config: TD3Config = TD3Config()):
        if not engine.config.continuous:
            raise ValueError("TD3 requires a continuous-action env config")
        self.engine = engine
        self.cfg = config
        self.obs_dim = engine.obs_dim
        self.action_dim = engine.config.action_dim
        if config.fused_updates and self.action_dim != 2:
            # fused_td3's packed replay layout hard-codes AH=2; see the same
            # guard in SACTrainer.
            raise ValueError(
                f"fused_updates requires action_dim == 2 (got {self.action_dim}); "
                "use the unfused path for other action dims")
        # Width-parameterized kernel namespace (see SACTrainer); bound
        # whenever the net shape fits the packed layout so the checkpoint
        # bridges work on unfused trainers too.
        h = config.hidden
        self._ft = None
        if (self.action_dim == 2 and len(h) == 2 and h[0] == h[1]
                and h[0] % 128 == 0):
            from . import fused_td3
            self._ft = fused_td3.build(h[0])
        if config.fused_updates and self._ft is None:
            raise ValueError(
                f"fused_updates requires hidden=(h, h) with h a multiple "
                f"of 128, got {h}")
        self.actor = networks.DeterministicActor(self.action_dim, config.hidden)
        self.critic = networks.DoubleCritic(config.hidden)
        self.opt = optax.adam(config.lr)

        self.init = jax.jit(self._init)
        self.train_iter = jax.jit(self._train_iter)
        self.train_iters = jax.jit(self._train_iters, static_argnames="n")
        self.act = jax.jit(self._act)
        self.eval_act = jax.jit(lambda p, o: self.actor.apply(p, o))

    def _init(self, key: jax.Array) -> TD3State:
        c = self.cfg
        k_actor, k_critic, k_env = jax.random.split(key, 3)
        dummy_obs = jnp.zeros((1, self.obs_dim), self.engine.dtype)
        dummy_act = jnp.zeros((1, self.action_dim), self.engine.dtype)
        actor_params = self.actor.init(k_actor, dummy_obs)
        critic_params = self.critic.init(k_critic, dummy_obs, dummy_act)
        env_state, obs = self.engine._reset_batched(k_env, c.lanes)
        fused = None
        if c.fused_updates:
            ft = self._ft
            packed = ft.pack_params(actor_params, actor_params,
                                    critic_params, critic_params)
            fused = ft.fused_init(packed, ft.adam_init(packed))
        return TD3State(
            fused=fused,
            actor_params=actor_params,
            target_actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=critic_params,
            actor_opt=self.opt.init(actor_params),
            critic_opt=self.opt.init(critic_params),
            env_state=env_state,
            obs=obs,
            replay=replay_init(
                c.replay_rows, c.lanes, self.obs_dim, self.action_dim, self.engine.dtype
            ),
            n_updates=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32),
        )

    def _act(self, actor_params, obs, key):
        a = self.actor.apply(actor_params, obs)
        noise = self.cfg.explore_std * jax.random.normal(key, a.shape, a.dtype)
        return jnp.clip(a + noise, -1.0, 1.0)

    def _rollout(self, state: TD3State, key: jax.Array):
        def body(carry, _):
            env_state, obs, k = carry
            k, k_act, k_step = jax.random.split(k, 3)
            action = self._act(state.actor_params, obs, k_act)
            env_state, ts = self.engine._step_batched(env_state, action, k_step)
            tr = Transition(
                obs=obs,
                action=action,
                reward=ts.reward,
                next_obs=ts.final_obs,
                discount=1.0 - ts.terminated.astype(ts.reward.dtype),
            )
            return (env_state, ts.obs, k), (tr, ts.reward, ts.done)

        (env_state, obs, _), (slab, rewards, dones) = jax.lax.scan(
            body, (state.env_state, state.obs, key), None, length=self.cfg.rollout_len
        )
        return env_state, obs, slab, rewards, dones

    def _critic_loss(self, critic_params, state: TD3State, batch: Transition, key):
        c = self.cfg
        noise = jnp.clip(
            c.smooth_std * jax.random.normal(key, batch.action.shape, batch.action.dtype),
            -c.smooth_clip,
            c.smooth_clip,
        )
        next_a = jnp.clip(
            self.actor.apply(state.target_actor_params, batch.next_obs) + noise,
            -1.0,
            1.0,
        )
        q1t, q2t = self.critic.apply(state.target_critic_params, batch.next_obs, next_a)
        target_q = batch.reward + c.gamma * batch.discount * jnp.minimum(q1t, q2t)
        target_q = jax.lax.stop_gradient(target_q)
        q1, q2 = self.critic.apply(critic_params, batch.obs, batch.action)
        return ((q1 - target_q) ** 2 + (q2 - target_q) ** 2).mean()

    def _actor_loss(self, actor_params, critic_params, batch: Transition):
        a = self.actor.apply(actor_params, batch.obs)
        q1, _ = self.critic.apply(critic_params, batch.obs, a)
        return -q1.mean()

    def _update_once(self, state: TD3State, key: jax.Array):
        c = self.cfg
        k_samp, k_noise = jax.random.split(key)
        batch = replay_sample(state.replay, k_samp, c.batch_size)

        critic_loss, critic_grads = jax.value_and_grad(self._critic_loss)(
            state.critic_params, state, batch, k_noise
        )
        upd, critic_opt = self.opt.update(critic_grads, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, upd)

        actor_loss, actor_grads = jax.value_and_grad(self._actor_loss)(
            state.actor_params, critic_params, batch
        )
        upd, actor_opt = self.opt.update(actor_grads, state.actor_opt)
        new_actor_params = optax.apply_updates(state.actor_params, upd)

        # Delayed actor + target updates (TD3's trademark).
        do_actor = jnp.mod(state.n_updates, c.policy_delay) == 0
        sel = lambda n, o: jnp.where(do_actor, n, o)
        actor_params = jax.tree.map(sel, new_actor_params, state.actor_params)
        actor_opt = jax.tree.map(sel, actor_opt, state.actor_opt)
        polyak = lambda t, p: jax.tree.map(
            lambda ti, pi: jnp.where(do_actor, ti * (1 - c.tau) + pi * c.tau, ti), t, p
        )
        target_actor = polyak(state.target_actor_params, actor_params)
        target_critic = polyak(state.target_critic_params, critic_params)

        state = state._replace(
            actor_params=actor_params,
            target_actor_params=target_actor,
            critic_params=critic_params,
            target_critic_params=target_critic,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            n_updates=state.n_updates + 1,
        )
        return state, {"critic_loss": critic_loss, "actor_loss": actor_loss}


    def _update_fused(self, state: TD3State, key: jax.Array):
        """All K updates through models/fused_td3 (one kernel launch on TPU
        operating on the cached kernel-layout state; packed-jax reference
        elsewhere).  Sampling law: whole replay rows (in-kernel via scalar
        prefetch when shapes allow, like the SAC path)."""
        if self._ft is None:
            raise ValueError(
                "fused-format bridge requires hidden=(h, h), h % 128 == 0")
        ft = self._ft
        from .replay import replay_sample_rows, unpack_flat  # noqa: F401

        c = self.cfg
        k_samp, k_noise = jax.random.split(key)
        total = c.updates_per_iter * c.batch_size
        lanes_r = state.replay.data.shape[2]
        fstate = state.fused
        bt = min(c.fused_block, lanes_r)
        in_kernel_sampling = (
            jax.default_backend() == "tpu"
            and c.batch_size % lanes_r == 0
            and lanes_r % bt == 0
            and bt % 128 == 0
        )
        noises = jax.random.normal(
            k_noise, (c.updates_per_iter, c.batch_size, self.action_dim),
            jnp.float32)
        args = dict(
            obs_dim=self.obs_dim, gamma=c.gamma, tau=c.tau, lr=c.lr,
            smooth_std=c.smooth_std, smooth_clip=c.smooth_clip,
            policy_delay=c.policy_delay,
        )
        if in_kernel_sampling:
            rpb = c.batch_size // lanes_r
            row_idx = jax.random.randint(
                k_samp, (c.updates_per_iter * rpb,), 0,
                jnp.maximum(state.replay.filled, 1))
            fstate, closs, aloss = ft.fused_update_k_wmat(
                fstate, state.replay.data, row_idx, noises,
                block=c.fused_block, **args)
        else:
            if total % c.lanes == 0 and c.batch_size >= c.lanes:
                big = replay_sample_rows(state.replay, k_samp, total)
            else:
                big = replay_sample(state.replay, k_samp, total)
            batches = jax.tree.map(
                lambda x: x.reshape(c.updates_per_iter, c.batch_size, *x.shape[1:]),
                big,
            )
            if jax.default_backend() == "tpu":
                fstate, closs, aloss = ft.fused_update_k_wmat_batches(
                    fstate, batches, noises, block=c.fused_block, **args)
            else:
                packed, adam = ft.fused_unpack(fstate)
                packed, adam, closs, aloss = ft.update_k_reference(
                    packed, adam, batches, noises, **args)
                fstate = ft.fused_init(packed, adam)

        state = state._replace(
            actor_params=ft.unpack_actor(
                fstate.w, fstate.vec, self.obs_dim, self.action_dim),
            n_updates=fstate.count,
            fused=fstate,
        )
        return state, {"critic_loss": closs[-1], "actor_loss": aloss[-1]}

    # -------------------------------------------- checkpoint-format bridges --
    def migrate_to_fused(self, state: TD3State) -> TD3State:
        """Rebuild the kernel-layout `fused` state from a flax/optax (unfused
        or pre-FusedState) checkpoint.  Mirrors SACTrainer.migrate_to_fused;
        TD3 keeps separate Adam counts for the critic (every update) and the
        delayed actor."""
        if self._ft is None:
            raise ValueError(
                "fused-format bridge requires hidden=(h, h), h % 128 == 0")
        ft = self._ft

        zeros_a = jax.tree.map(jnp.zeros_like, state.target_actor_params)
        zeros_c = jax.tree.map(jnp.zeros_like, state.target_critic_params)
        packed = ft.pack_params(
            state.actor_params, state.target_actor_params,
            state.critic_params, state.target_critic_params)
        adam = ft.PackedAdam(
            m=ft.pack_params(state.actor_opt[0].mu, zeros_a,
                             state.critic_opt[0].mu, zeros_c),
            v=ft.pack_params(state.actor_opt[0].nu, zeros_a,
                             state.critic_opt[0].nu, zeros_c),
            count=state.critic_opt[0].count,
            count_a=state.actor_opt[0].count,
        )
        return state._replace(
            fused=ft.fused_init(packed, adam),
            n_updates=jnp.asarray(state.critic_opt[0].count, jnp.int32),
        )

    def rehydrate_from_fused(self, state: TD3State) -> TD3State:
        """Inverse bridge: refresh flax params and optax moments from a
        fused-mode checkpoint so an unfused resume continues the same
        training trajectory (see SACTrainer.rehydrate_from_fused)."""
        if self._ft is None:
            raise ValueError(
                "fused-format bridge requires hidden=(h, h), h % 128 == 0")
        ft = self._ft

        packed, adam = ft.fused_unpack(state.fused)
        actor, tactor, critic, target = ft.unpack_params(
            packed, state.actor_params, state.critic_params)
        a_mu, _, c_mu, _ = ft.unpack_params(
            adam.m, state.actor_params, state.critic_params)
        a_nu, _, c_nu, _ = ft.unpack_params(
            adam.v, state.actor_params, state.critic_params)

        def opt_state(tpl, mu, nu, count):
            return (tpl[0]._replace(count=count, mu=mu, nu=nu),) + tuple(tpl[1:])

        return state._replace(
            actor_params=actor,
            target_actor_params=tactor,
            critic_params=critic,
            target_critic_params=target,
            actor_opt=opt_state(state.actor_opt, a_mu, a_nu, adam.count_a),
            critic_opt=opt_state(state.critic_opt, c_mu, c_nu, adam.count),
            n_updates=jnp.asarray(adam.count, jnp.int32),
            fused=None,
        )

    def _train_iters(self, state: TD3State, key: jax.Array, n: int):
        """n train_iters in ONE device program (lax.scan) — amortizes the
        ~1-3 ms per-dispatch tunnel latency (see SACTrainer._train_iters).
        Returns the last iteration's metrics."""
        state, ms = jax.lax.scan(
            lambda s, k: self._train_iter(s, k), state, jax.random.split(key, n))
        return state, jax.tree.map(lambda x: x[-1], ms)

    def _train_iter(self, state: TD3State, key: jax.Array):
        c = self.cfg
        k_roll, k_upd = jax.random.split(key)
        env_state, obs, slab, rewards, dones = self._rollout(state, k_roll)
        replay = replay_add_slab(state.replay, slab)
        state = state._replace(env_state=env_state, obs=obs, replay=replay)

        metrics = {}
        ready = replay.filled >= jnp.minimum(c.warmup_rows, c.replay_rows)
        learner_fields = (
            ("actor_params", "n_updates", "fused")
            if c.fused_updates else (
                "actor_params", "target_actor_params", "critic_params",
                "target_critic_params", "actor_opt", "critic_opt", "n_updates",
            )
        )

        def gate(new_state, old_state):
            return old_state._replace(**{
                f: jax.tree.map(
                    lambda n, o: jnp.where(ready, n, o),
                    getattr(new_state, f),
                    getattr(old_state, f),
                )
                for f in learner_fields
            })

        if c.fused_updates:
            new_state, metrics = self._update_fused(state, k_upd)
            state = gate(new_state, state)
        else:
            for _ in range(c.updates_per_iter):
                k_upd, k_i = jax.random.split(k_upd)
                new_state, m = self._update_once(state, k_i)
                state = gate(new_state, state)
                metrics = m
        metrics = dict(metrics, mean_reward=rewards.mean(), episodes_done=dones.sum())
        return state._replace(step=state.step + 1), metrics
