"""Soft Actor-Critic, fused with the vectorized env engine.

The reference trained its benchmarks with external SB3 SAC (reference
README.md:36,59: GoalContinuous2P "easily solved" by SAC/TD3 default
hyperparameters); here the entire loop — rollout over thousands of lanes,
replay insert, minibatch sampling, gradient updates, target polyak — is one
jitted device program (`train_iter`), the BASELINE.json configs[4] workload
("full suite vectorized envs/chip feeding on-device SAC learner").

Sharding contract (see space_gym_tpu.parallel): env state, rollout slabs and
replay shard along the mesh "data" axis; network/optimizer params are
replicated; the only cross-device communication is the gradient all-reduce
XLA inserts when replicated params meet sharded batches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..engine.core import EnvEngine
from . import networks
from .replay import (
    ReplayState, Transition, nstep_slab, replay_add_slab, replay_init,
    replay_sample, replay_sample_rows,
)


class SACConfig(NamedTuple):
    lanes: int = 4096            # parallel env lanes
    rollout_len: int = 32        # env steps per train_iter
    replay_rows: int = 2048      # replay capacity = rows * lanes transitions
    batch_size: int = 4096       # minibatch per gradient update
    updates_per_iter: int = 4    # gradient updates per train_iter
    gamma: float = 0.99
    tau: float = 0.005           # target polyak rate
    lr: float = 3e-4
    init_alpha: float = 0.1
    hidden: tuple = (256, 256)
    warmup_rows: int = 32        # min filled rows before updates count
    # Reward-scale-aware knobs (long-horizon/small-reward envs like Kepler,
    # whose dense reward C/(penalty+C) is near zero until the orbit is
    # tracked; reference README.md:76-83 only shows very-long SB3 runs):
    n_step: int = 1              # n-step TD targets, computed inside the rollout slab
    alpha_floor: float = 0.0     # lower bound on the entropy temperature
    reward_scale: float = 1.0    # multiply rewards entering the replay buffer
    # Entropy target for the temperature loss; None = SB3 default -dim(A).
    # Precision-tracking tasks (Kepler: reward C/(penalty+C) needs the orbit
    # held tightly) want it well below -dim(A), else alpha grows until the
    # entropy bonus drowns the ~0.1/step task reward.
    target_entropy: float | None = None
    # Fused learner (models/fused_sac): all K updates in one Pallas kernel
    # with params/Adam/targets resident in VMEM (pure-jax packed fallback off
    # TPU).  Same losses/Adam/polyak as the unrolled path; sampling noise is
    # drawn up front instead of per update.
    fused_updates: bool = False
    fused_block: int = 2048      # batch tile per kernel grid step (measured
                                 # optimum on v5e: 2048 > 1024 > 512 >> 4096)
    # Folded kernel schedule: ONE grid step per update (fused_sac
    # _make_kernel_fold) instead of the legacy (K, 2, T) grid — kills the
    # per-grid-step fixed cost pinned by the r4 ablation (~3.9 ms/call at the
    # flagship's 256 grid steps) via manual double-buffered row DMA.
    fused_fold: bool = False


class SACState(NamedTuple):
    """Full training state.

    With cfg.fused_updates the CANONICAL learner state is `fused` (the
    kernel-layout FusedState; re-packing the flax trees each iter cost
    ~2.4 ms).  `actor_params` and `log_alpha` are refreshed from it every
    train_iter (rollouts/eval need them); `critic_params`,
    `target_critic_params` and the *_opt states then remain at their init
    snapshot — read critics through models.fused_sac.fused_unpack instead."""

    actor_params: dict
    critic_params: dict
    target_critic_params: dict
    log_alpha: jax.Array
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    env_state: object           # engine EnvState (batched)
    obs: jax.Array              # (lanes, obs_dim)
    replay: ReplayState
    step: jax.Array             # () int32 train_iter counter
    fused: object = None        # FusedState when cfg.fused_updates else None


class SACTrainer:
    """SAC over one EnvEngine.  All public methods are jitted.

    >>> tr = SACTrainer(EnvEngine(get_config("GoalContinuous2P-v0")))
    >>> st = tr.init(jax.random.key(0))
    >>> st, metrics = tr.train_iter(st, jax.random.key(1))
    """

    def __init__(self, engine: EnvEngine, config: SACConfig = SACConfig()):
        if not engine.config.continuous:
            raise ValueError("SAC requires a continuous-action env config")
        self.engine = engine
        self.cfg = config
        self.obs_dim = engine.obs_dim
        self.action_dim = engine.config.action_dim
        if config.fused_updates and self.action_dim != 2:
            # The fused kernels' packed replay layout hard-codes action_dim=2
            # (fused_sac NHEAD=4, pack_slab/replay_cols); any other dim would
            # silently mis-pack actions/rewards and train on garbage.
            raise ValueError(
                f"fused_updates requires action_dim == 2 (got {self.action_dim}); "
                "use the unfused path for other action dims")
        # Width-parameterized kernel namespace (build(256) = flagship).
        # Bound whenever the net shape fits the packed layout — the
        # checkpoint bridges (migrate/rehydrate) need it even on unfused
        # trainers resuming fused-format checkpoints.
        h = config.hidden
        self._fs = None
        if (self.action_dim == 2 and len(h) == 2 and h[0] == h[1]
                and h[0] % 128 == 0):
            from . import fused_sac
            self._fs = fused_sac.build(h[0])
        if config.fused_updates and self._fs is None:
            raise ValueError(
                f"fused_updates requires hidden=(h, h) with h a multiple "
                f"of 128, got {h}")
        self.actor = networks.TanhGaussianActor(self.action_dim, config.hidden)
        self.critic = networks.DoubleCritic(config.hidden)
        self.target_entropy = (
            -float(self.action_dim)
            if config.target_entropy is None else float(config.target_entropy)
        )
        self.opt = optax.adam(config.lr)

        self.init = jax.jit(self._init)
        self.train_iter = jax.jit(self._train_iter)
        self.train_iters = jax.jit(self._train_iters, static_argnames="n")
        self.act = jax.jit(self._act)
        self.eval_act = jax.jit(self._eval_act)

    # ----------------------------------------------------------------- init --
    def _init(self, key: jax.Array) -> SACState:
        c = self.cfg
        k_actor, k_critic, k_env = jax.random.split(key, 3)
        dummy_obs = jnp.zeros((1, self.obs_dim), self.engine.dtype)
        dummy_act = jnp.zeros((1, self.action_dim), self.engine.dtype)
        actor_params = self.actor.init(k_actor, dummy_obs)
        critic_params = self.critic.init(k_critic, dummy_obs, dummy_act)
        log_alpha = jnp.asarray(jnp.log(c.init_alpha), jnp.float32)
        env_state, obs = self.engine._reset_batched(k_env, c.lanes)
        fused = None
        if c.fused_updates:
            fs = self._fs

            packed = fs.pack_params(
                actor_params, critic_params, critic_params, log_alpha)
            fused = fs.fused_init(packed, fs.adam_init(packed))
        return SACState(
            fused=fused,
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=critic_params,
            log_alpha=log_alpha,
            actor_opt=self.opt.init(actor_params),
            critic_opt=self.opt.init(critic_params),
            alpha_opt=self.opt.init(log_alpha),
            env_state=env_state,
            obs=obs,
            replay=replay_init(
                c.replay_rows, c.lanes, self.obs_dim, self.action_dim, self.engine.dtype
            ),
            step=jnp.asarray(0, jnp.int32),
        )

    # -------------------------------------------------------------- acting --
    def _act(self, actor_params, obs, key):
        mean, log_std = self.actor.apply(actor_params, obs)
        action, _ = networks.sample_tanh_gaussian(key, mean, log_std)
        return action

    def _eval_act(self, actor_params, obs):
        mean, _ = self.actor.apply(actor_params, obs)
        return jnp.tanh(mean)

    # ------------------------------------------------------------- training --
    def _rollout(self, state: SACState, key: jax.Array):
        """Collect cfg.rollout_len steps with the stochastic policy."""

        def body(carry, _):
            env_state, obs, k = carry
            k, k_act, k_step = jax.random.split(k, 3)
            action = self._act(state.actor_params, obs, k_act)
            env_state, ts = self.engine._step_batched(env_state, action, k_step)
            tr = Transition(
                obs=obs,
                action=action,
                reward=self.cfg.reward_scale * ts.reward,
                next_obs=ts.final_obs,
                discount=1.0 - ts.terminated.astype(ts.reward.dtype),
            )
            return (env_state, ts.obs, k), (tr, ts.reward, ts.done)

        (env_state, obs, _), (slab, rewards, dones) = jax.lax.scan(
            body, (state.env_state, state.obs, key), None, length=self.cfg.rollout_len
        )
        return env_state, obs, slab, rewards, dones

    def _critic_loss(self, critic_params, state: SACState, batch: Transition, key):
        c = self.cfg
        alpha = jnp.exp(state.log_alpha)
        mean, log_std = self.actor.apply(state.actor_params, batch.next_obs)
        next_a, next_logp = networks.sample_tanh_gaussian(key, mean, log_std)
        q1t, q2t = self.critic.apply(state.target_critic_params, batch.next_obs, next_a)
        target_v = jnp.minimum(q1t, q2t) - alpha * next_logp
        target_q = batch.reward + c.gamma * batch.discount * target_v
        target_q = jax.lax.stop_gradient(target_q)
        q1, q2 = self.critic.apply(critic_params, batch.obs, batch.action)
        return ((q1 - target_q) ** 2 + (q2 - target_q) ** 2).mean()

    def _actor_loss(self, actor_params, state: SACState, critic_params, batch, key):
        alpha = jnp.exp(state.log_alpha)
        mean, log_std = self.actor.apply(actor_params, batch.obs)
        a, logp = networks.sample_tanh_gaussian(key, mean, log_std)
        q1, q2 = self.critic.apply(critic_params, batch.obs, a)
        return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

    def _update_once(self, state: SACState, key: jax.Array):
        c = self.cfg
        k_samp, k_crit, k_act = jax.random.split(key, 3)
        batch = replay_sample(state.replay, k_samp, c.batch_size)

        critic_loss, critic_grads = jax.value_and_grad(self._critic_loss)(
            state.critic_params, state, batch, k_crit
        )
        upd, critic_opt = self.opt.update(critic_grads, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, upd)

        (actor_loss, logp), actor_grads = jax.value_and_grad(
            self._actor_loss, has_aux=True
        )(state.actor_params, state, critic_params, batch, k_act)
        upd, actor_opt = self.opt.update(actor_grads, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, upd)

        # Temperature toward target entropy.
        alpha_grad = jax.grad(
            lambda la: (-la * jax.lax.stop_gradient(logp + self.target_entropy)).mean()
        )(state.log_alpha)
        upd, alpha_opt = self.opt.update(alpha_grad, state.alpha_opt)
        log_alpha = optax.apply_updates(state.log_alpha, upd)
        if c.alpha_floor > 0:
            log_alpha = jnp.maximum(log_alpha, jnp.log(c.alpha_floor))

        target = jax.tree.map(
            lambda t, p: t * (1 - c.tau) + p * c.tau,
            state.target_critic_params,
            critic_params,
        )
        state = state._replace(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=target,
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
        )
        return state, {"critic_loss": critic_loss, "actor_loss": actor_loss}

    def _update_fused(self, state: SACState, key: jax.Array):
        """All K updates through models/fused_sac: one kernel launch on TPU
        operating directly on the cached kernel-layout state (state.fused) —
        no per-iter pack/unpack; the packed pure-jax reference elsewhere."""
        fs = self._fs

        c = self.cfg
        k_samp, k_noise = jax.random.split(key)
        total = c.updates_per_iter * c.batch_size
        lanes_r = state.replay.data.shape[2]
        fstate = state.fused
        # On TPU, when minibatches are whole replay rows, skip the XLA-side
        # gather entirely: the kernel scalar-prefetches the row indices and
        # DMAs its tiles straight out of the replay ring (same sampling law
        # as replay_sample_rows; see fused_sac._kernel_call).
        bt = min(c.fused_block, lanes_r)
        in_kernel_sampling = (
            jax.default_backend() == "tpu"
            and c.batch_size % lanes_r == 0
            and lanes_r % bt == 0
            and bt % 128 == 0  # Pallas lane-tile granularity
        )
        noises = jax.random.normal(
            k_noise, (c.updates_per_iter, c.batch_size, 2, self.action_dim),
            jnp.float32,
        )
        args = dict(
            obs_dim=self.obs_dim, gamma=c.gamma, tau=c.tau, lr=c.lr,
            target_entropy=self.target_entropy, alpha_floor=c.alpha_floor,
        )
        if in_kernel_sampling:
            rpb = c.batch_size // lanes_r
            row_idx = jax.random.randint(
                k_samp, (c.updates_per_iter * rpb,), 0,
                jnp.maximum(state.replay.filled, 1))
            fstate, closs, aloss = fs.fused_update_k_wmat(
                fstate, state.replay.data, row_idx, noises,
                block=c.fused_block, fold=c.fused_fold, **args)
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
                fstate, closs, aloss = fs.fused_update_k_wmat_batches(
                    fstate, batches, noises, block=c.fused_block,
                    fold=c.fused_fold, **args)
            else:
                packed, adam = fs.fused_unpack(fstate)
                packed, adam, closs, aloss = fs.update_k_reference(
                    packed, adam, batches, noises, **args)
                fstate = fs.fused_init(packed, adam)

        # optimization_barrier: the actor slices must MATERIALIZE before the
        # next chained kernel call (train_iters scan / multi-iter programs)
        # overwrites `w` in place — the kernel's input_output_aliases is an
        # unconditional in-place contract, and XLA does not reliably copy for
        # the other readers (measured at H=512: lazy slices fused into the
        # next rollout read kernel-(i+1)-trampled memory -> deterministic
        # garbage -> NaN; H=256 happened to schedule safely).
        actor_params = jax.lax.optimization_barrier(fs.unpack_actor(
            fstate.w, fstate.vec, self.obs_dim, self.action_dim))
        state = state._replace(
            actor_params=actor_params,
            log_alpha=fstate.vec[fs.V_MISC, fs.M_LA],
            fused=fstate,
        )
        return state, {"critic_loss": closs[-1], "actor_loss": aloss[-1]}

    def _train_iter(self, state: SACState, key: jax.Array):
        c = self.cfg
        k_roll, k_upd = jax.random.split(key)
        env_state, obs, slab, rewards, dones = self._rollout(state, k_roll)
        slab = nstep_slab(slab, dones, c.gamma, c.n_step)
        replay = replay_add_slab(state.replay, slab)
        state = state._replace(env_state=env_state, obs=obs, replay=replay)

        metrics = {}
        # Gate updates on warmup so early iters are no-ops for the parameters
        # but keep a single compiled program.
        ready = replay.filled >= jnp.minimum(c.warmup_rows, c.replay_rows)
        # In fused mode the canonical learner state is `fused`; the flax
        # critic/opt fields stay at their init snapshot and need no masking.
        learner_fields = (
            ("actor_params", "log_alpha", "fused")
            if c.fused_updates else (
                "actor_params", "critic_params", "target_critic_params",
                "log_alpha", "actor_opt", "critic_opt", "alpha_opt",
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
            for i in range(c.updates_per_iter):
                k_upd, k_i = jax.random.split(k_upd)
                new_state, m = self._update_once(state, k_i)
                # Select only learner leaves (masking the env/replay leaves
                # would re-materialize the whole buffer per update).
                state = gate(new_state, state)
                metrics = m
        metrics = dict(
            metrics,
            mean_reward=rewards.mean(),
            episodes_done=dones.sum(),
            alpha=jnp.exp(state.log_alpha),
        )
        return state._replace(step=state.step + 1), metrics

    # -------------------------------------------- checkpoint-format bridges --
    def migrate_to_fused(self, state: SACState) -> SACState:
        """Rebuild the kernel-layout `fused` state from the flax/optax
        snapshot of a pre-FusedState (or unfused-run) checkpoint.  The optax
        states carry the Adam moments; target-critic moment slots are unused
        (targets update by polyak, not Adam)."""
        if self._fs is None:
            raise ValueError(
                "fused-format bridge requires hidden=(h, h), h % 128 == 0")
        fs = self._fs

        zeros_t = jax.tree.map(jnp.zeros_like, state.target_critic_params)
        packed = fs.pack_params(
            state.actor_params, state.critic_params,
            state.target_critic_params, state.log_alpha)
        adam = fs.PackedAdam(
            m=fs.pack_params(state.actor_opt[0].mu, state.critic_opt[0].mu,
                             zeros_t, state.alpha_opt[0].mu),
            v=fs.pack_params(state.actor_opt[0].nu, state.critic_opt[0].nu,
                             zeros_t, state.alpha_opt[0].nu),
            count=state.critic_opt[0].count,
        )
        return state._replace(fused=fs.fused_init(packed, adam))

    def rehydrate_from_fused(self, state: SACState) -> SACState:
        """Inverse bridge: refresh the flax params AND optax moments from a
        fused-mode checkpoint so an unfused run resumes the same training
        trajectory (in fused mode the flax critic/opt fields freeze at their
        init snapshot — resuming from them would silently reset the critics)."""
        if self._fs is None:
            raise ValueError(
                "fused-format bridge requires hidden=(h, h), h % 128 == 0")
        fs = self._fs

        packed, adam = fs.fused_unpack(state.fused)
        actor, critic, target, log_alpha = fs.unpack_params(
            packed, state.actor_params, state.critic_params)
        a_mu, c_mu, _, la_mu = fs.unpack_params(
            adam.m, state.actor_params, state.critic_params)
        a_nu, c_nu, _, la_nu = fs.unpack_params(
            adam.v, state.actor_params, state.critic_params)

        def opt_state(tpl, mu, nu):
            return (tpl[0]._replace(count=adam.count, mu=mu, nu=nu),) + tuple(tpl[1:])

        return state._replace(
            actor_params=actor,
            critic_params=critic,
            target_critic_params=target,
            log_alpha=log_alpha,
            actor_opt=opt_state(state.actor_opt, a_mu, a_nu),
            critic_opt=opt_state(state.critic_opt, c_mu, c_nu),
            alpha_opt=opt_state(state.alpha_opt, la_mu, la_nu),
            fused=None,
        )

    def _train_iters(self, state: SACState, key: jax.Array, n: int):
        """n train_iters in ONE device program (lax.scan).

        Each host->device dispatch costs ~1.1 ms of tunnel latency on this
        setup — >10% of a fused train_iter.  Scanning amortizes it to
        ~1.1/n ms; returns the last iteration's metrics."""

        def body(s, k):
            return self._train_iter(s, k)

        state, ms = jax.lax.scan(body, state, jax.random.split(key, n))
        return state, jax.tree.map(lambda x: x[-1], ms)
