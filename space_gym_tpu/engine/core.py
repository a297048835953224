"""Vectorized env engine: pure-functional batched Space-Gym on device.

This is the TPU-first replacement for the reference's single-env Python loop
(gym_space/envs/spaceship_env.py:59-78 + gym's TimeLimit): env state is a
PyTree of arrays with a leading batch axis, `step` is one fused jit/vmap
kernel covering action translation -> ODE integration with terminal events ->
observation -> reward (including Goal's mid-episode goal resampling,
goal.py:154-157) -> termination/truncation -> masked auto-reset, and rollouts
are `lax.scan` over time.  Nothing touches the host between steps.

Physics modes:
  * "fixed"    — static-substep Dormand-Prince (ops.fixed_rk), lockstep across
                 the batch, the throughput path (default).
  * "adaptive" — the scipy-faithful adaptive RK45 with Brent event refinement
                 (ops.rk45), vmapped; slower under vmap because lanes mask-wait
                 for the slowest accept/reject sequence, but matches the
                 reference integrator to ~ulp in f64.

Randomness: ONE bulk (batch, n) uniform draw per step, consumed per lane
through utils.randvec.RandSource.  Profiling on TPU showed per-lane PRNG key
trees (the naive functional-RL pattern) cost more than the physics itself; the
bulk draw removes every per-lane threefry dependency chain, and per-lane state
carries no key at all.  Each env config's exact per-step budget is counted by
abstract tracing at engine construction.

Auto-reset follows the standard lockstep-RL convention (gymnax/brax): when a
lane terminates or truncates, `TimeStep.obs` is the first observation of the
new episode and `TimeStep.final_obs` carries the terminal observation for
bootstrapping.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..envs import dnc_math, goal_math, kepler_math
from ..envs.config import (DISCRETE_ACTIONS, TASK_DO_NOT_CRASH, TASK_GOAL,
                           TASK_KEPLER, EnvConfig)
from ..ops import events as events_mod
from ..ops import exact
from ..ops import field, fixed_rk, rk45
from ..ops.maths import onehot_take
from ..ops.constants import G
from ..tiling import device as dtiling
from ..utils.randvec import RandSource, count_consumed

_PROBE = 4096  # RandSource size used for consumption counting


class EnvState(NamedTuple):
    """Per-lane dynamic state; the engine always holds a batched version.
    Deliberately key-free — randomness arrives per step via the bulk draw."""

    y: jax.Array                      # (6,) [x, y, theta, vx, vy, omega]
    planets_pos: jax.Array            # (P, 2)
    goal_pos: jax.Array               # (2,)  (zeros for non-Goal tasks)
    ref_orbit: jax.Array              # (3,) [angle, ecc, a] (zeros unless Kepler)
    tiling: Optional[dtiling.TilingState]  # None unless Goal
    steps: jax.Array                  # () int32 — elapsed steps this episode


class TimeStep(NamedTuple):
    obs: jax.Array         # post-auto-reset observation (next policy input)
    reward: jax.Array
    terminated: jax.Array  # physics termination (crash/out-of-world/spin)
    truncated: jax.Array   # TimeLimit truncation (max_episode_steps)
    done: jax.Array        # terminated | truncated
    final_obs: jax.Array   # pre-reset observation (bootstrap target when truncated)


class EnvEngine:
    """Batched device engine for one EnvConfig.

    >>> eng = EnvEngine(get_config("GoalContinuous2P-v0"))
    >>> state, obs = eng.init(jax.random.key(0), 4096)
    >>> state, ts = eng.step(state, actions, jax.random.key(1))
    >>> state, obs, traj = eng.rollout(state, obs, key, policy, 100)
    """

    def __init__(
        self,
        config: EnvConfig,
        physics: str = "fixed",
        dtype=jnp.float32,
        substeps: int = 2,
        refine_iters: int = 12,
        auto_reset: bool = True,
        f32_actions: bool = False,
        pallas_fuse: str = "full",
        in_kernel_rng=False,
        obs_features: str | None = None,
        pallas_block: int | None = None,
        pallas_tableau: str = "dp5",
    ):
        if physics not in ("fixed", "adaptive", "pallas"):
            raise ValueError(
                f"physics must be 'fixed', 'adaptive' or 'pallas', got {physics!r}"
            )
        self.config = config
        self.physics = physics
        self.dtype = dtype
        self.pallas_block = pallas_block
        self.pallas_tableau = pallas_tableau
        self.substeps = substeps
        self.refine_iters = refine_iters
        self.auto_reset = auto_reset
        # Parity knob: replicate the reference's float32 action arithmetic in
        # continuous envs (spaceship_env.py:69-71 casts actions to f32; NumPy
        # then keeps f32 through the force/torque products).  Native mode uses
        # uniform engine-dtype math instead.
        self.f32_actions = f32_actions
        # "full" = the entire step (physics+obs+reward+resample+auto-reset) in
        # one kernel (ops.pallas_full); "env" = physics+obs+reward kernel with
        # the reset tail in XLA; "physics" = physics-only kernel (A/B tiers).
        self.pallas_fuse = pallas_fuse
        # Full-fused kernel RNG source: False = XLA-side bulk draw (default),
        # "threefry"/True = in-kernel threefry, bit-identical to the XLA draw
        # (CPU-testable), "hw" = pltpu hardware PRNG (fastest, own stream,
        # law-parity only; zeros under interpret mode so TPU-only).
        if in_kernel_rng is True:
            in_kernel_rng = "threefry"
        self.in_kernel_rng = (in_kernel_rng if dtype == jnp.float32 else False)
        self._event_fn = events_mod.make_event_fn(
            config.planet_radii, config.world_size, config.max_abs_vel_angle
        )
        self._event_comp_fns = events_mod.make_event_component_fns(
            config.planet_radii, config.world_size, config.max_abs_vel_angle
        )
        k = config.kepler
        self._alpha_gm = G * k.planet_mass if k is not None else 0.0

        # Opt-in trainer-side observation featurization: appends analytic
        # functions of the raw observation (kepler_math.error_features) as an
        # XLA epilogue AFTER the step/reset kernels, so every physics mode
        # shares one implementation and the env's own observation (parity
        # surface, quirk Q1) is untouched when the flag is off (default).
        # Consumers should size networks/replay off `self.obs_dim`, which
        # includes the appended features; `config.obs_dim` stays the raw dim.
        if obs_features not in (None, "kepler", "goal", "dnc"):
            raise ValueError(f"unknown obs_features {obs_features!r}")
        if obs_features == "kepler" and config.task != TASK_KEPLER:
            raise ValueError("obs_features='kepler' requires a Kepler env")
        if obs_features == "goal" and config.task != TASK_GOAL:
            raise ValueError("obs_features='goal' requires a Goal env")
        if obs_features == "dnc" and config.task != TASK_DO_NOT_CRASH:
            raise ValueError("obs_features='dnc' requires a DoNotCrash env")
        self.obs_features = obs_features
        self.obs_dim = config.obs_dim + {
            None: 0,
            "kepler": kepler_math.N_ERROR_FEATURES,
            "goal": goal_math.N_GOAL_FEATURES,
            "dnc": dnc_math.N_DNC_FEATURES,
        }[obs_features]

        # --- per-lane randomness budgets, counted by abstract tracing ---
        self.n_reset_rand = self._count_reset()
        self.n_step_rand = self._count_step()

        self.step = jax.jit(self._step_batched)
        self.reset = jax.jit(self._reset_batched, static_argnums=1)

    # ------------------------------------------------------------------ API --
    def init(self, key: jax.Array, batch_size: int):
        """Fresh batched state + first observations."""
        return self.reset(key, batch_size)

    def rollout(
        self,
        state: EnvState,
        obs: jax.Array,
        key: jax.Array,
        policy_fn: Callable[[jax.Array, jax.Array], jax.Array],
        n_steps: int,
    ):
        """`lax.scan` rollout: policy_fn(key, obs[B, D]) -> raw_action[B, ...].

        Returns (final_state, final_obs, TimeStep stacked over time [T, B, ...]).
        """

        def body(carry, _):
            st, ob, k = carry
            k, k_act, k_step = jax.random.split(k, 3)
            action = policy_fn(k_act, ob)
            st, ts = self._step_batched(st, action, k_step)
            return (st, ts.obs, k), ts

        (state, obs, _), traj = jax.lax.scan(body, (state, obs, key), None, length=n_steps)
        return state, obs, traj

    def random_policy(self):
        """Uniform random policy over the action space (for benchmarks)."""
        if self.config.continuous:
            def pol(key, obs):
                return jax.random.uniform(
                    key, (obs.shape[0], 2), dtype=self.dtype, minval=-1.0, maxval=1.0
                )
        else:
            def pol(key, obs):
                return jax.random.randint(key, (obs.shape[0],), 0, self.config.n_actions)
        return pol

    # ------------------------------------------------- batched entry points --
    def _augment_obs(self, obs: jax.Array) -> jax.Array:
        """Append the opt-in obs_features columns (see __init__); identity by
        default.  obs is (..., config.obs_dim), raw/unnormalized (quirk Q1)."""
        if not self.obs_features:
            return obs
        d = self.config.obs_dim
        if self.obs_features == "goal":
            feats = goal_math.features_for_config(jnp, obs, self.config)
        elif self.obs_features == "dnc":
            feats = dnc_math.features_for_config(jnp, obs, self.config)
        else:
            feats = kepler_math.error_features(
                jnp,
                jnp.asarray(self._alpha_gm, self.dtype),
                obs[..., 0:2],                  # pos_xy
                obs[..., 4:6],                  # vel_xy
                obs[..., d - 3],                # ref_orbit_angle (kepler.py:180-185)
                obs[..., d - 2],                # eccentricity
                obs[..., d - 1],                # semi-major axis
            )
        return jnp.concatenate([obs, feats.astype(obs.dtype)], axis=-1)

    def _reset_batched(self, key: jax.Array, batch_size: int):
        u = jax.random.uniform(key, (batch_size, self.n_reset_rand), dtype=self.dtype)

        def lane(u_lane):
            state = self._reset_lane(RandSource(u_lane))
            return state, self._observe(state)

        state, obs = jax.vmap(lane)(u)
        return state, self._augment_obs(obs)

    def _step_batched(self, state: EnvState, raw_action, key: jax.Array):
        state, ts = self._step_inner(state, raw_action, key)
        if self.obs_features:
            ts = ts._replace(
                obs=self._augment_obs(ts.obs),
                final_obs=self._augment_obs(ts.final_obs),
            )
        return state, ts

    def _step_inner(self, state: EnvState, raw_action, key: jax.Array):
        batch = state.y.shape[0]
        u = jax.random.uniform(key, (batch, self.n_step_rand), dtype=self.dtype)

        if self.physics == "pallas":
            # The fused kernel is inherently batched (component-major layout);
            # hoist it out of the per-lane vmap.  It produces physics, the
            # observation AND the reward; the per-lane tail keeps only goal
            # resampling (RNG), truncation and auto-reset.
            from ..ops.pallas_step import (
                fused_env_step_for_config,
                fused_step_for_config,
            )

            # Default 1024 was the r1-r4 measured optimum; pallas_block
            # overrides for lane-block ILP sweeps (a (1024,) f32 per-lane
            # array is exactly ONE 8x128 vreg, so the kernel's dependency
            # chain is pure instruction latency at block 1024 — larger
            # blocks put 2-8 independent vregs behind every chain step).
            block = self.pallas_block or (
                1024 if batch % 1024 == 0 else (512 if batch % 512 == 0 else batch))
            if batch % block:
                block = batch
            interp = jax.default_backend() != "tpu"
            action_b = jax.vmap(self._translate_action)(raw_action)
            if self.pallas_fuse == "full":
                return self._step_full_fused(state, action_b, key, block, interp)
            if self.pallas_fuse == "env":
                fused = fused_env_step_for_config(
                    self.config, self.substeps, self.refine_iters, block, interp,
                    tableau=self.pallas_tableau,
                )
                y_b, term_b, obs_b, rew_b = fused(
                    state.y, action_b, state.planets_pos, state.goal_pos,
                    state.ref_orbit,
                )

                def lane_p(st, a, u_lane, y_phys, term_phys, obs_p, rew_p):
                    return self._step_lane(
                        st, a, RandSource(u_lane),
                        precomp=(y_phys, term_phys, obs_p, rew_p),
                    )

                return jax.vmap(lane_p)(
                    state, raw_action, u, y_b, term_b, obs_b, rew_b
                )

            fused = fused_step_for_config(
                self.config, self.substeps, self.refine_iters, block, interp,
                tableau=self.pallas_tableau,
            )
            y_b, term_b = fused(state.y, action_b, state.planets_pos)

            def lane_y(st, a, u_lane, y_phys, term_phys):
                return self._step_lane(
                    st, a, RandSource(u_lane), phys=(y_phys, term_phys)
                )

            return jax.vmap(lane_y)(state, raw_action, u, y_b, term_b)

        def lane(st, a, u_lane):
            return self._step_lane(st, a, RandSource(u_lane))

        return jax.vmap(lane)(state, raw_action, u)

    def _step_full_fused(self, state: EnvState, action_b, key, block, interp):
        """Whole env step in one kernel (ops.pallas_full); XLA only draws the
        bulk uniforms and assembles the TimeStep."""
        from ..ops.pallas_full import full_step_for_config
        from ..tiling.device import TilingState

        cfg = self.config
        batch = state.y.shape[0]
        full = full_step_for_config(
            cfg, self.substeps, self.refine_iters, block, interp,
            self.in_kernel_rng, self.pallas_tableau,
        )
        if self.in_kernel_rng:
            u = jax.random.key_data(key) if jnp.issubdtype(
                key.dtype, jax.dtypes.prng_key) else key
        else:
            u = jax.random.uniform(
                key, (batch, full.n_uniform_rows), dtype=self.dtype)

        if cfg.task == TASK_GOAL:
            ts = state.tiling
            tili = jnp.concatenate(
                [
                    ts.free.astype(jnp.int32),
                    ts.ship_tile[:, None].astype(jnp.int32),
                    ts.goal_tile[:, None].astype(jnp.int32),
                    state.steps[:, None].astype(jnp.int32),
                    ts.case_b[:, None].astype(jnp.int32),
                    ts.flip_xy[:, None].astype(jnp.int32),
                ],
                axis=1,
            )
            col_shift = ts.col_shift
        else:
            z = jnp.zeros((batch, 1), jnp.int32)
            tili = jnp.concatenate([state.steps[:, None].astype(jnp.int32), z, z], axis=1)
            col_shift = jnp.zeros((batch, 1), self.dtype)

        (yo, po, go, ro, cso, obs, fobs, rew, tio, flags) = full(
            state.y, action_b, state.planets_pos, state.goal_pos,
            state.ref_orbit, col_shift, tili, u,
        )
        yo = yo.T
        obs = obs.T
        fobs = fobs.T
        terminated = flags[0].astype(bool)
        truncated = flags[1].astype(bool)
        done = flags[2].astype(bool)
        n_tiles = cfg.tiling.n_tiles if cfg.tiling is not None else 0
        if cfg.task == TASK_GOAL:
            tiling = TilingState(
                free=tio[:n_tiles].T,
                ship_tile=tio[n_tiles],
                goal_tile=tio[n_tiles + 1],
                case_b=tio[n_tiles + 3].astype(bool),
                flip_xy=tio[n_tiles + 4].astype(bool),
                col_shift=cso.T,
            )
            steps = tio[n_tiles + 2]
        else:
            tiling = None
            steps = tio[0]
        new_state = EnvState(
            y=yo,
            planets_pos=po.T.reshape(batch, cfg.n_planets, 2),
            goal_pos=go.T,
            ref_orbit=ro.T,
            tiling=tiling,
            steps=steps,
        )
        return new_state, TimeStep(
            obs=obs,
            reward=rew[0],
            terminated=terminated,
            truncated=truncated,
            done=done,
            final_obs=fobs,
        )

    # ------------------------------------------------------ budget counting --
    def _count_reset(self) -> int:
        return count_consumed(self._reset_lane, _PROBE, self.dtype)

    def _count_step(self) -> int:
        state_sds = jax.eval_shape(
            lambda u: self._reset_lane(RandSource(u)),
            jax.ShapeDtypeStruct((self.n_reset_rand,), self.dtype),
        )
        if self.config.continuous:
            act_sds = jax.ShapeDtypeStruct((2,), self.dtype)
        else:
            act_sds = jax.ShapeDtypeStruct((), jnp.int32)
        return count_consumed(
            lambda rs, st, a: self._step_lane(st, a, rs),
            _PROBE,
            self.dtype,
            example_args=(state_sds, act_sds),
        )

    # ------------------------------------------------------------ internals --
    def _reset_lane(self, rs: RandSource) -> EnvState:
        cfg = self.config
        dtype = self.dtype
        if cfg.task == TASK_GOAL:
            ts, y, planets, goal, ref = self._reset_goal(rs)
        elif cfg.task == TASK_KEPLER:
            ts, y, planets, goal, ref = self._reset_kepler(rs)
        else:
            ts, y, planets, goal, ref = self._reset_dnc(rs)
        return EnvState(
            y=y.astype(dtype),
            planets_pos=planets.astype(dtype),
            goal_pos=goal.astype(dtype),
            ref_orbit=ref.astype(dtype),
            tiling=ts,
            steps=jnp.asarray(0, jnp.int32),
        )

    def _reset_goal(self, rs: RandSource):
        """goal.py:133-145, on device."""
        cfg = self.config
        dtype = self.dtype
        ts, ship_pos, planets = dtiling.tiling_reset(cfg.tiling, rs, dtype)
        ts, goal = dtiling.find_new_goal(cfg.tiling, ts, rs, dtype)
        angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
        vel = rs.normal(2).astype(dtype) * 0.07
        max_w = 0.7 * cfg.max_abs_vel_angle
        w = jnp.clip(exact.divc(rs.normal().astype(dtype) * max_w, 3), -max_w, max_w)
        y = jnp.concatenate([ship_pos, angle[None], vel, w[None]])
        return ts, y, planets, goal, jnp.zeros((3,), dtype)

    def _reset_kepler(self, rs: RandSource):
        """kepler.py:233-267; `randomize` resamples the reference orbit."""
        cfg = self.config
        k = cfg.kepler
        dtype = self.dtype
        planet_angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
        dist = rs.uniform(
            minval=k.planet_radius + 0.5, maxval=k.border_radius - 0.5
        ).astype(dtype)
        pos = jnp.stack([jnp.cos(planet_angle), jnp.sin(planet_angle)]) * dist
        ship_angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
        if k.randomize:
            u = rs.take(2).astype(dtype)
            ecc = u[0] * 0.7
            orbit_angle = u[1] * 2 * jnp.pi
        else:
            ecc = jnp.asarray(k.ref_orbit_eccentricity, dtype)
            orbit_angle = jnp.asarray(k.ref_orbit_angle, dtype)
        ref = jnp.stack([orbit_angle, ecc, jnp.asarray(k.ref_orbit_a, dtype)])
        vel = rs.normal(2).astype(dtype) * 0.05
        max_w = 0.7 * cfg.max_abs_vel_angle
        w = jnp.clip(exact.divc(rs.normal().astype(dtype) * max_w, 5), -max_w, max_w)
        y = jnp.concatenate([pos, ship_angle[None], vel, w[None]])
        planets = jnp.asarray(cfg.fixed_planet_pos, dtype)
        return None, y, planets, jnp.zeros((2,), dtype), ref

    def _reset_dnc(self, rs: RandSource):
        """do_not_crash.py:34-45."""
        cfg = self.config
        d = cfg.dnc
        dtype = self.dtype
        planet_angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
        dist = rs.uniform(
            minval=d.planet_radius + 0.2, maxval=d.border_radius - 0.15
        ).astype(dtype)
        pos = jnp.stack([jnp.cos(planet_angle), jnp.sin(planet_angle)]) * dist
        ship_angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
        vel = rs.normal(2).astype(dtype) * 0.07
        max_w = 0.7 * cfg.max_abs_vel_angle
        w = jnp.clip(exact.divc(rs.normal().astype(dtype) * max_w, 3), -max_w, max_w)
        y = jnp.concatenate([pos, ship_angle[None], vel, w[None]])
        planets = jnp.asarray(cfg.fixed_planet_pos, dtype)
        return None, y, planets, jnp.zeros((2,), dtype), jnp.zeros((3,), dtype)

    # ----------------------------------------------------------------- step --
    def _translate_action(self, raw_action):
        """spaceship_env.py:189-214 as branchless table lookup / rescale."""
        if self.config.continuous:
            a = jnp.clip(raw_action.astype(self.dtype), -1.0, 1.0)
            return jnp.stack([(a[0] + 1) / 2, a[1]])
        table = jnp.asarray(DISCRETE_ACTIONS, self.dtype)
        return onehot_take(table, raw_action.astype(jnp.int32))

    def _physics(self, y0, action, planets_pos):
        cfg = self.config
        ship = cfg.ship
        f32a = self.f32_actions and cfg.continuous

        def rhs(_t, y):
            return field.ship_vector_field(
                ship, cfg.planet_masses, planets_pos, action, y, f32_action=f32a
            )

        def ev(y):
            return self._event_fn(planets_pos, y)

        y0 = field.apply_steering_override(ship, y0, action, f32_action=f32a)
        if self.physics == "fixed":
            ev_fns = tuple(
                (lambda y, f=f: f(planets_pos, y)) for f in self._event_comp_fns
            )
            out = fixed_rk.fixed_solve_step(
                rhs, ev_fns, y0, cfg.step_size,
                n_substeps=self.substeps, refine_iters=self.refine_iters,
            )
        else:
            out = rk45.solve_step(rhs, ev, y0, cfg.step_size)
            # The reference hard-fails on solver failure (`assert
            # ode_solution.success`, dynamic_model.py:120); per-lane asserts
            # don't exist under SPMD, so poison the lane with NaN — loud in
            # every downstream obs/reward/metric instead of silently wrong.
            out = out._replace(
                y=jnp.where(out.failed, jnp.full_like(out.y, jnp.nan), out.y)
            )
        y = field.wrap_ship_angle(out.y)
        return y, out.terminated

    def _step_lane(
        self, state: EnvState, raw_action, rs: RandSource, precomp=None, phys=None
    ):
        cfg = self.config
        action = self._translate_action(raw_action)
        last_xy = state.y[0:2]

        if precomp is not None:
            # Physics, observation and reward came out of the fused kernel;
            # only the RNG-consuming goal resample remains.
            y, terminated, final_obs, reward = precomp
            if cfg.task == TASK_GOAL:
                _, goal_pos, tiling = self._goal_resample(state, y, rs)
            else:
                goal_pos, tiling = state.goal_pos, state.tiling
        else:
            if phys is None:
                y, terminated = self._physics(state.y, action, state.planets_pos)
            else:
                y, terminated = phys
            reward, goal_pos, tiling = self._reward(state, y, last_xy, action, rs)
            # Reference order: _make_observation runs BEFORE _reward
            # (spaceship_env.py:76-77), so a goal-reach step's observation
            # still shows the REACHED goal; the resampled goal only enters
            # next step's state.  Build the obs from the old goal/tiling, the
            # carry from the new ones.
            obs_state = EnvState(
                y=y,
                planets_pos=state.planets_pos,
                goal_pos=state.goal_pos,
                ref_orbit=state.ref_orbit,
                tiling=state.tiling,
                steps=state.steps,
            )
            final_obs = self._observe(obs_state)

        steps = state.steps + 1
        truncated = jnp.asarray(steps >= cfg.max_episode_steps) & ~terminated
        done = terminated | truncated
        cont = EnvState(
            y=y,
            planets_pos=state.planets_pos,
            goal_pos=goal_pos,
            ref_orbit=state.ref_orbit,
            tiling=tiling,
            steps=steps,
        )

        if self.auto_reset:
            fresh = self._reset_lane(rs)
            new_state = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), fresh, cont
            )
            obs = jnp.where(done, self._observe(fresh), final_obs)
        else:
            new_state = cont
            obs = final_obs

        return new_state, TimeStep(
            obs=obs,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            done=done,
            final_obs=final_obs,
        )

    # --------------------------------------------------------------- reward --
    def _reward(self, state: EnvState, y, last_xy, action, rs: RandSource):
        cfg = self.config
        if cfg.task == TASK_GOAL:
            return self._goal_reward(state, y, last_xy, rs)
        if cfg.task == TASK_KEPLER:
            r = self._kepler_reward(state, y, action)
        else:
            r = jnp.asarray(cfg.dnc.reward_per_step, self.dtype)
        return r, state.goal_pos, state.tiling

    def _goal_resample(self, state: EnvState, y, rs: RandSource):
        """Goal-reach resample (goal.py:154-157, quirk Q11): on reach, a new
        goal is drawn mid-step, consuming tiling randomness.  Shared by the
        XLA reward path and the fused-kernel tail so the RandSource
        consumption order is identical in both modes."""
        cfg = self.config
        # Reference reach check is np.linalg.norm (1-D -> BLAS ddot in numpy);
        # exact.norm_last is that kernel in parity mode, plain jnp otherwise.
        reached = exact.norm_last(state.goal_pos - y[0:2]) < cfg.goal_radius
        new_tiling, new_goal = dtiling.find_new_goal(
            cfg.tiling, state.tiling, rs, self.dtype
        )
        tiling = jax.tree.map(
            lambda a, b: jnp.where(reached, a, b), new_tiling, state.tiling
        )
        goal_pos = jnp.where(reached, new_goal, state.goal_pos)
        return reached, goal_pos, tiling

    def _goal_reward(self, state: EnvState, y, last_xy, rs: RandSource):
        """goal.py:147-158 (+ _goal_vel_reward2 :160-164,
        _safety_reward_simple2 :204-227) with on-device goal resampling on
        reach (quirk Q11: the reward transition is stateful + RNG-consuming)."""
        cfg = self.config
        p = cfg.goal
        pos = y[0:2]

        cur_dist = exact.norm_last(state.goal_pos - pos)
        last_dist = exact.norm_last(state.goal_pos - last_xy)
        goal_vel_reward = (last_dist - cur_dist) * p.distance_fctr

        # The reference's closest-planet scan computes each distance as
        # np.sqrt((sx-x0)**2 + (sy-y0)**2) on numpy SCALARS (goal.py:204-227)
        # — scalar **2 is libm pow, not x*x (see ops.exact.powf).
        def _scalar_dist(a, b):
            d = a - b
            return jnp.sqrt(exact.powf(d[..., 0], 2) + exact.powf(d[..., 1], 2))

        dists = _scalar_dist(pos, state.planets_pos)
        closest = jnp.argmin(dists).astype(jnp.int32)
        mindist = jnp.min(dists)
        radius = onehot_take(jnp.asarray(cfg.planet_radii, self.dtype), closest)
        closest_pos = onehot_take(state.planets_pos, closest)
        prev_dist = _scalar_dist(last_xy, closest_pos)
        in_danger = (mindist - radius) < p.danger_zone
        approaching = prev_dist > mindist
        safety = jnp.where(
            in_danger & approaching, -p.distance_fctr * (prev_dist - mindist), 0.0
        )

        reward = (
            p.survival_reward_scale
            + p.goal_vel_reward_scale * goal_vel_reward
            + p.safety_reward_scale * safety
        )
        reached, goal_pos, tiling = self._goal_resample(state, y, rs)
        reward = reward + jnp.where(reached, p.goal_sparse_reward, 0.0)
        return reward.astype(self.dtype), goal_pos, tiling

    def _kepler_reward(self, state: EnvState, y, action):
        """_dense_reward5 (kepler.py:111-150)."""
        k = self.config.kepler
        ref = state.ref_orbit
        # Reference: np.linalg.norm(last_action) — f32 sdot for continuous
        # actions, f64 ddot for the discrete table rows (gym_api._kepler_reward).
        act_penalty = exact.norm_last(action)
        xp = exact.exact_xp if exact.enabled() else jnp
        return kepler_math.dense_reward(
            xp,
            jnp.asarray(self._alpha_gm, self.dtype),
            y[0:2],
            y[3:5],
            act_penalty,
            ref[0],
            ref[2],
            ref[1],
            k.numerator_C,
            k.rad_penalty_C,
            k.act_penalty_C,
        ).astype(self.dtype)

    # ---------------------------------------------------------- observation --
    def _observe(self, state: EnvState) -> jax.Array:
        """spaceship_env.py:113-140 (raw/unnormalized, quirk Q1) + Kepler's
        appended orbit params (kepler.py:172-187)."""
        cfg = self.config
        y = state.y
        pos = y[0:2]
        parts = [
            pos,
            jnp.stack([jnp.cos(y[2]), jnp.sin(y[2])]),
            y[3:5],
            y[5:6],
        ]
        if cfg.with_lidar:
            radii = jnp.asarray(cfg.planet_radii, self.dtype)
            parts.append(self._lidar(pos, state.planets_pos, radii).reshape(-1))
            if cfg.with_goal:
                parts.append(self._lidar(pos, state.goal_pos, 0.0))
        obs = jnp.concatenate(parts)
        if cfg.task == TASK_KEPLER:
            # obs order is [angle, ecc, a] (kepler.py:180-185)
            obs = jnp.concatenate([obs, state.ref_orbit])
        return obs

    def _lidar(self, ship_pos, obj_pos, obj_radius):
        """_create_lidar_vector (spaceship_env.py:133-140), broadcast over
        objects: unit(ship->obj) * (dist - radius) * 2 / world_size."""
        v = obj_pos - ship_pos
        ang = jnp.mod(exact.atan2(v[..., 1], v[..., 0]), 2 * jnp.pi)
        scale = exact.divc(
            (exact.norm_last(v) - obj_radius) * 2, self.config.world_size
        )
        return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1) * scale[..., None]


@functools.lru_cache(maxsize=None)
def get_engine(env_id: str, physics: str = "fixed", substeps: int = 2, x64: bool = False):
    """Cached engine factory (engines are stateless; jit caches live on them)."""
    from ..registry import get_config

    return EnvEngine(
        get_config(env_id),
        physics=physics,
        dtype=jnp.float64 if x64 else jnp.float32,
        substeps=substeps,
    )
