"""Full-episode BITWISE replay of recorded reference trajectories on the
DEVICE engine (the vectorized EnvEngine, f64 adaptive physics).

This is the strong form of SURVEY.md §7 step 5: the engine's own step path —
action translation -> adaptive RK45 with event root-finding -> observation ->
reward (incl. Goal's mid-episode resample transition) -> termination /
TimeLimit — runs as compiled XLA code and must reproduce the reference's
obs / reward / done / state sequences bit-for-bit at every step of every
recorded episode (tests/goldens, 7 env IDs x 2 seed sets).

Randomness feed-through: the engine consumes randomness through RandSource
slots; parity mode feeds SEMANTIC draws recorded from the reference's MT19937
streams instead of fresh uniforms —

* Kepler: the env-RNG scalar draws themselves (angles, distance, the two
  global-np.random orbit uniforms for randomize=True, the velocity /
  angular-velocity normals); the reset state is then ASSEMBLED ON DEVICE with
  the reference's expressions (cos/sin/mults — bitwise-safe XLA ops).
* Goal: ship/planet/goal POSITIONS from the recorded layout plus the env-RNG
  scalar draws (angle + normals).  The hexagonal-tiling arithmetic is
  deliberately restructured on device (tiling/device.py is branchless
  TPU-first code, not an expression-for-expression twin), so tiling output
  positions are injected at the position level; the host twin
  (tiling/host.py) remains the bitwise oracle for the sampler itself.
* Goal resample (quirk Q11): the step feed carries the post-step goal; the
  on-device reach decision (norm < radius on bitwise state) selects it.

Run environment (process-global, hence the subprocess driver in
tests/test_golden_parity.py):
    SGT_EXACT_MATH=1  JAX_PLATFORMS=cpu  x64
    XLA_FLAGS="--xla_disable_hlo_passes=fusion,algsimp ..."
fusion off => LLVM cannot contract mul+add chains into FMAs; algsimp off =>
no division->reciprocal / division-merging rewrites; SGT_EXACT_MATH routes
norms/gemv/gemm/pow/atan2 through numpy-exact kernels (ops.exact).

Usage: python -m space_gym_tpu.parity.device_replay [--env-id ID] [--subset s]
Prints one JSON line per (env_id, subset) and exits non-zero on any
non-bitwise step.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REQUIRED_FLAGS = "--xla_disable_hlo_passes=fusion,algsimp"

GOLDEN_IDS = [
    "GoalContinuous2P-v0",
    "GoalContinuous3P-v0",
    "GoalContinuous4P-v0",
    "KeplerCircleOrbit-v0",
    "KeplerEllipseEasy-v0",
    "KeplerEllipseHard-v0",
    "KeplerRandomOrbits-v0",
]
GOLDEN_SETS = ["", "seed7"]


def _setup():
    if REQUIRED_FLAGS.split("=")[1] not in os.environ.get("XLA_FLAGS", ""):
        raise SystemExit(
            f"device_replay needs XLA_FLAGS to contain {REQUIRED_FLAGS!r} "
            "(set before process start)"
        )
    os.environ.setdefault("SGT_EXACT_MATH", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


class ParityRand:
    """RandSource twin whose uniform()/normal() return the recorded SEMANTIC
    values verbatim (the feed already holds post-transform draws where the
    reference's RNG applied range scaling; normals are recorded normals —
    MT19937's polar-method output cannot be reproduced from a uniform)."""

    def __init__(self, u):
        self.u = u
        self.i = 0

    def take(self, n):
        out = self.u[self.i : self.i + n]
        self.i += n
        return out

    def uniform(self, n=None, minval=0.0, maxval=1.0):
        u = self.take(1 if n is None else n)
        return u[0] if n is None else u

    def normal(self, n=None):
        u = self.take(1 if n is None else n)
        return u[0] if n is None else u


def make_parity_engine(env_id: str):
    import jax
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.engine.core import EnvEngine
    from space_gym_tpu.envs.config import TASK_GOAL
    from space_gym_tpu.tiling.device import TilingState

    cfg = space_gym_tpu.get_config(env_id)

    class ParityEngine(EnvEngine):
        """EnvEngine with reset/resample randomness replaced by semantic
        injection slots; everything else (physics, obs, rewards, termination,
        truncation) is the stock engine step path."""

        def _translate_action(self, raw_action):
            # Continuous translation in float32, as the reference does it
            # (spaceship_env.py:69-71, 210-214): (a+1)/2 ROUNDS in f32 when
            # a+1 needs 25 mantissa bits.
            if self.config.continuous:
                a = raw_action.astype(jnp.float32)
                return jnp.stack([(a[0] + jnp.float32(1.0)) / jnp.float32(2.0), a[1]])
            return super()._translate_action(raw_action)

        def _reset_goal(self, rs):
            # Feed: ship_pos(2), planets(2P), goal(2) [tiling-level injection],
            # then the env-RNG draws assembled like goal.py:140-145.
            cfg = self.config
            dtype = self.dtype
            from ..ops import exact

            ship_pos = rs.take(2).astype(dtype)
            planets = rs.take(2 * cfg.n_planets).astype(dtype).reshape(cfg.n_planets, 2)
            goal = rs.take(2).astype(dtype)
            angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
            vel = rs.normal(2).astype(dtype) * 0.07
            max_w = 0.7 * cfg.max_abs_vel_angle
            w = jnp.clip(exact.divc(rs.normal().astype(dtype) * max_w, 3), -max_w, max_w)
            y = jnp.concatenate([ship_pos, angle[None], vel, w[None]])
            geom = cfg.tiling
            ts = TilingState(
                free=jnp.zeros((geom.n_tiles,), jnp.int32),
                ship_tile=jnp.asarray(0, jnp.int32),
                goal_tile=jnp.asarray(0, jnp.int32),
                case_b=jnp.asarray(False),
                flip_xy=jnp.asarray(False),
                col_shift=jnp.zeros((geom.cols,), dtype),
            )
            return ts, y, planets, goal, jnp.zeros((3,), dtype)

        def _goal_resample(self, state, y, rs):
            # Reach decision on device (bitwise state => bitwise decision);
            # the new goal is the recorded post-step goal from the feed.
            from ..ops import exact

            cfg = self.config
            injected = rs.take(2).astype(self.dtype)
            reached = exact.norm_last(state.goal_pos - y[0:2]) < cfg.goal_radius
            goal_pos = jnp.where(reached, injected, state.goal_pos)
            return reached, goal_pos, state.tiling

        # -- feed-driven entry points (replace the bulk jax.random draws).
        # Slot COUNTS are unchanged vs RandSource (uniform/normal consume one
        # slot per value either way), so the engine's own n_reset_rand /
        # n_step_rand budgets — counted through these overridden methods at
        # construction — are exactly the parity feed sizes.
        def reset_from_feed(self, feed):
            def lane(u):
                st = self._reset_lane(ParityRand(u))
                return st, self._observe(st)

            return jax.jit(jax.vmap(lane))(feed)

        def make_step_from_feed(self):
            def lane(st, a, u):
                return self._step_lane(st, a, ParityRand(u))

            return jax.jit(jax.vmap(lane))

    return ParityEngine(
        cfg,
        physics="adaptive",
        dtype=jnp.float64,
        auto_reset=False,
        f32_actions=True,
    )


def build_reset_feed(env_id, golden, ep, seed):
    """Semantic reset draws in the ParityEngine consumption order, reproducing
    the reference's env-RNG call sequence (SURVEY.md §3.2) via the same
    sha512->MT19937 derivation (utils.seeding)."""
    import space_gym_tpu
    from space_gym_tpu.envs.config import TASK_GOAL, TASK_KEPLER
    from space_gym_tpu.utils import seeding

    cfg = space_gym_tpu.get_config(env_id)
    p = f"ep{ep}_"
    rng, _ = seeding.np_random(seed + ep)
    np.random.seed(seed + 1000 * ep)  # Kepler randomize uses GLOBAL np.random (Q6)

    if cfg.task == TASK_GOAL:
        ship_pos = golden[p + "reset_state"][:2]
        planets = np.asarray(golden[p + "reset_planets"], float).reshape(-1)
        goal = np.asarray(golden[p + "reset_goal"], float)
        angle = rng.uniform(0, 2 * np.pi)
        n_vel = rng.standard_normal(2)
        n_w = rng.standard_normal()
        return np.concatenate([ship_pos, planets, goal, [angle], n_vel, [n_w]])

    if cfg.task == TASK_KEPLER:
        k = cfg.kepler
        planet_angle = rng.uniform(0, 2 * np.pi)
        dist = rng.uniform(k.planet_radius + 0.5, k.border_radius - 0.5)
        ship_angle = rng.uniform(0, 2 * np.pi)
        parts = [planet_angle, dist, ship_angle]
        if k.randomize:
            parts += [np.random.uniform(), np.random.uniform()]
        n_vel = rng.standard_normal(2)
        n_w = rng.standard_normal()
        return np.asarray(parts + [n_vel[0], n_vel[1], n_w], float)

    raise ValueError(f"no goldens exist for task family of {env_id}")


def replay(env_id: str, subset: str, golden_dir: str) -> dict:
    import jax.numpy as jnp

    path = os.path.join(golden_dir, subset, f"{env_id}.npz")
    g = np.load(path)
    seed = int(g["seed"])
    eng = make_parity_engine(env_id)
    n_reset, n_step = eng.n_reset_rand, eng.n_step_rand
    step_fn = eng.make_step_from_feed()

    stats = dict(env_id=env_id, subset=subset or "seed42", episodes=int(g["episodes"]),
                 steps=0, state_bitwise=0, obs_bitwise=0, reward_bitwise=0,
                 flag_match=0)
    mismatches = []

    for ep in range(int(g["episodes"])):
        p = f"ep{ep}_"
        feed = build_reset_feed(env_id, g, ep, seed)
        assert feed.shape[0] == n_reset, (feed.shape, n_reset)
        state, obs0 = eng.reset_from_feed(jnp.asarray(feed[None]))
        y0 = np.asarray(state.y[0])
        if not np.array_equal(y0, g[p + "reset_state"]):
            mismatches.append(f"ep{ep} reset_state")
        if not np.array_equal(np.asarray(obs0[0]), g[p + "reset_obs"]):
            mismatches.append(f"ep{ep} reset_obs")

        actions = g[p + "actions"]
        goals = g[p + "goals"] if p + "goals" in g else None
        for t in range(len(actions)):
            if n_step:
                ufeed = np.zeros((1, n_step))
                ufeed[0, :2] = goals[t]
            else:
                ufeed = np.zeros((1, 0))
            act = np.asarray(actions[t])[None].astype(
                np.float64 if eng.config.continuous else np.int32
            )
            state, ts = step_fn(state, jnp.asarray(act), jnp.asarray(ufeed))
            stats["steps"] += 1
            ok_state = np.array_equal(np.asarray(state.y[0]), g[p + "post_states"][t])
            ok_obs = np.array_equal(np.asarray(ts.final_obs[0]), g[p + "obs"][t])
            ok_rew = np.asarray(ts.reward[0]) == g[p + "rewards"][t]
            done_g = bool(g[p + "dones"][t])
            trunc_g = bool(g[p + "truncated"][t])
            ok_flag = (bool(ts.done[0]) == done_g) and (bool(ts.truncated[0]) == trunc_g)
            stats["state_bitwise"] += int(ok_state)
            stats["obs_bitwise"] += int(ok_obs)
            stats["reward_bitwise"] += int(ok_rew)
            stats["flag_match"] += int(ok_flag)
            if not (ok_state and ok_obs and ok_rew and ok_flag):
                if len(mismatches) < 8:
                    mismatches.append(
                        f"ep{ep} t{t}: state={ok_state} obs={ok_obs} "
                        f"rew={ok_rew} flags={ok_flag}"
                    )

    stats["bitwise"] = (
        not mismatches
        and stats["state_bitwise"] == stats["steps"]
        and stats["obs_bitwise"] == stats["steps"]
        and stats["reward_bitwise"] == stats["steps"]
        and stats["flag_match"] == stats["steps"]
    )
    if mismatches:
        stats["mismatches"] = mismatches
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default=None, help="one ID (default: all seven)")
    ap.add_argument("--subset", default=None, help="'' or 'seed7' (default: both)")
    ap.add_argument("--golden-dir", default=None)
    args = ap.parse_args(argv)
    _setup()

    golden_dir = args.golden_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests", "goldens",
    )
    ids = [args.env_id] if args.env_id else GOLDEN_IDS
    subsets = [args.subset] if args.subset is not None else GOLDEN_SETS
    ok = True
    for env_id in ids:
        for subset in subsets:
            st = replay(env_id, subset, golden_dir)
            print(json.dumps(st), flush=True)
            ok = ok and st["bitwise"]
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
