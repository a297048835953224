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
* Goal: the TILING DRAWS themselves (case/flip/col-shift/gate uniforms,
  range-scaled disk angles, and the integer outputs of the MT19937 integer
  path — randint/choice — which, like the polar-method normals, cannot be
  reproduced from float uniforms).  The sampler arithmetic — column-shift
  normalization, tile centres, uniform-disk assembly, the ordered free-list
  evolution, the taxi-distance argmax — runs ON DEVICE through the
  sequential-exact twin (tiling/device_exact.py); ship/planet/goal POSITIONS
  are computed, not injected.  The production sampler (tiling/device.py)
  stays the branchless TPU-first rewrite.
* Goal resample (quirk Q11): the step feed carries that resample's tiling
  draws; the on-device reach decision (norm < radius on bitwise state) gates
  whether the freshly-computed goal and free-list update apply.

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
    from space_gym_tpu.tiling.device_exact import make_exact_consts

    cfg = space_gym_tpu.get_config(env_id)
    exact_consts = make_exact_consts(cfg.tiling) if cfg.task == TASK_GOAL else None

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
            # Feed: the tiling DRAWS (hexagonal_tiling.py:53-134 call order),
            # run through the sequential-exact device twin, then the env-RNG
            # draws assembled like goal.py:140-145.
            cfg = self.config
            dtype = self.dtype
            from ..ops import exact
            from ..tiling import device_exact as dx

            ts, positions = dx.reset_exact(cfg.tiling, self._exact_consts, rs, dtype)
            ship_pos = positions[0]
            planets = positions[1:]
            ts, goal = dx.find_new_goal_exact(
                cfg.tiling, self._exact_consts, ts, rs, dtype)
            angle = rs.uniform(maxval=2 * jnp.pi).astype(dtype)
            vel = rs.normal(2).astype(dtype) * 0.07
            max_w = 0.7 * cfg.max_abs_vel_angle
            w = jnp.clip(exact.divc(rs.normal().astype(dtype) * max_w, 3), -max_w, max_w)
            y = jnp.concatenate([ship_pos, angle[None], vel, w[None]])
            return ts, y, planets, goal, jnp.zeros((3,), dtype)

        def _goal_resample(self, state, y, rs):
            # Reach decision on device (bitwise state => bitwise decision);
            # the new goal is COMPUTED on device from that resample's fed
            # tiling draws (zeros on non-resample steps — consumed but
            # masked out).
            from ..ops import exact
            from ..tiling import device_exact as dx

            cfg = self.config
            new_ts, new_goal = dx.find_new_goal_exact(
                cfg.tiling, self._exact_consts, state.tiling, rs, self.dtype)
            reached = exact.norm_last(state.goal_pos - y[0:2]) < cfg.goal_radius
            goal_pos = jnp.where(reached, new_goal, state.goal_pos)
            tiling = jax.tree.map(
                lambda n, o: jnp.where(reached, n, o), new_ts, state.tiling)
            return reached, goal_pos, tiling

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

    ParityEngine._exact_consts = exact_consts
    return ParityEngine(
        cfg,
        physics="adaptive",
        dtype=jnp.float64,
        auto_reset=False,
        f32_actions=True,
    )


class _DrawRecorder:
    """RandomState proxy that logs every RNG call HostTiling makes, so the
    feed builder derives the draw sequence from the bitwise HOST ORACLE
    itself instead of re-implementing its control flow."""

    def __init__(self, rng):
        self._rng = rng
        self.log = []

    def uniform(self, low=0.0, high=1.0, size=None):
        v = self._rng.uniform(low, high, size)
        self.log.append(("uniform", np.atleast_1d(np.asarray(v, np.float64))))
        return v

    def randint(self, n):
        v = self._rng.randint(n)
        self.log.append(("randint", np.asarray([v], np.float64)))
        return v

    def choice(self, n, size=None, replace=True):
        v = self._rng.choice(n, size=size, replace=replace)
        self.log.append(("choice", np.asarray(v, np.float64).reshape(-1)))
        return v


def _take(it, kind):
    k, v = next(it)
    assert k == kind, (k, kind)
    return v


def _parse_goal_draws(it):
    """find_new_goal's draws -> the fixed 6-slot feed segment:
    [u_reuse, cand(3, zero-padded), goal_angle, goal_r]."""
    u_reuse = _take(it, "uniform")
    cand = np.zeros(3)
    if u_reuse[0] >= 0.25:
        c = _take(it, "choice")
        cand[: len(c)] = c
    g_angle = _take(it, "uniform")
    g_r = _take(it, "uniform")
    return np.concatenate([u_reuse, cand, g_angle, g_r])


def _parse_goal_reset_draws(geom, log):
    """HostTiling.reset() + find_new_goal() draw log -> the fixed-layout
    tiling segment of the reset feed (matches device_exact consumption):
    u_case(2), u_cols(cols), [2P: u_diag, diag_idx], tiles(n_obj),
    angles(n_obj), r_u(n_obj), then the 6-slot goal segment."""
    it = iter(log)
    n_obj = geom.n_planets + 1
    parts = [_take(it, "uniform"), _take(it, "uniform")]  # case/flip, cols
    if geom.n_planets == 2:
        u_diag = _take(it, "uniform")
        if u_diag[0] < 0.25:
            d = _take(it, "randint")
            parts += [u_diag, d, np.zeros(n_obj)]
        else:
            tiles = _take(it, "choice")
            parts += [u_diag, np.zeros(1), tiles]
    else:
        parts += [_take(it, "choice")]
    parts += [_take(it, "uniform"), _take(it, "uniform")]  # angles, r_u
    parts += [_parse_goal_draws(it)]
    rest = list(it)
    assert not rest, f"unconsumed tiling draws: {rest}"
    return np.concatenate(parts)


class GoalEpisodeFeeder:
    """Per-episode feed generator for Goal envs: replays the HOST tiling
    oracle (tiling/host.HostTiling) on a recording RandomState and emits the
    draw-level feeds the device twin consumes.  Resample feeds are generated
    lazily at the steps where the golden goal sequence changes."""

    N_STEP_SLOTS = 6

    def __init__(self, geom, tiling_rng):
        from space_gym_tpu.tiling.host import HostTiling

        self.geom = geom
        self.rec = _DrawRecorder(tiling_rng)
        self.ht = HostTiling(geom, self.rec)

    def reset_feed_tiling(self, golden, p):
        self.rec.log.clear()
        positions = self.ht.reset()
        goal = self.ht.find_new_goal()
        # Builder-side cross-check: the host oracle must agree with the
        # recorded goldens (it is the same code that produced them).
        np.testing.assert_array_equal(positions[0], golden[p + "reset_state"][:2])
        np.testing.assert_array_equal(
            np.asarray(positions[1:]), golden[p + "reset_planets"])
        np.testing.assert_array_equal(goal, golden[p + "reset_goal"])
        from space_gym_tpu.tiling.device_exact import FREE_CAP_EXTRA

        feed = _parse_goal_reset_draws(self.geom, self.rec.log)
        self.cur_goal = np.asarray(golden[p + "reset_goal"])
        assert len(self.ht.free_tiles) <= self.geom.n_tiles + FREE_CAP_EXTRA
        return feed

    def step_feed(self, golden, p, t):
        """6-slot tiling segment for step t: real draws iff this step
        resampled the goal (golden goals[t] differs), zeros otherwise."""
        g_t = np.asarray(golden[p + "goals"][t])
        if np.array_equal(g_t, self.cur_goal):
            return np.zeros(self.N_STEP_SLOTS)
        self.rec.log.clear()
        goal = self.ht.find_new_goal()
        np.testing.assert_array_equal(goal, g_t)
        from space_gym_tpu.tiling.device_exact import FREE_CAP_EXTRA

        assert len(self.ht.free_tiles) <= self.geom.n_tiles + FREE_CAP_EXTRA
        feed = _parse_goal_draws(iter(self.rec.log))
        self.cur_goal = g_t
        return feed


def build_reset_feed(env_id, golden, ep, seed):
    """Draw-level reset feed in the ParityEngine consumption order,
    reproducing the reference's RNG call sequences (SURVEY.md §3.2) via the
    same sha512->MT19937 derivation (utils.seeding).  For Goal envs also
    returns the episode's step-feed generator (tiling stream)."""
    import space_gym_tpu
    from space_gym_tpu.envs.config import TASK_GOAL, TASK_KEPLER
    from space_gym_tpu.utils import seeding

    cfg = space_gym_tpu.get_config(env_id)
    p = f"ep{ep}_"
    rng, _ = seeding.np_random(seed + ep)
    np.random.seed(seed + 1000 * ep)  # Kepler randomize uses GLOBAL np.random (Q6)

    if cfg.task == TASK_GOAL:
        # Tiling RNG: an independent RandomState seeded with the SAME seed as
        # the env RNG (goal.py:74-77 / gym_api.seed).
        t_rng, _ = seeding.np_random(seed + ep)
        feeder = GoalEpisodeFeeder(cfg.tiling, t_rng)
        tiling_feed = feeder.reset_feed_tiling(golden, p)
        angle = rng.uniform(0, 2 * np.pi)
        n_vel = rng.standard_normal(2)
        n_w = rng.standard_normal()
        return np.concatenate([tiling_feed, [angle], n_vel, [n_w]]), feeder

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
        return np.asarray(parts + [n_vel[0], n_vel[1], n_w], float), None

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
        feed, feeder = build_reset_feed(env_id, g, ep, seed)
        assert feed.shape[0] == n_reset, (feed.shape, n_reset)
        state, obs0 = eng.reset_from_feed(jnp.asarray(feed[None]))
        y0 = np.asarray(state.y[0])
        if not np.array_equal(y0, g[p + "reset_state"]):
            mismatches.append(f"ep{ep} reset_state")
        if not np.array_equal(np.asarray(obs0[0]), g[p + "reset_obs"]):
            mismatches.append(f"ep{ep} reset_obs")
        if feeder is not None:
            # Draw-level tier: the device must have COMPUTED the layout.
            if not np.array_equal(
                np.asarray(state.planets_pos[0]), g[p + "reset_planets"]
            ):
                mismatches.append(f"ep{ep} reset_planets")
            if not np.array_equal(np.asarray(state.goal_pos[0]), g[p + "reset_goal"]):
                mismatches.append(f"ep{ep} reset_goal")

        actions = g[p + "actions"]
        goals = g[p + "goals"] if p + "goals" in g else None
        for t in range(len(actions)):
            if n_step:
                ufeed = feeder.step_feed(g, p, t)[None]
                assert ufeed.shape[1] == n_step, (ufeed.shape, n_step)
            else:
                ufeed = np.zeros((1, 0))
            act = np.asarray(actions[t])[None].astype(
                np.float64 if eng.config.continuous else np.int32
            )
            state, ts = step_fn(state, jnp.asarray(act), jnp.asarray(ufeed))
            stats["steps"] += 1
            ok_state = np.array_equal(np.asarray(state.y[0]), g[p + "post_states"][t])
            if goals is not None:
                # Post-step goal must match even through resamples — it is now
                # COMPUTED on device from the fed draws.
                ok_state = ok_state and np.array_equal(
                    np.asarray(state.goal_pos[0]), goals[t]
                )
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


def sampler_oracle(n_seeds: int = 4, n_resamples: int = 20) -> int:
    """Deep draw-level oracle for the device tiling twin, far beyond the
    golden episodes' sparse goal reaches: for each Goal config x seed, replay
    HostTiling (the declared bitwise sampler oracle) through the draw
    recorder — reset + n_resamples find_new_goal calls, exercising the
    ordered free-list append/pop/duplicate evolution — and feed the recorded
    draws through tiling/device_exact under lax.scan.  Every ship, planet and
    goal position must match BITWISE."""
    import jax
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.tiling import device_exact as dx
    from space_gym_tpu.tiling.host import HostTiling
    from space_gym_tpu.utils import seeding

    results = {}
    for env_id in GOLDEN_IDS[:3]:
        geom = space_gym_tpu.get_config(env_id).tiling
        consts = dx.make_exact_consts(geom)

        def run_device(reset_feed, goal_feeds):
            rs = ParityRand(reset_feed)
            ts, positions = dx.reset_exact(geom, consts, rs, jnp.float64)
            ts, g0 = dx.find_new_goal_exact(geom, consts, ts, rs, jnp.float64)

            def step(ts, feed):
                ts, gp = dx.find_new_goal_exact(
                    geom, consts, ts, ParityRand(feed), jnp.float64)
                return ts, gp

            ts, gs = jax.lax.scan(step, ts, goal_feeds)
            return jnp.concatenate([positions.reshape(-1), g0]), gs

        runj = jax.jit(run_device)
        bad = 0
        for seed in range(n_seeds):
            rng, _ = seeding.np_random(seed)
            rec = _DrawRecorder(rng)
            ht = HostTiling(geom, rec)
            positions = ht.reset()
            g0 = ht.find_new_goal()
            reset_feed = _parse_goal_reset_draws(geom, rec.log)
            host_goals, goal_feeds = [], []
            for _ in range(n_resamples):
                rec.log.clear()
                host_goals.append(ht.find_new_goal())
                goal_feeds.append(_parse_goal_draws(iter(rec.log)))
            assert len(ht.free_tiles) <= consts.cap
            head, gs = runj(
                jnp.asarray(reset_feed), jnp.asarray(np.stack(goal_feeds)))
            expect = np.concatenate([np.asarray(positions).reshape(-1), g0])
            bad += int(not np.array_equal(np.asarray(head), expect))
            bad += int(not np.array_equal(np.asarray(gs), np.stack(host_goals)))
        results[env_id] = bad
    ok = not any(results.values())
    print(json.dumps({"sampler_oracle": results, "resamples_per_seed": n_resamples,
                      "seeds": n_seeds, "ok": ok}))
    return 0 if ok else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default=None, help="one ID (default: all seven)")
    ap.add_argument("--subset", default=None, help="'' or 'seed7' (default: both)")
    ap.add_argument("--golden-dir", default=None)
    ap.add_argument("--sampler-oracle", action="store_true",
                    help="run the deep host-vs-device tiling sampler oracle "
                         "instead of the golden replay")
    args = ap.parse_args(argv)
    _setup()
    if args.sampler_oracle:
        return sampler_oracle()

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
