"""Vectorized engine tests: physics accuracy vs the parity path, event
semantics, auto-reset, goal resampling, tiling geometry invariants."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.engine.core import DISCRETE_ACTIONS
from space_gym_tpu.tiling import device as dtiling
from space_gym_tpu.utils.randvec import RandSource


def rand_sources(key, batch, n=512, dtype=jnp.float64):
    return jax.random.uniform(key, (batch, n), dtype=dtype)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDEN_IDS = [
    "GoalContinuous2P-v0",
    "GoalContinuous3P-v0",
    "GoalContinuous4P-v0",
    "KeplerCircleOrbit-v0",
    "KeplerEllipseEasy-v0",
    "KeplerEllipseHard-v0",
    "KeplerRandomOrbits-v0",
]


def golden(env_id, subset=""):
    return np.load(os.path.join(GOLDEN_DIR, subset, f"{env_id}.npz"))


_ENGINE_CACHE = {}


def _golden_engine(env_id, physics):
    """One engine (=> one jit cache) per (env_id, physics) across the whole
    parametrized matrix — a fresh engine per test would recompile 28 times."""
    key = (env_id, physics)
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = EnvEngine(
            space_gym_tpu.get_config(env_id), physics=physics,
            dtype=jnp.float64, substeps=4, f32_actions=True,
        )
        eng = _ENGINE_CACHE[key]
        eng._jit_translate = jax.jit(eng._translate_action)
        eng._jit_phys = jax.jit(eng._physics)
    return _ENGINE_CACHE[key]


@pytest.mark.parametrize("subset", ["", "seed7"])
@pytest.mark.parametrize("env_id", GOLDEN_IDS)
@pytest.mark.parametrize("physics", ["fixed", "adaptive"])
def test_single_step_physics_vs_golden(env_id, physics, subset):
    """Replay golden steps through the engine's physics from the golden
    pre-step state (all 7 constructible IDs x both seed sets); the post state
    must match the reference trajectory.

    Tolerances: "adaptive" is the scipy-twin (1e-10 in the default build;
    bitwise in parity mode — see test_golden_parity's device tier); "fixed"
    is a different (tighter-tolerance) integrator, compared against the true
    dynamics rather than scipy's rtol=1e-3 solution, so reference-vs-fixed
    differ by scipy's own local error — atol 2e-4 on these trajectories.
    """
    g = golden(env_id, subset)
    eng = _golden_engine(env_id, physics)
    translate = eng._jit_translate
    phys = eng._jit_phys

    atol = 1e-10 if physics == "adaptive" else 2e-4
    checked = 0
    for ep in range(int(g["episodes"])):
        p = f"ep{ep}_"
        states = np.concatenate([g[p + "reset_state"][None], g[p + "post_states"]])
        actions = g[p + "actions"]
        planets = jnp.asarray(g[p + "reset_planets"], jnp.float64)
        for t in range(min(len(actions), 40)):
            a = translate(jnp.asarray(actions[t]))
            y, term = phys(jnp.asarray(states[t], jnp.float64), a, planets)
            ref = states[t + 1]
            np.testing.assert_allclose(
                np.asarray(y), ref, atol=atol, rtol=0,
                err_msg=f"{env_id} {physics} ep{ep} t={t}",
            )
            checked += 1
    assert checked > 0


def test_fixed_event_state_at_event_time():
    """A lane that crashes must come back with the state AT the event time
    (SURVEY.md Q8): the returned position sits on the planet surface."""
    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    # Aim straight at the planet from close range, fast.
    y0 = jnp.asarray([0.3, 0.0, 0.0, -2.0, 0.0, 0.0], jnp.float64)
    action = jnp.asarray([0.0, 0.0], jnp.float64)
    planets = jnp.asarray(cfg.fixed_planet_pos, jnp.float64)
    # Default refinement (12 bisections): event position within |v|*h/2^12.
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float64, substeps=2)
    y, term = jax.jit(eng._physics)(y0, action, planets)
    assert bool(term)
    assert abs(float(jnp.linalg.norm(y[:2])) - cfg.dnc.planet_radius) < 2e-5
    # Deep refinement (20 bisections): sub-1e-6 event placement.
    eng20 = EnvEngine(cfg, physics="fixed", dtype=jnp.float64, substeps=2, refine_iters=20)
    y, term = jax.jit(eng20._physics)(y0, action, planets)
    assert bool(term)
    assert abs(float(jnp.linalg.norm(y[:2])) - cfg.dnc.planet_radius) < 1e-6


def test_illinois_refine8_accuracy_on_crash_sweep():
    """The bench's reduced refine_iters=8 keeps crash-lane event-time states
    within the golden tier: safeguarded Illinois false position (ops/
    fixed_rk._refine_scalar, same iterate law as the Pallas joint
    refinement) converges far faster than the bisection it replaced.
    Randomized crash-heavy batch, fixed path, refine=8 vs a 24-iteration
    converged oracle: dones exact, terminated-lane state within 2e-4."""
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    B = 256
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(11), 5)
    lim = cfg.world_size / 2 * 0.95
    y0 = jnp.concatenate(
        [
            jax.random.uniform(k1, (B, 2), jnp.float64, minval=-lim, maxval=lim),
            jax.random.uniform(k2, (B, 1), jnp.float64, minval=0, maxval=6.28),
            jax.random.normal(k3, (B, 2), jnp.float64) * 1.2,
            jax.random.normal(k4, (B, 1), jnp.float64) * 3.0,
        ],
        axis=1,
    )
    pp = jax.random.uniform(
        k5, (cfg.n_planets, 2), jnp.float64, minval=-lim * 0.6, maxval=lim * 0.6
    )
    planets = jnp.tile(pp[None], (B, 1, 1))
    action = jax.random.uniform(k5, (B, 2), jnp.float64, minval=-1, maxval=1)

    def run(refine):
        eng = EnvEngine(
            cfg, physics="fixed", dtype=jnp.float64, substeps=2,
            refine_iters=refine,
        )
        return jax.jit(jax.vmap(eng._physics))(y0, action, planets)

    y_o, t_o = run(24)
    y_8, t_8 = run(8)
    t_o, t_8 = np.asarray(t_o), np.asarray(t_8)
    assert (t_o == t_8).all()
    assert t_o.sum() >= 5, "sweep must actually produce crashes"
    term_err = np.abs(np.asarray(y_8)[t_o] - np.asarray(y_o)[t_o]).max()
    assert term_err < 2e-4, term_err
    # Live lanes are untouched by refinement.
    np.testing.assert_array_equal(
        np.asarray(y_8)[~t_o], np.asarray(y_o)[~t_o]
    )


def test_fixed_vs_adaptive_termination_agreement():
    """Random rollouts: fixed and adaptive integrators agree on state evolution
    and termination for the overwhelming majority of steps."""
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    fast = EnvEngine(cfg, physics="fixed", dtype=jnp.float64, substeps=2)
    slow = EnvEngine(cfg, physics="adaptive", dtype=jnp.float64)

    key = jax.random.key(3)
    state, obs = fast.init(key, 32)
    phys_f = jax.jit(jax.vmap(fast._physics))
    phys_a = jax.jit(jax.vmap(slow._physics))
    k = jax.random.key(4)
    ys = state.y
    mismatches = 0
    for _ in range(20):
        k, ka = jax.random.split(k)
        acts = jax.random.uniform(ka, (32, 2), jnp.float64, minval=-1, maxval=1)
        acts = jax.vmap(fast._translate_action)(acts)
        yf, tf = phys_f(ys, acts, state.planets_pos)
        ya, ta = phys_a(ys, acts, state.planets_pos)
        agree = np.asarray(tf) == np.asarray(ta)
        mismatches += int((~agree).sum())
        both_alive = np.asarray(~tf & ~ta)
        if both_alive.any():
            np.testing.assert_allclose(
                np.asarray(yf)[both_alive], np.asarray(ya)[both_alive], atol=1e-5, rtol=0
            )
        ys = jnp.where(tf[:, None] | ta[:, None], state.y, yf)  # restart dead lanes
    assert mismatches <= 1  # borderline events may differ by integrator


def test_auto_reset_and_truncation():
    import dataclasses

    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    # Tiny episode cap to exercise truncation quickly.
    cfg = dataclasses.replace(cfg, max_episode_steps=5)
    eng = EnvEngine(cfg, physics="fixed")
    state, obs = eng.init(jax.random.key(0), 8)
    zeros = jnp.zeros((8, 2))
    for t in range(5):
        state, ts = eng.step(state, zeros, jax.random.key(100 + t))
    # Every lane either terminated earlier or truncated at step 5; afterwards
    # steps counters restart from 0.
    assert bool(ts.done.all())  # all lanes done by the 5-step cap
    assert int(state.steps.max()) <= 5
    done_lanes = np.asarray(ts.done)
    # Auto-reset: done lanes have steps == 0 and a fresh obs == observe(state)
    assert (np.asarray(state.steps)[done_lanes] == 0).all()
    np.testing.assert_allclose(
        np.asarray(ts.obs), np.asarray(jax.vmap(eng._observe)(state)), rtol=1e-6
    )


def test_goal_resample_on_reach():
    """Force the ship onto the goal; the sparse bonus fires and the goal moves."""
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float64)
    state, obs = eng.init(jax.random.key(5), 4)
    # Teleport each ship onto its goal with zero velocity.
    y = state.y.at[:, 0:2].set(state.goal_pos).at[:, 3:].set(0.0)
    state = state._replace(y=y)
    old_goals = np.asarray(state.goal_pos)
    state2, ts = eng.step(state, jnp.zeros((4, 2), jnp.float64), jax.random.key(6))
    reward = np.asarray(ts.reward)
    moved = (np.asarray(state2.goal_pos) != old_goals).any(axis=-1)
    # Ships start stationary on the goal => still within goal radius after one
    # 0.07 s drift step (velocity ~ gravity * dt, displacement << goal radius).
    assert moved.all()
    assert (reward > cfg.goal.goal_sparse_reward / 2).all()
    # Reference obs ordering (spaceship_env.py:76-77): the step's observation
    # is built BEFORE _reward resamples the goal, so its goal-lidar still
    # points at the REACHED goal — near-zero magnitude, since the ship is
    # effectively on it (only a 0.07 s gravity drift away).
    base = 7 + 2 * cfg.n_planets
    goal_lidar = np.asarray(ts.final_obs[:, base:base + 2])
    assert (np.linalg.norm(goal_lidar, axis=-1) < 2 * cfg.goal_radius).all()
    # The NEXT step's obs (carried in ts.obs for non-done lanes) also uses the
    # pre-resample goal, matching the reference's end-of-step construction.
    np.testing.assert_array_equal(np.asarray(ts.obs), np.asarray(ts.final_obs))


def test_device_tiling_geometry():
    """Sampled layouts obey the reference invariants: all objects inside the
    world, ship/planets in distinct tiles => pairwise planet separation at
    least 2*(hex_height/2 - planets_radius) apart tile centres minus noise."""
    cfg = space_gym_tpu.get_config("GoalContinuous3P-v0")
    geom = cfg.tiling
    us = rand_sources(jax.random.key(7), 256)
    ts, ship, planets = jax.vmap(
        lambda u: dtiling.tiling_reset(geom, RandSource(u), jnp.float64)
    )(us)
    ship = np.asarray(ship)
    planets = np.asarray(planets)
    half = geom.world_size / 2
    assert (np.abs(planets) <= half + 1e-9).all()
    assert (np.abs(ship) <= half + 1e-9).all()
    # Planets never overlap: centres of distinct hex tiles are >= hex_height
    # apart and disk noise keeps each disc inside its tile.
    for i in range(geom.n_planets):
        for j in range(i + 1, geom.n_planets):
            d = np.linalg.norm(planets[:, i] - planets[:, j], axis=-1)
            assert (d >= 2 * geom.planets_radius - 1e-9).all()
    # Ship spawns outside every planet.
    for i in range(geom.n_planets):
        d = np.linalg.norm(ship - planets[:, i], axis=-1)
        assert (d >= geom.planets_radius).all()


def test_device_goal_candidates_respect_free_tiles():
    """Goal resampling never lands on an occupied (planet/old-goal) tile,
    except for the sanctioned 25% ship-tile case."""
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    geom = cfg.tiling

    def roll(u):
        rs = RandSource(u)
        ts, ship, planets = dtiling.tiling_reset(geom, rs, jnp.float64)
        ts, g1 = dtiling.find_new_goal(geom, ts, rs, jnp.float64)
        first_goal_tile = ts.goal_tile
        ship_tile = ts.ship_tile
        ts, g2 = dtiling.find_new_goal(geom, ts, rs, jnp.float64)
        return first_goal_tile, ship_tile, ts.goal_tile, ts.ship_tile

    us = rand_sources(jax.random.key(11), 512)
    g1, s1, g2, s2 = jax.vmap(roll)(us)
    g1, s1, g2, s2 = map(np.asarray, (g1, s1, g2, s2))
    assert (g1 >= 0).all() and (g2 >= 0).all()
    # After the second placement the ship sits in the first goal's tile.
    assert (s2 == g1).all()
    # Some goals share the ship tile (25% branch), most do not.
    frac_same = (g1 == s1).mean()
    assert 0.1 < frac_same < 0.45


def test_discrete_action_table_matches_reference():
    """Action table spot-check against spaceship_env.py:189-202."""
    assert DISCRETE_ACTIONS[0] == (0.0, 0.0)
    assert DISCRETE_ACTIONS[1] == (1.0, 0.0)
    assert DISCRETE_ACTIONS[4] == (1.0, -1.0)
    assert DISCRETE_ACTIONS[5] == (1.0, 1.0)


@pytest.mark.parametrize("env_id", ["GoalContinuous2P-v0", "KeplerRandomOrbits-v0"])
def test_engine_obs_matches_host_adapter(env_id):
    """From an identical physical state, engine obs == host adapter obs."""
    env = space_gym_tpu.make(env_id, physics="host")
    env.seed(0)
    env.reset()
    cfg = env.config
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float64)

    from space_gym_tpu.engine.core import EnvState

    if cfg.task == "goal":
        nt = cfg.tiling.n_tiles
        tiling = dtiling.TilingState(
            free=jnp.ones((nt,), jnp.int32),
            ship_tile=jnp.asarray(0, jnp.int32),
            goal_tile=jnp.asarray(1, jnp.int32),
            case_b=jnp.asarray(False),
            flip_xy=jnp.asarray(False),
            col_shift=jnp.zeros((cfg.tiling.cols,), jnp.float64),
        )
        goal = jnp.asarray(env.goal_pos, jnp.float64)
        ref = jnp.zeros((3,), jnp.float64)
    else:
        tiling = None
        goal = jnp.zeros((2,), jnp.float64)
        ref = jnp.asarray(
            [env.ref_orbit_angle, env.ref_orbit_eccentricity, env.ref_orbit_a],
            jnp.float64,
        )
    st = EnvState(
        y=jnp.asarray(env._state_vec, jnp.float64),
        planets_pos=jnp.asarray(env.planets_pos, jnp.float64),
        goal_pos=goal,
        ref_orbit=ref,
        tiling=tiling,
        steps=jnp.asarray(0, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(eng._observe(st)), env.observation, rtol=0, atol=1e-12
    )
