"""Distribution parity: the device engine's JAX-native reset/goal sampling
must match the reference's MT19937 host sampling in distribution (the host
path is bitwise-exact; the device path is only required to induce the same
laws — SURVEY.md §7 step 5).

Two-sample Kolmogorov-Smirnov tests on physically meaningful marginals with
4096 samples per side; thresholds are loose (p > 1e-3) to keep flake
probability negligible while still catching any systematic distortion
(wrong scale, missing branch, biased tile choice).
"""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import ks_2samp

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine

N = 4096
P_MIN = 1e-3


def device_resets(env_id, n=N):
    eng = EnvEngine(space_gym_tpu.get_config(env_id), dtype=jnp.float64)
    state, obs = eng.init(jax.random.key(0), n)
    return (
        np.asarray(state.y),
        np.asarray(state.planets_pos),
        np.asarray(state.goal_pos),
        np.asarray(state.ref_orbit),
    )


def host_resets(env_id, n=N):
    env = space_gym_tpu.make(env_id, physics="host")
    env.seed(12345)
    ys, planets, goals, orbits = [], [], [], []
    for _ in range(n):
        env.reset()
        ys.append(env._state_vec.copy())
        planets.append(env.planets_pos.copy())
        goals.append(None if env.goal_pos is None else env.goal_pos.copy())
        if env.config.task == "kepler":
            orbits.append([env.ref_orbit_angle, env.ref_orbit_eccentricity, env.ref_orbit_a])
    return (
        np.array(ys),
        np.array(planets),
        np.array([g for g in goals if g is not None]) if goals[0] is not None else None,
        np.array(orbits) if orbits else None,
    )


def assert_ks(a, b, label):
    stat, p = ks_2samp(a, b)
    assert p > P_MIN, f"{label}: KS stat={stat:.4f} p={p:.2e}"


def test_goal2p_reset_distribution():
    yd, pd, gd, _ = device_resets("GoalContinuous2P-v0")
    yh, ph, gh, _ = host_resets("GoalContinuous2P-v0")
    # Ship kinematics.
    assert_ks(yd[:, 0], yh[:, 0], "ship x")
    assert_ks(yd[:, 1], yh[:, 1], "ship y")
    assert_ks(np.hypot(yd[:, 3], yd[:, 4]), np.hypot(yh[:, 3], yh[:, 4]), "speed")
    assert_ks(yd[:, 5], yh[:, 5], "angular velocity")
    # Ship angle uniform in [0, 2pi).
    assert_ks(yd[:, 2], np.random.RandomState(7).uniform(0, 2 * np.pi, N), "angle")
    # Geometry: planet-planet and ship-goal distances.
    ppd = np.linalg.norm(pd[:, 0] - pd[:, 1], axis=-1)
    pph = np.linalg.norm(ph[:, 0] - ph[:, 1], axis=-1)
    assert_ks(ppd, pph, "planet-planet distance")
    sgd = np.linalg.norm(gd - yd[:, :2], axis=-1)
    sgh = np.linalg.norm(gh - yh[:, :2], axis=-1)
    assert_ks(sgd, sgh, "ship-goal distance")
    # Planet x marginal (exercises case/flip/col-shift equivalence).
    assert_ks(pd[:, 0, 0], ph[:, 0, 0], "planet0 x")
    assert_ks(pd[:, 1, 1], ph[:, 1, 1], "planet1 y")


def test_goal3p_reset_distribution():
    yd, pd, gd, _ = device_resets("GoalContinuous3P-v0")
    yh, ph, gh, _ = host_resets("GoalContinuous3P-v0")
    for i in range(3):
        di = np.linalg.norm(pd[:, i] - yd[:, :2], axis=-1)
        hi = np.linalg.norm(ph[:, i] - yh[:, :2], axis=-1)
        assert_ks(np.sort(di), np.sort(hi), f"ship-planet{i} distance")
    assert_ks(gd[:, 0], gh[:, 0], "goal x")
    assert_ks(gd[:, 1], gh[:, 1], "goal y")


def test_kepler_randomized_reset_distribution():
    yd, _, _, od = device_resets("KeplerRandomOrbits-v0")
    yh, _, _, oh = host_resets("KeplerRandomOrbits-v0")
    rd = np.hypot(yd[:, 0], yd[:, 1])
    rh = np.hypot(yh[:, 0], yh[:, 1])
    assert_ks(rd, rh, "spawn radius")
    assert rd.min() >= 0.7 - 1e-9 and rd.max() <= 2.5 + 1e-9
    assert_ks(od[:, 1], oh[:, 1], "eccentricity")
    assert_ks(od[:, 0], oh[:, 0], "orbit angle")
    assert_ks(yd[:, 5], yh[:, 5], "angular velocity")


def test_dnc_reset_distribution():
    yd, _, _, _ = device_resets("DoNotCrashContinuous-v0")
    yh, _, _, _ = host_resets("DoNotCrashContinuous-v0")
    rd = np.hypot(yd[:, 0], yd[:, 1])
    rh = np.hypot(yh[:, 0], yh[:, 1])
    assert_ks(rd, rh, "spawn radius")
    assert rd.min() >= 0.45 - 1e-9 and rd.max() <= 0.85 + 1e-9
    assert_ks(np.hypot(yd[:, 3], yd[:, 4]), np.hypot(yh[:, 3], yh[:, 4]), "speed")


def test_goal_same_tile_probability():
    """The 25% goal-on-ship-tile branch survives in the device sampler."""
    from space_gym_tpu.tiling import device as dtiling
    from space_gym_tpu.utils.randvec import RandSource

    geom = space_gym_tpu.get_config("GoalContinuous3P-v0").tiling

    def roll(u):
        rs = RandSource(u)
        ts, ship, planets = dtiling.tiling_reset(geom, rs, jnp.float64)
        ts, goal = dtiling.find_new_goal(geom, ts, rs, jnp.float64)
        return ts.goal_tile == ts.ship_tile

    us = jax.random.uniform(jax.random.key(3), (8192, 256), jnp.float64)
    same = np.asarray(jax.vmap(roll)(us))
    assert 0.22 < same.mean() < 0.28, same.mean()
