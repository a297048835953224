"""Direct reward-function parity: engine (jnp) vs adapter (numpy, bitwise
host path) from IDENTICAL injected states and actions.  The golden tests
cover the adapter end-to-end; this isolates the engine's reward math."""
import numpy as np
import jax
import jax.numpy as jnp

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.engine.core import EnvState
from space_gym_tpu.tiling import device as dtiling
from space_gym_tpu.utils.randvec import RandSource


def engine_state_from_adapter(env, cfg, dtype=jnp.float64):
    if cfg.task == "goal":
        nt = cfg.tiling.n_tiles
        tiling = dtiling.TilingState(
            free=jnp.ones((nt,), jnp.int32),
            ship_tile=jnp.asarray(0, jnp.int32),
            goal_tile=jnp.asarray(1, jnp.int32),
            case_b=jnp.asarray(False),
            flip_xy=jnp.asarray(False),
            col_shift=jnp.zeros((cfg.tiling.cols,), dtype),
        )
        goal = jnp.asarray(env.goal_pos, dtype)
        ref = jnp.zeros((3,), dtype)
    else:
        tiling = None
        goal = jnp.zeros((2,), dtype)
        ref = jnp.asarray(
            [env.ref_orbit_angle, env.ref_orbit_eccentricity, env.ref_orbit_a], dtype
        )
    return EnvState(
        y=jnp.asarray(env._state_vec, dtype),
        planets_pos=jnp.asarray(env.planets_pos, dtype),
        goal_pos=goal,
        ref_orbit=ref,
        tiling=tiling,
        steps=jnp.asarray(0, jnp.int32),
    )


def test_goal_reward_matches_adapter():
    env = space_gym_tpu.make("GoalContinuous3P-v0", physics="host")
    env.seed(21)
    env.reset()
    cfg = env.config
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float64)
    rng = np.random.RandomState(0)
    checked = 0
    for t in range(50):
        st = engine_state_from_adapter(env, cfg)
        a_raw = rng.uniform(-1, 1, 2).astype(np.float32)
        y_before = env._state_vec.copy()
        obs, r_host, done, _ = env.step(a_raw)
        # Engine reward from the identical pre/post state pair.
        action = eng._translate_action(jnp.asarray(a_raw))
        rs = RandSource(jnp.linspace(0.01, 0.99, 64))
        r_eng, goal_pos, tiling = eng._reward(
            st, jnp.asarray(env._state_vec), jnp.asarray(y_before[:2]), action, rs
        )
        reached = float(np.linalg.norm(env.goal_pos - env._state_vec[:2]))
        if reached < cfg.goal_radius:
            continue  # goal moved mid-step: sparse + resample use different RNG
        np.testing.assert_allclose(float(r_eng), r_host, rtol=1e-9, err_msg=f"t={t}")
        checked += 1
        if done:
            env.reset()
    assert checked >= 40


def test_kepler_reward_matches_adapter():
    env = space_gym_tpu.make("KeplerEllipseHard-v0", physics="host")
    env.seed(3)
    env.reset()
    cfg = env.config
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float64)
    rng = np.random.RandomState(1)
    for t in range(50):
        a_raw = rng.uniform(-1, 1, 2).astype(np.float32)
        y_before = env._state_vec.copy()
        obs, r_host, done, _ = env.step(a_raw)
        st = engine_state_from_adapter(env, cfg)
        action = eng._translate_action(jnp.asarray(a_raw))
        rs = RandSource(jnp.linspace(0.01, 0.99, 8))
        r_eng, _, _ = eng._reward(
            st, jnp.asarray(env._state_vec), jnp.asarray(y_before[:2]), action, rs
        )
        # engine action is f64 (native mode); host computes the act-penalty
        # norm in f32 — tolerance covers that deliberate difference.
        np.testing.assert_allclose(float(r_eng), r_host, rtol=1e-5, err_msg=f"t={t}")
        if done:
            env.reset()


def test_dnc_reward_constant():
    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    eng = EnvEngine(cfg, physics="fixed")
    state, obs = eng.init(jax.random.key(0), 16)
    state, ts = eng.step(state, jnp.zeros((16, 2)), jax.random.key(1))
    np.testing.assert_allclose(np.asarray(ts.reward), 100.0 / 300.0, rtol=1e-6)
