"""Native C++ host runtime (space_gym_tpu/parity/native): parity vs the
python/scipy-exact host path on recorded golden trajectories."""
import numpy as np
import pytest

import space_gym_tpu
from space_gym_tpu.compat.gym_api import _host_physics_step
from space_gym_tpu.parity import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason=f"native build unavailable: {native.build_error()}"
)

GOLDEN_IDS = [
    "GoalContinuous2P-v0",
    "GoalContinuous3P-v0",
    "GoalContinuous4P-v0",
    "KeplerCircleOrbit-v0",
    "KeplerEllipseEasy-v0",
]


def iter_golden_steps(env_id):
    import os

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens", f"{env_id}.npz"))
    env = space_gym_tpu.make(env_id, physics="host")
    for ep in range(int(g["episodes"])):
        p = f"ep{ep}_"
        states = np.concatenate([g[p + "reset_state"][None], g[p + "post_states"]])
        actions = g[p + "actions"]
        planets = g[p + "reset_planets"]
        for t in range(len(actions)):
            a = np.array(env._translate_raw_action(actions[t].astype(np.float32)))
            yield states[t].copy(), a, planets


@pytest.mark.parametrize("env_id", GOLDEN_IDS)
def test_native_matches_host_per_step(env_id):
    """Every golden step bit-identical to the python/scipy host path.

    (Round 1 carried a 1-ulp residue on Kepler ep1 t46; the cause was numpy
    SCALAR dist**2 = libm pow(dist, 2.0) vs the compiled dist*dist — fixed by
    std::pow + -fno-builtin-pow, see sgt_native.cpp rhs.)"""
    cfg = space_gym_tpu.get_config(env_id)
    exact = total = 0
    for y0, a, planets in iter_golden_steps(env_id):
        yh, dh = _host_physics_step(cfg, y0.copy(), a, planets)
        yn, dn = native.solve_step_native(cfg, y0, a, planets)
        assert dh == dn
        total += 1
        exact += int(np.array_equal(yh, yn))
    assert exact == total, f"{exact}/{total}"


def test_native_full_episode_bitwise_goal2p():
    """Full-episode bitwise replay through the adapter in native mode (all
    Goal golden steps are bit-identical)."""
    import os

    env_id = "GoalContinuous2P-v0"
    g = np.load(os.path.join(os.path.dirname(__file__), "goldens", f"{env_id}.npz"))
    env = space_gym_tpu.make(env_id, physics="native")
    seed = int(g["seed"])
    for ep in range(int(g["episodes"])):
        p = f"ep{ep}_"
        np.random.seed(seed + 1000 * ep)
        env.seed(seed + ep)
        obs = env.reset()
        np.testing.assert_array_equal(obs, g[p + "reset_obs"])
        actions = g[p + "actions"]
        for t in range(len(actions)):
            obs, reward, done, info = env.step(actions[t])
            np.testing.assert_array_equal(obs, g[p + "obs"][t], err_msg=f"ep{ep} t{t}")
            assert reward == g[p + "rewards"][t]
            assert done == bool(g[p + "dones"][t])


def test_native_event_semantics():
    """Crash step returns the state at event time (planet surface)."""
    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    y0 = np.array([0.3, 0.0, 0.0, -2.0, 0.0, 0.0])
    a = np.array([0.0, 0.0])
    planets = np.asarray(cfg.fixed_planet_pos, float)
    y, terminated = native.solve_step_native(cfg, y0, a, planets)
    assert terminated
    assert abs(np.linalg.norm(y[:2]) - cfg.dnc.planet_radius) < 1e-12
