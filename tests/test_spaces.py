"""Observation/action space parity with the reference definitions
(spaceship_env.py:102-111 + Kepler quirk Q7, kepler.py:158-170)."""
import math

import numpy as np
import pytest

import space_gym_tpu


def test_goal_obs_space_bounds():
    env = space_gym_tpu.make("GoalContinuous3P-v0", physics="host")
    low, high = env.observation_space.low, env.observation_space.high
    assert env.observation_space.shape == (15,)
    # base: pos(2) cos/sin(2) vel(2) omega(1)
    np.testing.assert_allclose(high[:4], 1.0)
    assert np.isinf(high[4]) and np.isinf(high[5])
    assert high[6] == 1.0
    # lidar entries bounded by 2*sqrt(2)
    np.testing.assert_allclose(high[7:], 2 * math.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(low, -high)


def test_kepler_obs_space_quirk_q7():
    """Upstream builds obs_low then discards it: space is Box(-high, high)
    with the orbit-param bounds [2pi, 0.7, 2] appended after the base 7."""
    env = space_gym_tpu.make("KeplerEllipseEasy-v0", physics="host")
    low, high = env.observation_space.low, env.observation_space.high
    assert env.observation_space.shape == (10,)
    np.testing.assert_allclose(high[7:], [2 * math.pi, 0.7, 2.0], rtol=1e-6)
    np.testing.assert_allclose(low, -high)  # the quirk: symmetric despite obs_low


@pytest.mark.parametrize("env_id,n", [("GoalDiscrete3-v0", 6), ("KeplerDiscrete-v0", 6)])
def test_discrete_action_space(env_id, n):
    env = space_gym_tpu.make(env_id)
    assert env.action_space.n == n
    assert env.action_space.contains(0) and env.action_space.contains(n - 1)
    assert not env.action_space.contains(n)


def test_continuous_action_space():
    env = space_gym_tpu.make("GoalContinuous2P-v0")
    a = env.action_space.sample()
    assert a.shape == (2,) and a.dtype == np.float32
    assert env.action_space.contains(np.array([1.0, -1.0], np.float32))
    assert not env.action_space.contains(np.array([1.5, 0.0], np.float32))


def test_max_episode_steps_registry_parity():
    """Episode caps per registered ID (gym_space/__init__.py:8,23,29,77)."""
    expect = {
        "DoNotCrashDiscrete-v0": 300,
        "DoNotCrashContinuous-v0": 300,
        "GoalDiscrete-v0": 1000,
        "GoalContinuous2P-v0": 500,
        "GoalContinuous3P-v0": 500,
        "GoalContinuous4P-v0": 500,
        "KeplerCircleOrbit-v0": 500,
        "KeplerEllipseEasy-v0": 500,
        "KeplerEllipseHard-v0": 500,
        "KeplerRandomOrbits-v0": 500,
    }
    for env_id, cap in expect.items():
        assert space_gym_tpu.get_config(env_id).max_episode_steps == cap, env_id


def test_kepler_step_size_parity():
    """All registered Kepler IDs share step_size=0.07 (gym_space/__init__.py:76)."""
    for env_id in ["KeplerCircleOrbit-v0", "KeplerEllipseEasy-v0",
                   "KeplerEllipseHard-v0", "KeplerRandomOrbits-v0"]:
        assert space_gym_tpu.get_config(env_id).step_size == 0.07
