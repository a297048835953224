"""Golden-trajectory parity vs the reference (recorded by tools/record_goldens.py).

Three tiers:

* host physics ("host"): full-episode replay must match the reference
  BITWISE — identical obs, reward, done, truncation, and internal state at
  every step.  This is the north-star metric of BASELINE.json.
* device physics ("jax"): single-step replay from each golden pre-step state
  must match within 1e-10 in the DEFAULT build (XLA fuses mul+add into FMAs
  and strength-reduces constant divisions; both are 1-ulp-per-op effects).
* device engine, parity mode: full-episode FREE-RUNNING replay through the
  vectorized EnvEngine (f64 adaptive physics) must match the reference
  BITWISE at every step — obs, reward, done/truncated AND state — for all
  7 IDs x both seed sets.  Runs in a subprocess because parity mode is
  process-global (XLA_FLAGS=--xla_disable_hlo_passes=fusion,algsimp +
  SGT_EXACT_MATH=1); see space_gym_tpu/parity/device_replay.py.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import space_gym_tpu

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
# Two independently recorded sets: seed 42 x 3 episodes (top level) and
# seed 7 x 2 episodes (seed7/), so parity isn't an artifact of one seed.
GOLDEN_SETS = ["", "seed7"]
GOLDEN_CASES = [(s, i) for s in GOLDEN_SETS for i in GOLDEN_IDS]


def load(env_id, subset=""):
    return np.load(os.path.join(GOLDEN_DIR, subset, f"{env_id}.npz"))


@pytest.mark.parametrize("subset,env_id", GOLDEN_CASES)
def test_full_episode_bitwise_host_physics(subset, env_id):
    g = load(env_id, subset)
    episodes = int(g["episodes"])
    seed = int(g["seed"])
    env = space_gym_tpu.make(env_id, physics="host")
    for ep in range(episodes):
        p = f"ep{ep}_"
        np.random.seed(seed + 1000 * ep)
        env.seed(seed + ep)
        obs = env.reset()
        np.testing.assert_array_equal(obs, g[p + "reset_obs"], err_msg=f"{env_id} ep{ep} reset obs")
        np.testing.assert_array_equal(env._state_vec, g[p + "reset_state"])
        np.testing.assert_array_equal(env.planets_pos, g[p + "reset_planets"])
        if env.goal_pos is not None:
            np.testing.assert_array_equal(env.goal_pos, g[p + "reset_goal"])
        actions = g[p + "actions"]
        for t in range(len(actions)):
            obs, reward, done, info = env.step(actions[t])
            msg = f"{env_id} ep{ep} step {t}"
            np.testing.assert_array_equal(env._state_vec, g[p + "post_states"][t], err_msg=msg)
            np.testing.assert_array_equal(obs, g[p + "obs"][t], err_msg=msg)
            assert reward == g[p + "rewards"][t], f"{msg}: {reward} != {g[p + 'rewards'][t]}"
            assert done == bool(g[p + "dones"][t]), msg
            assert info.get("TimeLimit.truncated", False) == bool(g[p + "truncated"][t]), msg
        assert done


@pytest.mark.parametrize("env_id", GOLDEN_IDS)
def test_single_step_device_physics(env_id):
    g = load(env_id)
    seed = int(g["seed"])
    env = space_gym_tpu.make(env_id, physics="jax")
    ep = 0
    p = f"ep{ep}_"
    np.random.seed(seed)
    env.seed(seed)
    env.reset()  # establishes tiling state for goal resampling paths

    env.planets_pos = g[p + "reset_planets"]
    if env.config.kepler is not None and p + "orbit" in g:
        env.ref_orbit_angle = g[p + "orbit"][0][0]
        env.ref_orbit_eccentricity = g[p + "orbit"][0][1]
        env.ref_orbit_a = g[p + "orbit"][0][2]

    actions = g[p + "actions"]
    n = len(actions)
    max_state = 0.0
    for t in range(n):
        goal_used = g[p + "reset_goal"] if t == 0 else g[p + "goals"][t - 1]
        env._state_vec = g[p + "pre_states"][t].copy()
        env.goal_pos = goal_used.copy()
        env._elapsed_steps = 0
        obs, reward, done, info = env.step(actions[t])
        msg = f"{env_id} step {t}"
        env_done_golden = bool(g[p + "dones"][t]) and not bool(g[p + "truncated"][t])
        assert done == env_done_golden, msg
        np.testing.assert_allclose(
            env._state_vec, g[p + "post_states"][t], rtol=0, atol=1e-10, err_msg=msg
        )
        np.testing.assert_allclose(obs, g[p + "obs"][t], rtol=0, atol=1e-9, err_msg=msg)
        np.testing.assert_allclose(reward, g[p + "rewards"][t], rtol=1e-7, atol=1e-7, err_msg=msg)
        max_state = max(max_state, np.max(np.abs(env._state_vec - g[p + "post_states"][t])))
    # representative tightness: device physics stays in the 1e-12 range per step
    assert max_state < 1e-10


def test_device_tiling_sampler_oracle():
    """Draw-level tiling parity beyond the goldens' sparse goal reaches: the
    sequential-exact device sampler twin (tiling/device_exact.py) must
    reproduce the HOST oracle (tiling/host.py, itself reference-bitwise)
    bit-for-bit over reset + 20 consecutive goal resamples per Goal config —
    deep ordered-free-list evolution (appends, duplicates, pops) included."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_disable_hlo_passes=fusion,algsimp"
    )
    env["SGT_EXACT_MATH"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sgt_jax_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "space_gym_tpu.parity.device_replay",
         "--sampler-oracle"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    out = json.loads(proc.stdout.splitlines()[-1])
    assert out["ok"], out


def test_full_episode_bitwise_device_engine():
    """Device tier (the strong form of SURVEY.md §7 step 5): the vectorized
    engine replays every recorded episode bit-for-bit — semantic MT19937
    draws fed through the engine's RandSource slots, f64 adaptive RK45 with
    event root-finding, on-device obs/reward/resample/TimeLimit."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_disable_hlo_passes=fusion,algsimp"
    )
    env["SGT_EXACT_MATH"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sgt_jax_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "space_gym_tpu.parity.device_replay"],
        capture_output=True, text=True, timeout=1500, cwd=repo, env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == len(GOLDEN_CASES)
    total = sum(l["steps"] for l in lines)
    assert total > 2500
    for l in lines:
        assert l["bitwise"], l
