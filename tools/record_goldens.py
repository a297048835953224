#!/usr/bin/env python
"""Record golden trajectories from the reference repo (/root/reference).

Runs each constructible registered env ID through the old-gym shim
(space_gym_tpu/parity/gym_shim) with fixed seeds and a fixed random-action
protocol, and dumps per-step (pre_state, action, post_state, obs, reward,
done, truncated, goal_pos, planets_pos) into tests/goldens/<env_id>.npz.

The parity test suite replays these through the TPU engine.  The reference's
DoNotCrash*-v0 and GoalDiscrete-v0 IDs cannot be constructed at HEAD
(SURVEY.md quirks Q12/Q14); their constructor failures are recorded in
goldens/broken_ids.json as documentation.

Usage: python tools/record_goldens.py [--episodes 3] [--seed 42]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "space_gym_tpu", "parity", "gym_shim")
REFERENCE = os.environ.get("SPACE_GYM_REFERENCE", "/root/reference")

sys.path.insert(0, SHIM)
sys.path.insert(0, REFERENCE)

CONSTRUCTIBLE = [
    "GoalContinuous2P-v0",
    "GoalContinuous3P-v0",
    "GoalContinuous4P-v0",
    "KeplerCircleOrbit-v0",
    "KeplerEllipseEasy-v0",
    "KeplerEllipseHard-v0",
    "KeplerRandomOrbits-v0",
]
BROKEN = ["DoNotCrashDiscrete-v0", "DoNotCrashContinuous-v0", "GoalDiscrete-v0"]


def record_env(env_id: str, episodes: int, seed: int) -> dict:
    import gym  # the shim
    import gym_space  # noqa: F401  (registers env IDs)

    data: dict[str, np.ndarray] = {}
    env = gym.make(env_id)
    inner = env.unwrapped
    for ep in range(episodes):
        # Global np.random drives KeplerRandomOrbits orbit resampling (quirk Q6).
        np.random.seed(seed + 1000 * ep)
        env.seed(seed + ep)
        act_rng = np.random.RandomState(seed + 10_000 + ep)
        obs = env.reset()
        pre_states, actions, post_states = [], [], []
        obss, rewards, dones, truncs = [], [], [], []
        goals, planets, orbit = [], [], []
        reset_obs = np.asarray(obs, np.float64).copy()
        reset_state = inner._ship_state._state_vec.copy()
        reset_planets = np.array([p.center_pos for p in inner.planets])
        reset_goal = (
            np.asarray(inner.goal_pos, np.float64).copy()
            if inner.goal_pos is not None
            else np.zeros(2)
        )
        done = False
        while not done:
            a = act_rng.uniform(-1.0, 1.0, 2).astype(np.float32)
            pre_states.append(inner._ship_state._state_vec.copy())
            obs, reward, done, info = env.step(a)
            actions.append(a.copy())
            post_states.append(inner._ship_state._state_vec.copy())
            obss.append(np.asarray(obs, np.float64).copy())
            rewards.append(float(reward))
            dones.append(bool(done))
            truncs.append(bool(info.get("TimeLimit.truncated", False)))
            goals.append(
                np.asarray(inner.goal_pos, np.float64).copy()
                if inner.goal_pos is not None
                else np.zeros(2)
            )
            planets.append(np.array([p.center_pos for p in inner.planets]))
            if hasattr(inner, "ref_orbit_a"):
                orbit.append(
                    [inner.ref_orbit_angle, inner.ref_orbit_eccentricity, inner.ref_orbit_a]
                )
        p = f"ep{ep}_"
        data[p + "reset_obs"] = reset_obs
        data[p + "reset_state"] = reset_state
        data[p + "reset_planets"] = reset_planets
        data[p + "reset_goal"] = reset_goal
        data[p + "pre_states"] = np.array(pre_states)
        data[p + "actions"] = np.array(actions)
        data[p + "post_states"] = np.array(post_states)
        data[p + "obs"] = np.array(obss)
        data[p + "rewards"] = np.array(rewards)
        data[p + "dones"] = np.array(dones)
        data[p + "truncated"] = np.array(truncs)
        data[p + "goals"] = np.array(goals)
        data[p + "planets"] = np.array(planets)
        if orbit:
            data[p + "orbit"] = np.array(orbit)
    data["episodes"] = np.array(episodes)
    data["seed"] = np.array(seed)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for env_id in CONSTRUCTIBLE:
        data = record_env(env_id, args.episodes, args.seed)
        path = os.path.join(args.out, f"{env_id}.npz")
        np.savez_compressed(path, **data)
        total = sum(len(data[f"ep{e}_rewards"]) for e in range(args.episodes))
        print(f"{env_id}: {args.episodes} episodes, {total} steps -> {path}")

    broken = {}
    import gym
    import gym_space  # noqa: F401

    for env_id in BROKEN:
        try:
            gym.make(env_id)
            broken[env_id] = "constructed OK (unexpected)"
        except Exception as e:  # noqa: BLE001
            broken[env_id] = f"{type(e).__name__}: {e}"
    with open(os.path.join(args.out, "broken_ids.json"), "w") as f:
        json.dump(broken, f, indent=2)
    print("broken IDs:", json.dumps(broken, indent=2))


if __name__ == "__main__":
    main()
