#!/usr/bin/env python
"""Human-baseline keyboard agent — the TPU build's twin of the reference's
keyboard_agent.py (pyglet key handlers, 5-episode mean/std printout,
keyboard_agent.py:123-174; this is the protocol that produced the README human
baselines, reference README.md:34,66,71).

Keys (matplotlib window): SPACE = main engine (discrete action 1),
LEFT = thruster -1 (action 2), RIGHT = thruster +1 (action 3), no key = noop.
The discrete env variants the reference registers inside its keyboard agent
(GoalDiscrete{2,3,4}-v0, KeplerDiscrete-v0) are part of the standard registry
here (space_gym_tpu/registry.py).

Headless (no display / CI): `--policy random` rolls episodes without a window
and still prints the episode-return statistics.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

pin_cpu_if_requested()

import space_gym_tpu


class KeyState:
    """Key-press state + discrete-action mapping of the interactive agent —
    module-level (not closed over a figure) so the interactive path is
    testable headlessly (tests/test_aux.py::test_keyboard_agent_key_mapping).
    Same priority as the reference handler (keyboard_agent.py:88-115):
    one discrete action at a time; engine wins, then thruster direction."""

    def __init__(self):
        self.pressed = {"engine": False, "left": False, "right": False}

    def on_key(self, event, down: bool):
        if event.key == " ":
            self.pressed["engine"] = down
        elif event.key == "left":
            self.pressed["left"] = down
        elif event.key == "right":
            self.pressed["right"] = down

    def current_action(self) -> int:
        if self.pressed["engine"]:
            return 1
        if self.pressed["left"]:
            return 2
        if self.pressed["right"]:
            return 3
        return 0


def rollout_human(env, episodes: int, fps: float, max_steps: int | None = None,
                  keys: "KeyState | None" = None):
    import matplotlib

    if (matplotlib.get_backend().lower() == "agg"
            and not os.environ.get("SGT_FORCE_HUMAN")):
        raise SystemExit(
            "No display backend available — use `--policy random` headlessly."
        )

    keys = keys if keys is not None else KeyState()
    on_key = keys.on_key
    current_action = keys.current_action

    returns = []
    for ep in range(episodes):
        obs = env.reset()
        env.render()
        fig = env._renderer._fig
        fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
        fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))
        total, done, t = 0.0, False, 0
        while not done and (max_steps is None or t < max_steps):
            obs, reward, done, _ = env.step(current_action())
            total += reward
            t += 1
            env.render()
            time.sleep(1.0 / fps)
        print(f"episode {ep}: return {total:.1f}")
        returns.append(total)
    return returns


def rollout_random(env, episodes: int, seed: int):
    rng = np.random.RandomState(seed)
    returns = []
    for ep in range(episodes):
        env.reset()
        total, done = 0.0, False
        while not done:
            _, reward, done, _ = env.step(int(rng.randint(env.action_space.n)))
            total += reward
        print(f"episode {ep}: return {total:.1f}")
        returns.append(total)
    return returns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="GoalDiscrete3-v0")
    ap.add_argument("--episodes", type=int, default=5)  # keyboard_agent.py:8,167
    ap.add_argument("--fps", type=float, default=10.0)  # sleep(0.1), :164
    ap.add_argument("--policy", choices=["keyboard", "random"], default="keyboard")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    env = space_gym_tpu.make(args.env)
    env.seed(args.seed)
    if args.policy == "keyboard":
        returns = rollout_human(env, args.episodes, args.fps)
    else:
        returns = rollout_random(env, args.episodes, args.seed)
    env.close()
    # Mean/std printout = the human-baseline protocol (keyboard_agent.py:172-174).
    print(f"mean: {np.mean(returns):.1f}  std: {np.std(returns):.1f}")


if __name__ == "__main__":
    main()
