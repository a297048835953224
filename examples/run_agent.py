#!/usr/bin/env python
"""Replay a trained policy in a single env with rendering — the TPU build's
equivalent of the reference's notebooks/run_agent.ipynb (which loads a
spinningup PyTorch policy and replays it).

Loads a tools/train.py orbax checkpoint, runs N episodes through the old-Gym
adapter with the deterministic policy, renders frames, and writes a GIF per
episode (or shows a live window with --display).

  python examples/run_agent.py --ckpt /tmp/sac_goal2p --env GoalContinuous2P-v0 \
      --episodes 2 --out /tmp/replays
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--env", default="GoalContinuous2P-v0")
    ap.add_argument("--algo", choices=["sac", "td3", "ppo", "dqn"], default="sac")
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/spacegym_replays")
    ap.add_argument("--display", action="store_true", help="live window instead of GIFs")
    ap.add_argument("--every", type=int, default=2, help="render every k-th step")
    ap.add_argument("--no-gif", action="store_true",
                    help="skip rendering/GIF writing (protocol scoring only; "
                         "PIL rasterization dominates the 20-episode runs)")
    ap.add_argument("--obs-features", default=None, choices=["kepler", "goal", "dnc"],
                    help="must match the checkpoint's training --obs-features "
                         "(the actor's input includes the appended features)")
    args = ap.parse_args()

    import jax

    # Replay is a host workload (per-step tunnel round trips would dominate);
    # JAX_PLATFORMS=cpu pins it via the shared helper.
    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.models import (
        DQNConfig, DQNTrainer, PPOConfig, PPOTrainer, SACConfig, SACTrainer,
        TD3Config, TD3Trainer,
    )
    from space_gym_tpu.utils import checkpoint as ckpt

    eng = EnvEngine(space_gym_tpu.get_config(args.env),
                    obs_features=args.obs_features)
    # Tiny trainer shell just to materialize the parameter template.
    kw = dict(lanes=16, rollout_len=4, replay_rows=8, batch_size=32, updates_per_iter=1)
    if args.algo == "ppo":
        trainer = PPOTrainer(eng, PPOConfig(lanes=128, rollout_len=8,
                                            epochs=1, minibatches=2))
    elif args.algo == "dqn":
        trainer = DQNTrainer(eng, DQNConfig(**kw))
    else:
        trainer = (SACTrainer(eng, SACConfig(**kw)) if args.algo == "sac"
                   else TD3Trainer(eng, TD3Config(**kw)))
    pfield = "params" if args.algo in ("ppo", "dqn") else "actor_params"
    z = np.load(args.ckpt) if args.ckpt.endswith(".npz") else None
    if z is not None and "w" not in z.files:
        # Params-format npz ("p:<path>" keys, train.py save_learner_npz for
        # params-based trainers): rebuild the flax tree on the template.
        import jax.numpy as jnp

        if not any(k.startswith("p:") for k in z.files):
            raise SystemExit(f"{args.ckpt}: neither fused-kernel nor params npz")
        if "obs_dim" in z.files and int(z["obs_dim"]) != eng.obs_dim:
            raise SystemExit(
                f"npz obs_dim {int(z['obs_dim'])} != engine {eng.obs_dim}; "
                "pass the matching --obs-features")
        template = trainer.init(jax.random.key(0))
        tpl = getattr(template, pfield)
        flat = jax.tree_util.tree_flatten_with_path(tpl)
        try:
            leaves = [jnp.asarray(z["p:" + jax.tree_util.keystr(kp)])
                      for kp, _ in flat[0]]
        except KeyError as e:
            raise SystemExit(
                f"{args.ckpt}: params don't match the --algo {args.algo} "
                f"template (missing {e}); pass the algo the npz was trained "
                "with") from None
        params = jax.tree_util.tree_unflatten(flat[1], leaves)
    elif z is not None:
        # Compact learner npz (train.py <ckpt>.best.npz sidecar or a docs/
        # backup): slice the actor straight out of the fused kernel layout.
        if args.algo in ("ppo", "dqn"):
            raise SystemExit("fused npz learners are SAC/TD3 format")
        import jax.numpy as jnp

        if args.algo == "sac":
            from space_gym_tpu.models.fused_sac import unpack_actor
        else:
            from space_gym_tpu.models.fused_td3 import unpack_actor

        # Newer npzs record their training obs_dim/obs_features; a mismatch
        # with the replay engine would silently mis-slice the packed actor
        # (first-layer rows read from the wrong offsets) — fail loud instead.
        if "obs_dim" in z.files and int(z["obs_dim"]) != eng.obs_dim:
            raise SystemExit(
                f"npz was trained at obs_dim {int(z['obs_dim'])} but the "
                f"replay engine has obs_dim {eng.obs_dim} — pass the "
                "matching --obs-features (or migrate via "
                "tools/restore_learner.py)")
        if "obs_features" in z.files and (str(z["obs_features"]) or None) != args.obs_features:
            raise SystemExit(
                f"npz was trained with obs_features={str(z['obs_features']) or None!r}; "
                f"pass the same --obs-features (got {args.obs_features!r})")
        params = unpack_actor(
            jnp.asarray(z["w"]), jnp.asarray(z["vec"]), eng.obs_dim, 2)
    else:
        template = trainer.init(jax.random.key(0))
        try:
            state = ckpt.restore(args.ckpt, template)
        except Exception:
            # Checkpoints written with different lanes/replay shapes: restore
            # only the actor parameters (everything the replay needs).
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as c:
                raw = c.restore(os.path.abspath(args.ckpt), None)
            state = template._replace(**{pfield: jax.tree.map(
                lambda x: x, raw[pfield])})
        params = getattr(state, pfield)

    env = space_gym_tpu.make(args.env)
    env.seed(args.seed)
    os.makedirs(args.out, exist_ok=True)
    returns = []
    for ep in range(args.episodes):
        obs = env.reset()
        frames = []
        total, done, t = 0.0, False, 0
        while not done:
            ob = np.asarray(obs, np.float32)[None]
            if args.obs_features:
                ob = np.asarray(eng._augment_obs(ob))
            a = np.asarray(trainer.eval_act(params, ob))[0]
            act = int(a) if args.algo == "dqn" else a.astype(np.float32)
            obs, r, done, _ = env.step(act)
            total += r
            if args.display:
                env.render()
            elif not args.no_gif and t % args.every == 0:
                frames.append(env.render(mode="rgb_array"))
            t += 1
        returns.append(total)
        print(f"episode {ep}: return {total:.1f} steps {t}")
        if frames:
            from PIL import Image

            path = os.path.join(args.out, f"{args.env}_ep{ep}.gif")
            imgs = [Image.fromarray(f) for f in frames]
            imgs[0].save(path, save_all=True, append_images=imgs[1:],
                         duration=50, loop=0)
            print(f"  wrote {path} ({len(frames)} frames)")
    print(f"mean return: {np.mean(returns):.1f} +- {np.std(returns):.1f}")


if __name__ == "__main__":
    main()
