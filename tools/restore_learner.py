#!/usr/bin/env python
"""Rebuild a resumable orbax checkpoint from a compact learner-state npz
(docs/kepler_sac_learner_r2c.npz — see that commit message).

The npz holds the fused kernel-layout learner (FusedState fields + log_alpha
+ step); env state and the replay ring are reinitialized — off-policy SAC
refills the ring within a few rollouts, so training continues with only a
brief dip instead of losing the ~1.4B-step learner to a /tmp wipe.

Usage (matches the Kepler runbook hyperparameters in NEXT.md):
  python tools/restore_learner.py --npz docs/kepler_sac_learner_r2c.npz \
      --env KeplerCircleOrbit-v0 --out /tmp/sac_kepler_r2c \
      --lanes 2048 --rollout-len 8 --updates-per-iter 32 --batch-size 8192 \
      --replay-rows 2048
then: tools/train.py ... --ckpt /tmp/sac_kepler_r2c --resume --fused
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--env", default="KeplerCircleOrbit-v0")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir to write")
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--rollout-len", type=int, default=8)
    ap.add_argument("--updates-per-iter", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--replay-rows", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import jax.numpy as jnp
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.models import SACConfig, SACTrainer
    from space_gym_tpu.models.fused_sac import FusedState, unpack_actor
    from space_gym_tpu.utils import checkpoint as ckpt

    eng = EnvEngine(space_gym_tpu.get_config(args.env),
                    physics="pallas" if jax.default_backend() == "tpu" else "fixed")
    tr = SACTrainer(eng, SACConfig(
        lanes=args.lanes, rollout_len=args.rollout_len,
        updates_per_iter=args.updates_per_iter, batch_size=args.batch_size,
        replay_rows=args.replay_rows, fused_updates=True,
        fused_block=min(2048, args.batch_size)))
    state = tr.init(jax.random.key(args.seed))

    z = np.load(args.npz)
    fused = FusedState(**{f: jnp.asarray(z[f]) for f in FusedState._fields})
    state = state._replace(
        fused=fused,
        actor_params=unpack_actor(fused.w, fused.vec, tr.obs_dim, tr.action_dim),
        log_alpha=jnp.asarray(z["log_alpha"]),
        step=jnp.asarray(z["step"], jnp.int32),
    )
    ckpt.save(args.out, state)
    print(f"wrote {args.out}: step {int(z['step'])}, "
          f"fused count {int(z['count'])} (replay/env state fresh)")


if __name__ == "__main__":
    main()
