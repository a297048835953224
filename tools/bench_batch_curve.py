#!/usr/bin/env python
"""Single-chip batch-scaling curve: env-steps/s vs batch size (BASELINE.md
scaling axis, single-device leg).  Shows where one chip saturates — below
the knee the fixed per-launch cost dominates, above it the kernel is
compute-bound and steps/s flattens.

Reuses bench.py's build/measure machinery (same fused full-step kernel, same
device->host sync discipline) and prints one JSON line per batch size.

Usage (TPU):  python tools/bench_batch_curve.py
       (CPU): python tools/bench_batch_curve.py --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="GoalContinuous2P-v0")
    ap.add_argument("--batches", default="4096,8192,16384,32768,65536,131072")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--tableau", default="dp5", choices=["dp5", "bs3"])
    ap.add_argument("--refine", type=int, default=12,
                    help="event-refinement iterations (bench.py headline uses 8)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.batches, args.steps, args.repeats = "256,512", 32, 1

    import jax

    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import jax.numpy as jnp
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine

    backend = jax.default_backend()
    eng = EnvEngine(
        space_gym_tpu.get_config(args.env),
        physics="pallas" if backend == "tpu" else "fixed",
        substeps=args.substeps,
        pallas_tableau=args.tableau,
        refine_iters=args.refine,
    )
    base = None
    for batch in [int(b) for b in args.batches.split(",")]:
        pol = eng.random_policy()

        @jax.jit
        def run(state, obs, key, _b=batch):
            state, obs, traj = eng.rollout(state, obs, key, pol, args.steps)
            return state, obs, traj.reward.sum()

        state, obs = eng.init(jax.random.key(0), batch)
        state, obs, r = run(state, obs, jax.random.key(1))
        np.asarray(r)  # sync (tunnel gotcha: block_until_ready returns early)
        best = 0.0
        for i in range(args.repeats):
            t0 = time.perf_counter()
            state, obs, r = run(state, obs, jax.random.key(2 + i))
            np.asarray(r)
            best = max(best, batch * args.steps / (time.perf_counter() - t0))
        if base is None:
            base = best / batch  # steps/s per lane at the smallest batch
        print(json.dumps({
            "batch": batch,
            "steps_per_s": round(best, 0),
            "steps_per_s_per_lane": round(best / batch, 1),
            "vs_linear_from_min": round(best / (base * batch), 3),
            "backend": backend,
        }), flush=True)


if __name__ == "__main__":
    main()
