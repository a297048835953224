#!/usr/bin/env python
"""Scaling benchmark: env-steps/s vs mesh size (BASELINE.md scaling target:
"env-steps/s scaling efficiency at 1 chip, 1 host, N>=2 hosts").

Shards the env batch along the "data" axis of a jax.sharding.Mesh and times
the fused rollout at increasing device counts.  Rollouts are embarrassingly
parallel (no collectives), so efficiency measures pure SPMD overhead.

On real TPU hardware run as-is (devices = chips; multi-host after
jax.distributed.initialize()).  Without TPUs, validate the mechanism on
virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_scaling.py --lanes-per-device 1024 --steps 64

Prints one JSON line per mesh size.
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
    ap.add_argument("--lanes-per-device", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--device-counts", default=None,
                    help="comma list, default: 1,2,4,...,n_devices")
    args = ap.parse_args()

    import jax

    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import jax.numpy as jnp
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.parallel import make_mesh, place, state_shardings

    n_dev = len(jax.devices())
    if args.device_counts:
        counts = [int(x) for x in args.device_counts.split(",")]
    else:
        counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_dev]

    eng = EnvEngine(space_gym_tpu.get_config(args.env), physics="fixed")
    base_rate = None
    for d in counts:
        lanes = args.lanes_per_device * d
        mesh = make_mesh(d, model_parallel=1)

        def run(state, key, lanes=lanes):
            def body(carry, _):
                st, k = carry
                k, ka, ks = jax.random.split(k, 3)
                a = jax.random.uniform(ka, (lanes, 2), jnp.float32, minval=-1.0, maxval=1.0)
                st, ts = eng._step_batched(st, a, ks)
                return (st, k), ts.reward.sum()

            (state, _), rew = jax.lax.scan(body, (state, key), None, length=args.steps)
            return state, rew.sum()

        runj = jax.jit(run, donate_argnums=(0,))
        state, _ = eng.init(jax.random.key(0), lanes)
        state = place(state, state_shardings(state, mesh))
        with mesh:
            state, rew = runj(state, jax.random.key(1))
            np.asarray(rew)  # sync (block_until_ready unreliable over tunnels)
            t0 = time.perf_counter()
            state, rew = runj(state, jax.random.key(2))
            np.asarray(rew)
            dt = time.perf_counter() - t0
        rate = lanes * args.steps / dt
        if base_rate is None:
            base_rate = rate
        print(
            json.dumps(
                {
                    "devices": d,
                    "lanes": lanes,
                    "steps_per_s": round(rate, 0),
                    "scaling_efficiency": round(rate / (base_rate * d), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
