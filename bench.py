#!/usr/bin/env python
"""Headline benchmark: vectorized env-steps/s on GoalContinuous2P-v0.

Prints ONE JSON line:
  {"metric": "env_steps_per_s_goal2p", "value": N, "unit": "steps/s",
   "vs_baseline": N / 2288.0}

Baseline 2288 steps/s is the reference-equivalent throughput measured on this
machine's host CPU: the bitwise-parity adapter (space_gym_tpu.compat.gym_api,
physics="host") running the same scipy adaptive-RK45 step as the upstream
single env (gym_space/dynamic_model.py:94-125), single lane.  The reference
repo publishes no throughput numbers (SURVEY.md §6), so this measured
equivalent is the baseline.

The benchmark itself is the TPU path: the fused jit/vmap/scan engine
(space_gym_tpu.engine) on the default backend, fixed-substep physics, f32,
random policy, with only scalar reductions carried out of the scan (no
trajectory materialization — this measures the simulator, not HBM spill).
"""
from __future__ import annotations

import argparse
import json
import os
import time

BASELINE_STEPS_PER_S = 2288.0
ENV_ID = "GoalContinuous2P-v0"


def build(batch: int, steps: int, substeps: int):
    import jax
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine

    eng = EnvEngine(
        space_gym_tpu.get_config(ENV_ID),
        # The fused component-major Pallas kernel is the production physics
        # path on TPU; tests pin it against the XLA "fixed" path.
        physics="pallas" if jax.default_backend() == "tpu" else "fixed",
        dtype=jnp.float32,
        substeps=substeps,
    )

    def run(state, key):
        def body(carry, _):
            st, k = carry
            k, ka, ks = jax.random.split(k, 3)
            action = jax.random.uniform(
                ka, (batch, 2), jnp.float32, minval=-1.0, maxval=1.0
            )
            st, ts = eng._step_batched(st, action, ks)
            return (st, k), (ts.reward.sum(), ts.done.sum())

        (state, _), (rew, dones) = jax.lax.scan(body, (state, key), None, length=steps)
        return state, rew.sum(), dones.sum()

    return eng, jax.jit(run, donate_argnums=(0,))


def main():
    # Persistent compile cache: the fused-kernel jit is the dominant cold-run
    # cost; repeated bench invocations on the same machine skip it.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sgt_jax_cache")

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--smoke", action="store_true", help="small CPU-friendly run")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.steps, args.repeats = 512, 64, 1

    import jax

    eng, run = build(args.batch, args.steps, args.substeps)
    state, _ = eng.init(jax.random.key(0), args.batch)

    import numpy as np

    # Warm-up: compile + one full run.  NOTE: device->host fetch (np.asarray)
    # is the sync point — on the axon tunnel block_until_ready returns before
    # the computation finishes, which would inflate throughput ~1000x.
    state, rew, dones = run(state, jax.random.key(1))
    np.asarray(rew)

    best = 0.0
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state, rew, dones = run(state, jax.random.key(2 + r))
        np.asarray(rew)
        dt = time.perf_counter() - t0
        best = max(best, args.batch * args.steps / dt)

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_goal2p",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
