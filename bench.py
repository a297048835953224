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


def roofline(eng, steps_per_s: float):
    """Hardware-normalized framing (VERDICT r1 item 6): exact HBM bytes per
    lane-step from the fused kernel's operand list, plus a static VPU-op
    estimate, so the headline number can be judged against what the chip can
    do (session-noise-robust, unlike raw steps/s).

    The full-step kernel keeps all intermediates in VMEM; its HBM traffic is
    just per-lane state in/out + the bulk uniforms + the TimeStep outputs.
    """
    import jax

    cfg = eng.config
    p = cfg.n_planets
    d = cfg.obs_dim
    tiles = cfg.tiling.n_tiles if cfg.tiling is not None else 0
    cols = cfg.tiling.cols if cfg.tiling is not None else 1
    try:
        from space_gym_tpu.ops.pallas_full import full_step_for_config

        u_rows = full_step_for_config(
            cfg, eng.substeps, eng.refine_iters, 1024, False
        ).n_uniform_rows
    except Exception:
        u_rows = 24
    n_in = 6 + 2 + 2 * p + 2 + 3 + cols + (tiles + 5) + u_rows
    n_out = 6 + 2 * p + 2 + 3 + cols + d + d + 1 + (tiles + 5) + 3
    bytes_per_step = 4 * (n_in + n_out)

    kind = jax.devices()[0].device_kind.lower()
    hbm_bw = None
    for tag, bw in (("v5 lite", 819e9), ("v5e", 819e9), ("v5p", 2765e9),
                    ("v4", 1228e9), ("v6", 1640e9)):
        if tag in kind:
            hbm_bw = bw
            break
    # Static VPU-op estimate per lane-step (DP5 physics + events + obs/reward
    # + amortized reset; see ARCHITECTURE.md "per-lane-step decomposition").
    rhs_ops = 30 + 20 * p
    est_ops = (
        eng.substeps * (6 * rhs_ops + 400)          # stages + combos + error
        + (eng.refine_iters + 2) * (10 + 4 * p)     # event refinement
        + 25 * d + 120                              # obs/reward/reset tail
    )
    out = {
        "hbm_bytes_per_step": bytes_per_step,
        "est_vpu_ops_per_step": est_ops,
    }
    if hbm_bw:
        out["pct_hbm_roofline"] = round(
            100.0 * steps_per_s * bytes_per_step / hbm_bw, 2
        )
    return out


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

    if args.smoke or os.environ.get("JAX_PLATFORMS"):
        # --smoke is the CPU run; also honor an explicit JAX_PLATFORMS (the
        # axon sitecustomize force-registers the TPU platform, and with the
        # tunnel down even backend init would hang).
        jax.config.update(
            "jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

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

    payload = {
        "metric": "env_steps_per_s_goal2p",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / BASELINE_STEPS_PER_S, 2),
    }
    payload.update(roofline(eng, best))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
