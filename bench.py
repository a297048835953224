#!/usr/bin/env python
"""Headline benchmark: vectorized env-steps/s on GoalContinuous2P-v0.

Prints ONE JSON line — ALWAYS, even when the TPU backend is unreachable:
  {"metric": "env_steps_per_s_goal2p", "value": N, "unit": "steps/s",
   "vs_baseline": N / 2288.0, ...roofline fields...}
or, on persistent backend failure,
  {"metric": ..., "value": 0.0, ..., "error": "<reason>"}

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

Robustness (the axon TPU tunnel is known to flake between sessions): backend
init is probed in a SUBPROCESS with a timeout (an in-process init hang cannot
be interrupted), retried with backoff, and the whole run sits under a
SIGALRM watchdog so a mid-run wedge still produces the JSON error line.
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

BASELINE_STEPS_PER_S = 2288.0
ENV_ID = "GoalContinuous2P-v0"
METRIC = "env_steps_per_s_goal2p"


class BenchTimeout(Exception):
    pass


def _alarm_handler(signum, frame):
    raise BenchTimeout("watchdog alarm: bench exceeded its wall-clock budget")


def probe_backend(timeout_s: float) -> str:
    """Initialize the JAX backend in a subprocess and return its name.

    A hung tunnel blocks backend init indefinitely and an in-process hang is
    uninterruptible, so the first touch happens in a child we can kill.  A
    successful probe also warms the tunnel, so the in-process init that
    follows is fast.
    """
    code = (
        "import jax, json; d = jax.devices()[0]; "
        "print('SGT_PROBE ' + json.dumps("
        "{'backend': jax.default_backend(), 'kind': d.device_kind}))"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout_s,
        env=dict(os.environ),
    )
    for line in r.stdout.splitlines():
        if line.startswith("SGT_PROBE "):
            return json.loads(line[len("SGT_PROBE "):])["backend"]
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    raise RuntimeError(
        "backend probe failed (rc=%d): %s" % (r.returncode, tail[-1] if tail else "?")
    )


def probe_backend_with_retry(tries: int, timeout_s: float, wait_s: float) -> str:
    last = None
    for i in range(tries):
        try:
            return probe_backend(timeout_s)
        except (RuntimeError, subprocess.TimeoutExpired, OSError) as e:
            last = e
            if i + 1 < tries:
                time.sleep(wait_s * (i + 1))
    raise RuntimeError(f"backend unavailable after {tries} probes: {last}")


def build(batch: int, steps: int, substeps: int, backend: str, block=None,
          tableau="dp5", refine=12):
    import jax
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine

    eng = EnvEngine(
        space_gym_tpu.get_config(ENV_ID),
        # The fused component-major Pallas kernel is the production physics
        # path on TPU; tests pin it against the XLA "fixed" path.
        physics="fixed" if backend == "cpu" else "pallas",
        dtype=jnp.float32,
        substeps=substeps,
        pallas_block=block,
        pallas_tableau=tableau,
        refine_iters=refine,
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


# Approximate per-chip peaks for normalized utilization fields.  HBM numbers
# are published; VPU f32 peaks are estimates (8 sublanes x 128 lanes x 4 ALUs
# per core x cores/chip x clock) — order-of-magnitude normalizers so "81M
# steps/s" can be judged against what the chip can do, not precise specs.
_CHIP_TABLE = (
    # tag in device_kind.lower() -> (hbm_bytes_per_s, vpu_f32_ops_per_s)
    ("v5 lite", 819e9, 6.1e12),
    ("v5e", 819e9, 6.1e12),
    ("v5p", 2765e9, 14.3e12),
    ("v4", 1228e9, 8.6e12),
    ("v6e", 1640e9, 7.0e12),
    ("v6", 1640e9, 7.0e12),
)


def roofline(eng, steps_per_s: float):
    """Hardware-normalized framing (VERDICT r1 item 6, r2 weak item 3):
    exact HBM bytes per lane-step from the fused kernel's operand list plus a
    static VPU-op estimate.  The workload is VPU-bound (HBM sits at ~4.5% of
    roofline — RESULTS.md), so the honest utilization number is
    pct_vpu_roofline: est VPU ops/s over the chip's approximate VPU f32 peak.

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
    # Through the axon tunnel the device_kind string may be opaque; the
    # tunnel env names the generation (PALLAS_AXON_TPU_GEN=v5e) — append it
    # as a fallback tag so the roofline fields are always present on TPU.
    gen_hint = ("" if kind == "cpu"
                else os.environ.get("PALLAS_AXON_TPU_GEN", "").lower())
    hbm_bw = vpu_peak = None
    for probe_kind in (kind, f"{kind} {gen_hint}".strip()):
        for tag, bw, vpu in _CHIP_TABLE:
            if tag in probe_kind:
                hbm_bw, vpu_peak = bw, vpu
                break
        if hbm_bw:
            break
    # Static VPU-op estimate per lane-step (DP5 physics + events + obs/reward
    # + amortized reset; see ARCHITECTURE.md "per-lane-step decomposition").
    rhs_ops = 30 + 20 * p
    n_st = 6 if getattr(eng, "pallas_tableau", "dp5") == "dp5" else 3
    est_ops = (
        eng.substeps * (n_st * rhs_ops + 400)       # stages + combos + error
        + (eng.refine_iters + 2) * (10 + 4 * p)     # event refinement
        + 25 * d + 120                              # obs/reward/reset tail
    )
    out = {
        "device_kind": kind,
        "hbm_bytes_per_step": bytes_per_step,
        "est_vpu_ops_per_step": est_ops,
    }
    if hbm_bw:
        out["pct_hbm_roofline"] = round(
            100.0 * steps_per_s * bytes_per_step / hbm_bw, 2
        )
    if vpu_peak:
        out["pct_vpu_roofline"] = round(
            100.0 * steps_per_s * est_ops / vpu_peak, 2
        )
    return out


def measure(batch: int, args, backend: str) -> dict:
    """Build + warm up + time one batch config; returns measurement fields."""
    import jax
    import numpy as np

    eng, run = build(batch, args.steps, args.substeps, backend, args.block,
                     args.tableau, args.refine)
    state, _ = eng.init(jax.random.key(0), batch)

    # Warm-up: compile + one full run.  NOTE: device->host fetch (np.asarray)
    # is the sync point — on the axon tunnel block_until_ready returns before
    # the computation finishes, which would inflate throughput ~1000x.
    t0 = time.perf_counter()
    state, rew, dones = run(state, jax.random.key(1))
    np.asarray(rew)
    warmup_s = time.perf_counter() - t0

    vals = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state, rew, dones = run(state, jax.random.key(2 + r))
        np.asarray(rew)
        dt = time.perf_counter() - t0
        vals.append(batch * args.steps / dt)

    return {
        "value": round(max(vals), 1),
        "value_mean": round(float(np.mean(vals)), 1),
        "value_std": round(float(np.std(vals)), 1),
        "repeat_values": [round(v, 1) for v in vals],
        "batch": batch,
        "warmup_s": round(warmup_s, 1),
        "_eng": eng,
    }


def run_bench(args, deadline: float, partial: dict) -> dict:
    # --smoke is the CPU run; an explicit JAX_PLATFORMS=cpu also forces CPU.
    # NOTE the ambient environment sets JAX_PLATFORMS=axon (the TPU tunnel
    # platform) — that is the NORMAL TPU path, not a CPU override; honoring it
    # as one re-selects the tunnel and hangs when it is down.
    env_plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    want_cpu = bool(args.smoke or env_plat == "cpu")
    if want_cpu:
        backend = "cpu"
    else:
        backend = probe_backend_with_retry(
            tries=args.probe_tries, timeout_s=args.probe_timeout,
            wait_s=args.probe_wait,
        )

    if want_cpu:
        # The axon sitecustomize force-registers the TPU platform; the
        # config update after import is the only override that sticks.
        from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

        pin_cpu_if_requested(force=True)

    # Staged capture (VERDICT r4 item 1): the capture-safe batch runs FIRST so
    # a driver-verified number exists within minutes even from a cold compile
    # cache; the saturation-knee batch (~+30%) runs only if the remaining
    # wall-clock budget clearly covers another compile.  An explicit --batch
    # pins a single stage.  `partial` is mutated as stages finish so the
    # watchdog handler can still print the best COMPLETED measurement.
    stages = [args.batch] if args.batch else [32768, 262144]
    best = None
    for i, batch in enumerate(stages):
        if best is not None:
            remaining = deadline - time.monotonic()
            # Cold-cache Pallas compiles take ~4-5 min through the tunnel;
            # the previous stage's warmup time is the live cold/warm signal.
            need = 90.0 if best["warmup_s"] < 45.0 else 420.0
            if remaining < need:
                partial["note"] = (
                    f"skipped batch={batch}: {remaining:.0f}s left < {need:.0f}s"
                )
                break
        m = measure(batch, args, backend)
        if best is None or m["value"] > best["value"]:
            best = m
        payload = {
            "metric": METRIC,
            "value": best["value"],
            "unit": "steps/s",
            "vs_baseline": round(best["value"] / BASELINE_STEPS_PER_S, 2),
        }
        payload.update({k: v for k, v in best.items() if not k.startswith("_")})
        payload.update(roofline(best["_eng"], best["value"]))
        partial.clear()
        partial.update(payload)
    return dict(partial)


def main():
    # Persistent compile cache: the fused-kernel jit is the dominant cold-run
    # cost; repeated bench invocations on the same machine skip it.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sgt_jax_cache")

    ap = argparse.ArgumentParser()
    # Staged default (VERDICT r4 item 1): no --batch runs 32768 first (capture
    # safe: driver-verified within minutes even cold), then 262144 (the
    # saturation knee from tools/bench_batch_curve.py, ~105M vs 74M) only if
    # the budget clearly covers a second compile; reports the best completed.
    ap.add_argument("--batch", type=int, default=None,
                    help="pin a single batch size (default: staged 32768 then "
                         "262144 within the budget)")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--block", type=int, default=None,
                    help="pallas lane-block override (default: engine's 1024)")
    # Headline config bs3 x 1 substep (r5): the throughput path has never
    # been the bitwise tier — its accuracy contract is the <=2e-4 golden
    # tier, and bs3-sub1 sits 50x under it (worst live-state diff 4e-6 vs
    # the DP5-sub2 oracle, 124/124 termination flags exact) while the
    # serial chain halves twice.  Ladder: dp5x2 184.9M / bs3x2 201.4M /
    # dp5x1 238.8M / bs3x1 252.5M steps/s.  The ENGINE defaults stay
    # parity-first (dp5 x 2) — this is a bench-level default only.
    ap.add_argument("--tableau", default="bs3", choices=["dp5", "bs3"],
                    help="RK tableau for the pallas physics body (bs3 = "
                         "Bogacki-Shampine 3(2), shorter stage chain)")
    ap.add_argument("--substeps", type=int, default=1)
    # Event refinement is safeguarded Illinois false position (r5b): at 8
    # iterations the worst crash-lane event-time state error on randomized
    # sweeps is 5.4e-5 — inside the <=2e-4 golden tier with margin and on par
    # with the old 12-iteration bisection — while the serial per-substep
    # refinement chain shrinks by a third (TPU ladder: illinois refine
    # 12/8/7/6 = 265/282/287/292 M steps/s; 6 has a rare 5e-4 outlier lane,
    # rejected).  The ENGINE default stays refine_iters=12 (~converged,
    # 6e-8).
    ap.add_argument("--refine", type=int, default=8,
                    help="event-refinement iterations for the pallas body "
                         "(bench default 8; engine/library default 12)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--smoke", action="store_true", help="small CPU-friendly run")
    ap.add_argument("--probe-tries", type=int, default=3)
    ap.add_argument("--probe-timeout", type=float, default=120.0,
                    help="per-probe subprocess timeout (the probe only touches "
                         "jax.devices(); compiles happen later under the budget)")
    ap.add_argument("--probe-wait", type=float, default=30.0,
                    help="base backoff between probes (i-th retry waits i*this)")
    ap.add_argument("--budget", type=float, default=1500.0,
                    help="total wall-clock watchdog (s); on expiry the bench "
                         "prints the best COMPLETED stage, or a JSON error "
                         "line if nothing finished")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.steps, args.repeats = 512, 64, 1

    deadline = time.monotonic() + args.budget
    partial: dict = {}

    # External-timeout defense: drivers wrap the bench in `timeout`, which
    # SIGTERMs on expiry.  If a stage already completed, print it and exit 0
    # so the capture still parses a real number instead of rc 124 + nothing.
    def _term_handler(signum, frame):
        if partial.get("value"):
            payload = dict(partial)
            payload["note"] = "SIGTERM after a completed stage"
            print(json.dumps(payload), flush=True)
            os._exit(0)
        os._exit(124)

    signal.signal(signal.SIGTERM, _term_handler)
    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _alarm_handler)
        signal.alarm(int(args.budget))
    try:
        payload = run_bench(args, deadline, partial)
    except BaseException as e:  # noqa: BLE001 — the JSON line must ALWAYS print
        if partial.get("value"):
            # A stage completed before the watchdog/failure: report it.
            payload = dict(partial)
            payload["note"] = f"{type(e).__name__} after a completed stage"
        else:
            payload = {
                "metric": METRIC,
                "value": 0.0,
                "unit": "steps/s",
                "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:600],
            }
    finally:
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)
    print(json.dumps(payload))
    # rc 0 even on error: the contract is one parseable line, and a non-zero
    # rc makes some captures discard stdout.
    return 0


if __name__ == "__main__":
    sys.exit(main())
