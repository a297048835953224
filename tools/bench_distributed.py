#!/usr/bin/env python
"""Multi-process (multi-host analog) data-parallel rollout throughput.

BASELINE.md's scaling north star asks for env-steps/s at "1 chip, 1 host,
N>=2 hosts".  Real multi-host TPU hardware is unavailable in this
environment, so this tool exercises the SAME code path the multi-host
deployment uses — `jax.distributed.initialize` + a global
`jax.sharding.Mesh` spanning every process's devices, rollout sharded on
the data axis (space_gym_tpu/parallel/distributed.py) — over N loopback CPU
processes, and measures aggregate env-steps/s.

On shared physical cores the ABSOLUTE numbers conflate core contention with
SPMD overhead (each extra process divides the same cores); the artifact this
produces is (a) the mechanism running end to end with a real multi-process
runtime and (b) the per-process efficiency figure under that caveat.  On a
real pod slice the identical command (minus --vdev) runs per host.

Usage:
    python tools/bench_distributed.py --procs 2 --vdev 2 \
        --lanes-per-device 512 --steps 64
Prints one JSON line (from the coordinator) with aggregate steps/s.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(rank: int, nproc: int, port: str, vdev: int,
           lanes_per_device: int, steps: int, env_id: str,
           cores: str = ""):
    if cores:
        # Pin BEFORE importing jax so the XLA CPU thread pool inherits the
        # affinity mask — this is what makes the fair-efficiency protocol
        # fair: every process computes on its own disjoint physical cores,
        # so rate differences measure SPMD/distributed overhead, not core
        # contention (VERDICT r4 item 6).
        os.sched_setaffinity(0, {int(c) for c in cores.split(",")})
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    import jax.numpy as jnp
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.parallel import make_mesh, place, state_shardings
    from space_gym_tpu.parallel.distributed import init_distributed

    if nproc > 1:
        init_distributed(f"127.0.0.1:{port}", num_processes=nproc,
                         process_id=rank)
    n_dev = len(jax.devices())
    lanes = lanes_per_device * n_dev
    mesh = make_mesh(n_dev, model_parallel=1)
    eng = EnvEngine(space_gym_tpu.get_config(env_id), physics="fixed")

    def run(state, key):
        # Reduction stays OUT of the scan: a scalar `ts.reward.sum()` per
        # step would make GSPMD insert a cross-process all-reduce on every
        # step — rollouts are embarrassingly parallel (SURVEY.md §5: env
        # shards never communicate; collectives belong to the learner), so
        # the production pattern is per-lane accumulation + ONE reduction
        # per program.  (Measured here: the per-step variant costs ~3.7 ms
        # per TCP all-reduce and dominates the 2-process leg.)
        def body(carry, _):
            st, k, acc = carry
            k, ka, ks = jax.random.split(k, 3)
            a = jax.random.uniform(ka, (lanes, 2), jnp.float32,
                                   minval=-1.0, maxval=1.0)
            st, ts = eng._step_batched(st, a, ks)
            return (st, k, acc + ts.reward), None

        acc0 = jnp.zeros((lanes,), jnp.float32)
        (state, _, acc), _ = jax.lax.scan(
            body, (state, key, acc0), None, length=steps)
        return state, acc.sum()

    runj = jax.jit(run, donate_argnums=(0,))
    with mesh:
        state, _ = eng.init(jax.random.key(0), lanes)
        state = place(state, state_shardings(state, mesh))
        state, rew = runj(state, jax.random.key(1))
        np.asarray(rew)  # sync
        t0 = time.perf_counter()
        state, rew = runj(state, jax.random.key(2))
        np.asarray(rew)
        dt = time.perf_counter() - t0
    rate = lanes * steps / dt
    # Every rank reports its own rate (tagged); the coordinator aggregates.
    print(json.dumps({
        "rank": rank,
        "processes": nproc,
        "devices": n_dev,
        "lanes": lanes,
        "cores": cores or "unpinned",
        "steps_per_s": round(rate, 0),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--vdev", type=int, default=2,
                    help="virtual CPU devices per process")
    ap.add_argument("--lanes-per-device", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--env", default="GoalContinuous2P-v0")
    ap.add_argument("--cores-per-proc", type=int, default=0,
                    help="pin process r to cores [r*N, (r+1)*N) so every "
                         "process owns disjoint physical cores (fair "
                         "SPMD-overhead measurement on a shared box)")
    ap.add_argument("--suite", action="store_true",
                    help="run the full r5 scaling suite (pinned 1-proc "
                         "baseline, pinned 2-proc leg, collective "
                         "microbench) and print one jsonl block")
    ap.add_argument("--collectives", action="store_true",
                    help="single-process 8-vdev collective microbench "
                         "(psum/all_gather/ppermute at learner sizes)")
    ap.add_argument("--_rank", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_port", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_cores", default="", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.collectives:
        collectives_bench()
        return
    if args.suite:
        suite(args)
        return

    if args._rank is not None:
        worker(args._rank, args.procs, args._port, args.vdev,
               args.lanes_per_device, args.steps, args.env, args._cores)
        return

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1])
    s.close()

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.vdev}")
    env["JAX_PLATFORMS"] = "cpu"
    def cores_of(r):
        if not args.cores_per_proc:
            return ""
        n = args.cores_per_proc
        return ",".join(str(c) for c in range(r * n, (r + 1) * n))

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--procs", str(args.procs), "--vdev", str(args.vdev),
             "--lanes-per-device", str(args.lanes_per_device),
             "--steps", str(args.steps), "--env", args.env,
             "--_rank", str(r), "--_port", port, "--_cores", cores_of(r)],
            env=env)
        for r in range(args.procs)
    ]
    rc = [p.wait(timeout=900) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")


def _run_leg(procs: int, vdev: int, lanes_per_device: int, steps: int,
             env_id: str, cores_per_proc: int):
    """Run one pinned leg as subprocesses; return list of per-rank dicts."""
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1]); s.close()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={vdev}")
    env["JAX_PLATFORMS"] = "cpu"
    ps = []
    for r in range(procs):
        cores = ",".join(str(c) for c in
                         range(r * cores_per_proc, (r + 1) * cores_per_proc))
        ps.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--procs", str(procs), "--vdev", str(vdev),
             "--lanes-per-device", str(lanes_per_device),
             "--steps", str(steps), "--env", env_id,
             "--_rank", str(r), "--_port", port, "--_cores", cores],
            env=env, stdout=subprocess.PIPE, text=True))
    out = []
    for p in ps:
        stdout, _ = p.communicate(timeout=900)
        if p.returncode:
            raise SystemExit(f"worker rc {p.returncode}")
        for line in stdout.splitlines():
            if line.startswith("{"):
                out.append(json.loads(line))
    return out


def suite(args):
    """The r5 scaling artifact (VERDICT r4 item 6): the raw 2-process number
    on a 4-core box conflated SPMD overhead with core contention (each extra
    process divided the same cores).  Protocol here: every process owns TWO
    DEDICATED physical cores (sched_setaffinity before jax import), so the
    1-process baseline and the 2-process leg run at identical per-process
    compute.  fair_efficiency = aggregate(2 procs) / (2 x 1-proc rate) then
    isolates the jax.distributed + cross-process-collective cost; the
    collective microbench quantifies the absolute cost of the learner's
    gradient psum at its real sizes."""
    lanes, steps = args.lanes_per_device, args.steps
    base = _run_leg(1, 2, lanes, steps, args.env, 2)
    two = _run_leg(2, 2, lanes, steps, args.env, 2)
    base_rate = base[0]["steps_per_s"]
    # Every rank reports the GLOBAL rate (lanes is the global lane count and
    # each process's wall time spans the SPMD program) — so the 2-process
    # figure is their mean, NOT a sum.
    rate2 = sum(d["steps_per_s"] for d in two) / len(two)
    print(json.dumps({"section": "fair_two_process_cpu",
                      "protocol": "each process pinned to 2 dedicated cores; "
                                  "same per-process config in both legs; "
                                  "one collective per program (production "
                                  "rollout pattern)"}))
    print(json.dumps({"leg": "1proc_2core", **base[0]}))
    for d in two:
        print(json.dumps({"leg": "2proc_2core_each", **d}))
    print(json.dumps({
        "leg": "fair_efficiency",
        "global_rate_2proc": rate2,
        "baseline_1proc": base_rate,
        "fair_efficiency": round(rate2 / (2 * base_rate), 3),
    }))


def collectives_bench():
    """Isolated collective microbench on the 8-vdev mesh: the SAC learner's
    actual communication pattern (gradient psum of the packed learner tree,
    metric all_gather, ring ppermute) timed against a no-collective control
    of identical FLOPs, at the real gradient sizes (H=256 packed layout:
    (1928, 256) + (16, 256) f32 ~ 2 MB)."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    gw = jnp.ones((1928, 256), jnp.float32)
    gv = jnp.ones((16, 256), jnp.float32)
    nbytes = gw.nbytes + gv.nbytes

    from functools import partial
    from jax.experimental.shard_map import shard_map

    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()))
    def with_psum(a, b):
        return (jax.lax.psum(a, "data") / 8.0, jax.lax.psum(b, "data") / 8.0)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()))
    def without(a, b):
        return a * 1.0000001, b * 1.0000001

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P(None),
             check_rep=False)
    def gather_metrics(m):
        return jax.lax.all_gather(m, "data").reshape(-1)

    @partial(shard_map, mesh=mesh, in_specs=(P("data"),), out_specs=P("data"))
    def ring(x):
        return jax.lax.ppermute(x, "data",
                                [(i, (i + 1) % 8) for i in range(8)])

    def timeit(f, *xs, reps=20):
        r = jax.jit(f)
        out = r(*xs); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = r(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    t_psum = timeit(with_psum, gw, gv)
    t_ctrl = timeit(without, gw, gv)
    t_gather = timeit(gather_metrics, jnp.ones((8, 8), jnp.float32))
    t_ring = timeit(ring, jnp.ones((8 * 128, 256), jnp.float32))
    print(json.dumps({"section": "collective_microbench_8vdev",
                      "grad_bytes": int(nbytes)}))
    print(json.dumps({"op": "grad_psum_learner_sized",
                      "us": round(t_psum * 1e6, 1),
                      "control_us": round(t_ctrl * 1e6, 1),
                      "net_collective_us": round((t_psum - t_ctrl) * 1e6, 1)}))
    print(json.dumps({"op": "metrics_all_gather", "us": round(t_gather * 1e6, 1)}))
    print(json.dumps({"op": "ring_ppermute_128rows_per_dev",
                      "us": round(t_ring * 1e6, 1)}))


if __name__ == "__main__":
    main()
