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
           lanes_per_device: int, steps: int, env_id: str):
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
        def body(carry, _):
            st, k = carry
            k, ka, ks = jax.random.split(k, 3)
            a = jax.random.uniform(ka, (lanes, 2), jnp.float32,
                                   minval=-1.0, maxval=1.0)
            st, ts = eng._step_batched(st, a, ks)
            return (st, k), ts.reward.sum()

        (state, _), rew = jax.lax.scan(body, (state, key), None, length=steps)
        return state, rew.sum()

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
    if rank == 0:
        print(json.dumps({
            "processes": nproc,
            "devices": n_dev,
            "lanes": lanes,
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
    ap.add_argument("--_rank", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_port", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._rank is not None:
        worker(args._rank, args.procs, args._port, args.vdev,
               args.lanes_per_device, args.steps, args.env)
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
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--procs", str(args.procs), "--vdev", str(args.vdev),
             "--lanes-per-device", str(args.lanes_per_device),
             "--steps", str(args.steps), "--env", args.env,
             "--_rank", str(r), "--_port", port],
            env=env)
        for r in range(args.procs)
    ]
    rc = [p.wait(timeout=900) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")


if __name__ == "__main__":
    main()
