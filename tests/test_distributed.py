"""Two-process jax.distributed exercise on the CPU backend (SURVEY.md §4
point 4: multi-host tests via the fake-cluster technique).

Spawns a coordinator + worker pair (tests/dist_worker.py), each with 4
virtual CPU devices; together they form a 2-process x 4-device cluster.  Both
run `parallel.distributed.init_distributed` and two sharded SAC train
iterations over the global mesh (data x model), then print a checksum of the
replicated learner params — which must agree bit-for-bit across processes
(the gradient all-reduce is the only cross-host communication in the design;
see SURVEY.md §2 parallelism table).
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    # (bounded by the communicate(timeout=540) below — pytest-timeout is not
    # available in this image)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # avoid cross-process cache races

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "dist_worker.py"),
             str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} rc={rc}\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
        assert "WORKER_OK" in out, f"rank {rank} incomplete:\n{out}"

    def field(out, tag):
        return [l for l in out.splitlines() if l.startswith(tag)]

    c0, c1 = field(outs[0][1], "CHECKSUM"), field(outs[1][1], "CHECKSUM")
    m0, m1 = field(outs[0][1], "METRICS"), field(outs[1][1], "METRICS")
    assert c0 and c0 == c1, f"replicated params diverged: {c0} vs {c1}"
    assert m0 and m0 == m1, f"metrics diverged: {m0} vs {m1}"
    f0, f1 = field(outs[0][1], "FUSED_CHECKSUM"), field(outs[1][1], "FUSED_CHECKSUM")
    assert f0 and f0 == f1, f"replicated FusedState diverged: {f0} vs {f1}"
