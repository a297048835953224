#!/usr/bin/env python
"""Outage-resilient supervisor for long training runs.

The axon TPU tunnel drops intermittently (the round-2 Kepler run was
interrupted twice mid-flight); `tools/train.py` checkpoints at every eval and
resumes exactly, so the missing piece is an unattended restart loop:

    python tools/supervise.py --log /tmp/kepler.log -- \
        python tools/train.py --env KeplerCircleOrbit-v0 ... --ckpt /tmp/ck

Behavior:
  * Before each (re)launch, probe the backend in a throwaway subprocess under
    a timeout — a dead tunnel hangs device init forever, and launching a
    4-minute Pallas compile into it just burns a restart.  Probe failures
    back off (capped) and do NOT consume restart budget.
  * The child's stdout (train.py's JSON-lines metrics) is streamed through to
    our stdout and appended to --log so learning curves survive crashes.
  * On a nonzero child exit the command is relaunched with `--resume`
    injected (requires `--ckpt` in the child command).  Clean exit (rc 0)
    ends supervision — train.py exits cleanly when done or when
    `--until-return` is reached.
  * The child runs in its own process group; Ctrl-C / SIGTERM to the
    supervisor forwards SIGTERM to exactly that group (never a pattern kill).

Kill discipline (CLAUDE.md): never SIGSTOP a TPU client; on operator stop we
SIGTERM the child group once and wait — train.py's last checkpoint is at most
one eval interval old.
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

PROBE_SNIPPET = (
    "import jax, numpy as np, jax.numpy as jnp; "
    "x = jnp.ones((8, 8)); np.asarray(x @ x); "
    "print(jax.default_backend())"
)


def probe_backend(timeout: float) -> bool:
    """True iff a fresh process can init the backend and run one op."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SNIPPET],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            timeout=timeout,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def with_resume(cmd: list[str]) -> list[str]:
    if "--resume" in cmd:
        return cmd
    return cmd + ["--resume"]


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--max-restarts", type=int, default=100)
    ap.add_argument("--backoff", type=float, default=20.0,
                    help="initial seconds between probe/restart attempts")
    ap.add_argument("--backoff-cap", type=float, default=600.0)
    ap.add_argument("--probe-timeout", type=float, default=180.0)
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the backend probe (e.g. CPU-only child)")
    ap.add_argument("--log", default=None, help="append child stdout here")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="child command after `--`")
    args = ap.parse_args()

    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no child command given (put it after `--`)")

    logf = open(args.log, "a", buffering=1) if args.log else None

    def emit(obj):
        line = json.dumps(obj)
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")

    child = None
    stopping = False

    def on_signal(signum, _frame):
        nonlocal stopping
        stopping = True
        if child is not None and child.poll() is None:
            # one SIGTERM to the child's own process group, then wait below
            os.killpg(child.pid, signal.SIGTERM)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    restarts = 0
    backoff = args.backoff
    launch_cmd = list(cmd)
    while True:
        if stopping:
            emit({"supervisor": "stopped by signal", "restarts": restarts})
            return 130
        if not args.no_probe and not probe_backend(args.probe_timeout):
            emit({"supervisor": "backend probe failed; backing off",
                  "sleep_s": round(backoff, 1)})
            time.sleep(backoff)
            backoff = min(backoff * 1.6, args.backoff_cap)
            continue
        backoff = args.backoff
        emit({"supervisor": "launch", "attempt": restarts + 1,
              "cmd": " ".join(launch_cmd)})
        child = subprocess.Popen(
            launch_cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, bufsize=1, start_new_session=True,
        )
        try:
            for line in child.stdout:
                line = line.rstrip("\n")
                print(line, flush=True)
                if logf:
                    logf.write(line + "\n")
        except KeyboardInterrupt:
            pass
        rc = child.wait()
        if rc == 0:
            emit({"supervisor": "clean exit", "restarts": restarts})
            return 0
        if stopping:
            emit({"supervisor": "stopped by signal", "restarts": restarts,
                  "child_rc": rc})
            return 130
        restarts += 1
        if restarts > args.max_restarts:
            emit({"supervisor": "restart budget exhausted", "child_rc": rc,
                  "restarts": restarts - 1})
            return 1
        emit({"supervisor": "child died; restarting with --resume",
              "child_rc": rc, "restart": restarts,
              "sleep_s": round(backoff, 1)})
        launch_cmd = with_resume(list(cmd))
        time.sleep(backoff)


if __name__ == "__main__":
    raise SystemExit(main())
