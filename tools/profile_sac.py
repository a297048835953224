#!/usr/bin/env python
"""Per-phase profile of the SAC/TD3 train_iter (VERDICT r1 item 2 / r2 item 2).

Times, in one session on the same chip: full train_iter, rollout-only,
K-updates-only (replay pre-filled), single update, replay sample, and the
polyak step, each as its own jitted program.  All timings sync via a
device->host fetch (axon gotcha: block_until_ready returns early).

Usage: python tools/profile_sac.py [--algo sac|td3] [--fused] \
           [--lanes 2048 --rollout-len 8 --updates-per-iter 32 --batch-size 8192]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, warmup=3):
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
    # sync
    leaf = jax_first_leaf(out)
    np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax_first_leaf(out))
    return (time.perf_counter() - t0) / iters


def jax_first_leaf(tree):
    import jax

    return jax.tree.leaves(tree)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="GoalContinuous2P-v0")
    ap.add_argument("--algo", choices=["sac", "td3", "dqn"], default="sac")
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--rollout-len", type=int, default=8)
    ap.add_argument("--updates-per-iter", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--physics", default=None)
    ap.add_argument("--fused", action="store_true",
                    help="profile the fused-kernel learner path")
    ap.add_argument("--fused-block", type=int, default=1024)
    ap.add_argument("--fold", action="store_true",
                    help="SAC: folded (K,) kernel schedule (fused_fold)")
    ap.add_argument("--hidden", type=int, default=256)
    args = ap.parse_args()

    import jax

    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.models import (
        DQNConfig, DQNTrainer, SACConfig, SACTrainer, TD3Config, TD3Trainer,
    )
    from space_gym_tpu.models.replay import replay_sample

    physics = args.physics or ("pallas" if jax.default_backend() == "tpu" else "fixed")
    eng = EnvEngine(space_gym_tpu.get_config(args.env), physics=physics)
    if args.algo == "dqn":
        if args.fused:
            raise SystemExit("DQN has no fused kernel (see VERDICT r3 item 7 "
                             "ladder: measure first)")
        cfg = DQNConfig(
            lanes=args.lanes, rollout_len=args.rollout_len,
            updates_per_iter=args.updates_per_iter,
            batch_size=args.batch_size)
        mk_tr = DQNTrainer
    else:
        mk_cfg, mk_tr = ((SACConfig, SACTrainer) if args.algo == "sac"
                         else (TD3Config, TD3Trainer))
        cfg = mk_cfg(
            lanes=args.lanes,
            rollout_len=args.rollout_len,
            updates_per_iter=args.updates_per_iter,
            batch_size=args.batch_size,
            fused_updates=args.fused,
            fused_block=args.fused_block,
            hidden=(args.hidden, args.hidden),
            **({"fused_fold": True} if args.fold and args.algo == "sac" else {}),
        )
    tr = mk_tr(eng, cfg)
    state = tr.init(jax.random.key(0))
    key = jax.random.key(1)

    # Pre-fill replay past warmup so updates are live.
    for i in range(8):
        state, _ = tr.train_iter(state, jax.random.fold_in(key, i))

    steps_per_iter = cfg.lanes * cfg.rollout_len

    t_full = timeit(tr.train_iter, state, key)
    print(f"full train_iter      : {t_full*1e3:8.2f} ms  "
          f"({steps_per_iter/t_full/1e6:6.2f}M env-steps/s)")

    rollout = jax.jit(lambda s, k: tr._rollout(s, k))
    t_roll = timeit(rollout, state, key)
    print(f"rollout only         : {t_roll*1e3:8.2f} ms  "
          f"({steps_per_iter/t_roll/1e6:6.2f}M env-steps/s)")

    if args.fused:
        updk_fn = jax.jit(lambda s, k: tr._update_fused(s, k))
        t_updk = timeit(updk_fn, state, key)
        print(f"fused K updates      : {t_updk*1e3:8.2f} ms  "
              f"(K={cfg.updates_per_iter}, block={cfg.fused_block})")
        t_scan = timeit(lambda s, k: tr.train_iters(s, k, n=10), state, key) / 10
        print(f"train_iters scan(10) : {t_scan*1e3:8.2f} ms/iter  "
              f"({steps_per_iter/t_scan/1e6:6.2f}M env-steps/s)")
    else:
        upd1 = jax.jit(lambda s, k: tr._update_once(s, k))
        t_upd1 = timeit(upd1, state, key)
        print(f"single update        : {t_upd1*1e3:8.2f} ms")

        def updates_only(s, k):
            for i in range(cfg.updates_per_iter):
                k, ki = jax.random.split(k)
                s, m = tr._update_once(s, ki)
            return s, m

        updk = jax.jit(updates_only)
        t_updk = timeit(updk, state, key)
        print(f"{cfg.updates_per_iter:3d} updates          : {t_updk*1e3:8.2f} ms")
        if hasattr(tr, "train_iters"):
            t_scan = timeit(lambda s, k: tr.train_iters(s, k, n=10), state, key) / 10
            print(f"train_iters scan(10) : {t_scan*1e3:8.2f} ms/iter  "
                  f"({steps_per_iter/t_scan/1e6:6.2f}M env-steps/s)")

    samp = jax.jit(lambda s, k: replay_sample(s.replay, k, cfg.batch_size))
    t_samp = timeit(samp, state, key)
    print(f"replay sample        : {t_samp*1e3:8.2f} ms")

    if hasattr(state, "critic_params"):
        polyak = jax.jit(
            lambda s: jax.tree.map(
                lambda t, p: t * (1 - cfg.tau) + p * cfg.tau,
                s.target_critic_params, s.critic_params,
            )
        )
        t_pol = timeit(polyak, state)
        print(f"polyak               : {t_pol*1e3:8.2f} ms")

    print(f"\nrollout+updates sum  : {(t_roll + t_updk)*1e3:8.2f} ms "
          f"(vs full {t_full*1e3:.2f} ms)")
    print(f"update share of full : {t_updk/t_full*100:5.1f}%")


if __name__ == "__main__":
    main()
