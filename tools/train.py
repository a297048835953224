#!/usr/bin/env python
"""On-device training CLI: SAC/TD3 on any registered env, with checkpointing,
deterministic eval, and a steps/sec meter.

The reference shipped no trainer (users ran external SB3/rl-zoo, reference
README.md:57-59); this CLI is the built-in replacement covering the
BASELINE.json configs[4] workload.

Examples:
  python tools/train.py --env GoalContinuous2P-v0 --algo sac --iters 500
  python tools/train.py --env KeplerCircleOrbit-v0 --algo td3 --lanes 8192
  python tools/train.py ... --ckpt /tmp/run1 --resume
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_eval(trainer, n_steps: int, lanes: int = 256):
    """Deterministic-policy eval over fresh lanes: summed completed-episode
    returns + episode count, fully on device."""
    import jax
    import jax.numpy as jnp

    eng = trainer.engine

    def run(params, key):
        k_reset, k0 = jax.random.split(key)
        state, obs = eng._reset_batched(k_reset, lanes)

        def body(carry, _):
            st, ob, k, run_ret, done_sum, done_n = carry
            k, k_step = jax.random.split(k)
            action = trainer.eval_act(params, ob)
            st, ts = eng._step_batched(st, action, k_step)
            run_ret = run_ret + ts.reward
            done_sum = done_sum + jnp.sum(jnp.where(ts.done, run_ret, 0.0))
            done_n = done_n + jnp.sum(ts.done)
            run_ret = jnp.where(ts.done, 0.0, run_ret)
            return (st, ts.obs, k, run_ret, done_sum, done_n), None

        init = (
            state, obs, k0,
            jnp.zeros((lanes,), eng.dtype), jnp.asarray(0.0), jnp.asarray(0.0),
        )
        (_, _, _, _, done_sum, done_n), _ = jax.lax.scan(body, init, None, length=n_steps)
        return done_sum, done_n

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="GoalContinuous2P-v0")
    ap.add_argument("--algo", choices=["sac", "td3", "dqn", "ppo"], default="sac")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--rollout-len", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--updates-per-iter", type=int, default=4)
    ap.add_argument("--replay-rows", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--hidden", type=int, default=256,
                    help="MLP hidden width (two layers).  The fused SAC/TD3 "
                         "kernels support any multiple of 128 "
                         "(models/fused_sac.build)")
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--n-step", type=int, default=1,
                    help="SAC: n-step TD targets computed inside the rollout slab")
    ap.add_argument("--alpha-floor", type=float, default=0.0,
                    help="SAC: lower bound on the entropy temperature")
    ap.add_argument("--reward-scale", type=float, default=1.0,
                    help="SAC: reward multiplier entering the replay buffer")
    ap.add_argument("--target-entropy", type=float, default=None,
                    help="SAC: entropy target for the temperature loss "
                         "(default -dim(A); precision tasks want lower)")
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction, default=None,
                    help="SAC/TD3: run all K updates as one Pallas kernel "
                         "(models/fused_sac|fused_td3; packed-jax fallback "
                         "off TPU).  Default: on for td3 (TPU-ladder-verified "
                         "3.17M env-steps/s vs 1.76M unfused), off for sac "
                         "(opt in with --fused); --no-fused opts out.")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--eval-steps", type=int, default=600)
    ap.add_argument("--until-return", type=float, default=None,
                    help="stop (after saving the checkpoint) once an eval "
                         "mean return reaches this value")
    ap.add_argument("--ckpt", default=None, help="checkpoint directory")
    ap.add_argument("--ckpt-full-every", type=int, default=1,
                    help="save the checkpoint every Nth eval instead of every "
                         "eval.  The full state includes the replay ring "
                         "(rows x W x lanes, ~0.7 GB at the flagship config), "
                         "whose device->host pull through the axon tunnel "
                         "costs ~30 s — at --eval-every 100 that is 5-50x the "
                         "device time of the 100 iterations themselves.  "
                         "Outage recovery loses at most N evals of progress.")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log-every", type=int, default=5)
    ap.add_argument("--scan-chunk", type=int, default=25,
                    help="SAC: iterations per device program (lax.scan); "
                         "amortizes per-dispatch tunnel latency")
    ap.add_argument("--physics", default=None,
                    help="engine physics mode; default: pallas on TPU, fixed elsewhere")
    ap.add_argument("--obs-features", default=None, choices=["kepler", "goal", "dnc"],
                    help="append analytic obs features at the engine boundary "
                         "(kepler: orbit-error terms, see "
                         "kepler_math.error_features; goal: goal/danger/border "
                         "geometry, see goal_math.goal_features).  Changes "
                         "obs_dim, so checkpoints are format-compatible only "
                         "with runs using the same flag "
                         "(tools/restore_learner.py --obs-features "
                         "--from-obs-dim migrates old learners).")
    args = ap.parse_args()
    if args.fused is None:
        # TD3's fused kernel is the measured-on-TPU default (round 3);
        # SAC stays opt-in so existing run scripts keep their exact behavior.
        args.fused = args.algo == "td3"

    import jax

    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.models import (
        DQNConfig, DQNTrainer, PPOConfig, PPOTrainer, SACConfig, SACTrainer,
        TD3Config, TD3Trainer,
    )
    from space_gym_tpu.utils import checkpoint as ckpt
    from space_gym_tpu.utils.profiling import ThroughputMeter

    physics = args.physics or ("pallas" if jax.default_backend() == "tpu" else "fixed")
    eng = EnvEngine(space_gym_tpu.get_config(args.env), physics=physics,
                    obs_features=args.obs_features)
    kw = dict(
        lanes=args.lanes,
        rollout_len=args.rollout_len,
        replay_rows=args.replay_rows,
        batch_size=args.batch_size,
        updates_per_iter=args.updates_per_iter,
        lr=args.lr,
        hidden=(args.hidden, args.hidden),
    )
    if args.algo == "sac":
        trainer = SACTrainer(eng, SACConfig(
            **kw, gamma=args.gamma, n_step=args.n_step,
            alpha_floor=args.alpha_floor, reward_scale=args.reward_scale,
            target_entropy=args.target_entropy,
            fused_updates=args.fused,
            fused_block=min(2048, args.batch_size),
        ))
    elif args.algo == "ppo":
        trainer = PPOTrainer(eng, PPOConfig(
            lanes=args.lanes, rollout_len=args.rollout_len, lr=args.lr,
            gamma=args.gamma))
    elif args.algo == "td3":
        trainer = TD3Trainer(eng, TD3Config(
            **kw, fused_updates=args.fused,
            fused_block=min(2048, args.batch_size)))
    else:
        trainer = DQNTrainer(eng, DQNConfig(**kw))

    state = trainer.init(jax.random.key(args.seed))
    if args.resume and args.ckpt and os.path.exists(args.ckpt):
        # Orbax restores require a template matching the SAVED format, so try
        # the known formats in order (same-format first).  This lets every
        # run mode read every checkpoint format: fused <-> unfused (bridged
        # below) and pre-FusedState saves.
        def _try(tpl):
            try:
                return ckpt.restore(args.ckpt, tpl)
            except Exception:
                return None

        restored = _try(state)
        if restored is None and args.algo in ("sac", "td3"):
            if state.fused is not None:
                # fused run reading an unfused-format save (fused=None slot)
                restored = _try(state._replace(fused=None))
            else:
                # unfused run reading a fused-format save
                restored = _try(trainer.migrate_to_fused(state))
            if restored is None:
                # pre-FusedState save (no `fused` key at all): the optax
                # states carry the Adam moments
                tpl = {f: getattr(state, f) for f in state._fields if f != "fused"}
                flax_only = _try(tpl)
                if flax_only is not None:
                    restored = state._replace(fused=None, **flax_only)
        if restored is None:
            raise SystemExit(
                f"checkpoint {args.ckpt} does not match any known format")
        state = restored
        # Replay rings saved before the ones-row fold (models/replay.py:
        # replay_ones_row) carry zeros in that padding row; the fused kernels
        # now contract it as the first-layer bias input, so stamp it to 1.0
        # (idempotent for new-format checkpoints, harmless for unwritten rows).
        if hasattr(state, "replay"):
            from space_gym_tpu.models.replay import replay_ones_row

            orow = replay_ones_row(state.replay.obs_dim, state.replay.action_dim)
            state = state._replace(replay=state.replay._replace(
                data=state.replay.data.at[:, orow, :].set(1.0)))
        # Cross-format bridges (both directions, SAC and TD3):
        #  - fused run resuming a flax-only checkpoint -> rebuild the
        #    kernel-layout state from the flax/optax snapshot;
        #  - UNfused run resuming a fused checkpoint -> re-hydrate the flax
        #    params/moments from the fused state (in fused mode the flax
        #    critic/opt fields freeze at init; resuming from them would
        #    silently restart the critics while keeping the trained actor).
        if args.algo in ("sac", "td3"):
            if args.fused and state.fused is None:
                state = trainer.migrate_to_fused(state)
                print("migrated flax checkpoint to fused kernel layout")
            elif not args.fused and state.fused is not None:
                state = trainer.rehydrate_from_fused(state)
                print("re-hydrated flax params/moments from fused checkpoint")
        print(f"resumed from {args.ckpt} at step {int(np.asarray(state.step))}")

    meter = ThroughputMeter()
    steps_per_iter = args.lanes * args.rollout_len
    key = jax.random.key(args.seed + 1)
    if args.algo in ("dqn", "ppo"):
        eval_params = lambda st: st.params
    else:
        eval_params = lambda st: st.actor_params

    def save_learner_npz(path, st, **extra):
        """Compact learner snapshot — milliseconds vs ~30 s for the full
        state with the 0.7 GB replay ring.  Fused trainers save the kernel
        layout (the format tools/restore_learner.py rebuilds a resumable
        checkpoint from); params-based trainers (DQN/PPO, unfused SAC/TD3)
        save flattened flax params ("p:<path>" keys, replayable via
        examples/run_agent.py)."""
        fused = getattr(st, "fused", None)
        if fused is not None:
            arrs = {f: np.asarray(getattr(fused, f)) for f in fused._fields}
        else:
            params = getattr(st, "params", None) or getattr(
                st, "actor_params", None)
            if params is None:
                return False
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            arrs = {"p:" + jax.tree_util.keystr(kp): np.asarray(leaf)
                    for kp, leaf in flat}
        if hasattr(st, "log_alpha"):
            arrs["log_alpha"] = np.asarray(st.log_alpha)
        arrs["step"] = np.asarray(st.step)
        # Provenance for consumers (restore_learner.py / run_agent.py):
        # a wrong --from-obs-dim / --obs-features would otherwise silently
        # mis-slice the packed learner instead of erroring (ADVICE r3).
        arrs["obs_dim"] = np.asarray(eng.obs_dim)
        arrs["obs_features"] = np.asarray(args.obs_features or "")
        arrs["env_id"] = np.asarray(args.env)
        arrs.update({k: np.asarray(v) for k, v in extra.items()})
        np.savez(path + ".tmp", **arrs)
        os.replace(path + ".tmp.npz", path)
        return True

    # Best-eval learner retention: the Kepler eval curve oscillates (the
    # reference's own SB3 curves do too, imgs/KeplerCircleOrbit-v0__sac.png),
    # so the FINAL checkpoint of a long run can be far below its best.
    best_path = (args.ckpt.rstrip("/") + ".best.npz") if args.ckpt else None
    best_ret = -float("inf")
    if args.resume and best_path and os.path.exists(best_path):
        with np.load(best_path) as z:
            if "eval_return" in z:
                best_ret = float(z["eval_return"])
        print(f"best-so-far eval {best_ret:.2f} ({best_path})")

    eval_run = None
    # SAC exposes train_iters (n iterations scanned into ONE device program);
    # each dispatch through the axon tunnel costs ~1-3 ms, which is >30% of a
    # fused train_iter.  Chunks end exactly on log/eval boundaries.
    has_scan = hasattr(trainer, "train_iters") and args.scan_chunk > 1
    # Metrics pipeline: syncing every chunk leaves the device idle for the
    # ~60 ms fetch round-trip (~25% of a 220 ms chunk).  Instead dispatch
    # chunk k+1 first, then sync chunk k — at most two programs in flight
    # (bounded enqueue through the tunnel), fetch latency hidden behind
    # device execution.  Boundaries (log/eval/end) drain fully.
    pending = None  # (metrics, env_steps) of the previously dispatched chunk
    i = 0
    while i < args.iters:
        nb = ((i // args.log_every) + 1) * args.log_every
        if args.eval_every:
            nb = min(nb, ((i // args.eval_every) + 1) * args.eval_every)
        nb = min(nb, args.iters)
        n = max(1, min(args.scan_chunk, nb - i)) if has_scan else 1
        key, k_iter = jax.random.split(key)
        if n > 1:
            state, metrics = trainer.train_iters(state, k_iter, n=n)
        else:
            state, metrics = trainer.train_iter(state, k_iter)
        i += n
        if pending is not None:
            _ = float(np.asarray(pending[0]["mean_reward"]))  # sync k-1
            meter.tick(pending[1])
            pending = None
        boundary = (
            i % args.log_every == 0 or i >= args.iters
            or (args.eval_every and i % args.eval_every == 0)
        )
        if not boundary:
            pending = (metrics, n * steps_per_iter)
            continue
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}  # sync k
        meter.tick(n * steps_per_iter)
        if i % args.log_every == 0 or i >= args.iters:
            print(
                json.dumps(
                    dict(iter=i, env_steps=i * steps_per_iter,
                         steps_per_s=round(meter.rate, 0) if meter.rate == meter.rate else None,
                         **{k: round(v, 4) for k, v in m.items()})
                ),
                flush=True,
            )
        if args.eval_every and i % args.eval_every == 0:
            if eval_run is None:
                eval_run = make_eval(trainer, args.eval_steps)
            key, k_ev = jax.random.split(key)
            ret_sum, ret_n = eval_run(eval_params(state), k_ev)
            ret_sum, ret_n = float(np.asarray(ret_sum)), float(np.asarray(ret_n))
            mean_ret = ret_sum / max(ret_n, 1.0)
            print(json.dumps(dict(iter=i, eval_mean_return=round(mean_ret, 2),
                                  eval_episodes=int(ret_n))), flush=True)
            if best_path and mean_ret > best_ret:
                best_ret = mean_ret
                if save_learner_npz(best_path, state,
                                    eval_return=mean_ret, eval_iter=i):
                    print(json.dumps(dict(iter=i, best_learner=best_path,
                                          eval_mean_return=round(mean_ret, 2))),
                          flush=True)
            n_evals = i // args.eval_every
            if args.ckpt and n_evals % max(1, args.ckpt_full_every) == 0:
                ckpt.save(args.ckpt, state)
                print(json.dumps(dict(iter=i, checkpoint=args.ckpt)), flush=True)
            if args.until_return is not None and mean_ret >= args.until_return:
                print(json.dumps(dict(iter=i, target_return=args.until_return,
                                      reached=True)), flush=True)
                break

    if args.ckpt:
        ckpt.save(args.ckpt, state)
        print(json.dumps(dict(checkpoint=args.ckpt, final=True)), flush=True)


if __name__ == "__main__":
    main()
