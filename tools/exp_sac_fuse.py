#!/usr/bin/env python
"""A/B experiments for fusing SAC updates (throwaway; informs models/sac.py).

Variants, all at the flagship config (lanes 2048, rollout 8, K=32 updates,
batch 8192):
  A: current unrolled per-update loop (baseline)
  B: lax.scan over K updates, one bulk replay gather for all K minibatches
  C: B + single flat-vector adam per net (ravel_pytree) instead of per-leaf
  D: C + polyak folded into the scanned update
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.models import SACConfig, SACTrainer
from space_gym_tpu.models.replay import replay_sample


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="BC", help="subset of A/B/C to run")
    args = ap.parse_args()
    physics = "pallas" if jax.default_backend() == "tpu" else "fixed"
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"), physics=physics)
    cfg = SACConfig(lanes=2048, rollout_len=8, updates_per_iter=32, batch_size=8192)
    tr = SACTrainer(eng, cfg)
    state = tr.init(jax.random.key(0))
    key = jax.random.key(1)
    for i in range(8):
        state, _ = tr.train_iter(state, jax.random.fold_in(key, i))

    K, B = cfg.updates_per_iter, cfg.batch_size

    # ---- A: baseline unrolled ----
    def upd_A(s, k):
        if "A" not in args.variant:
            return None
        for i in range(K):
            k, ki = jax.random.split(k)
            s, m = tr._update_once(s, ki)
        return s, m

    tA = 27.0e-3
    if "A" in args.variant:
        tA = timeit(jax.jit(upd_A), state, key)
        print(f"A unrolled loop          : {tA*1e3:7.2f} ms ({tA/K*1e3:.3f} ms/update)", flush=True)

    # ---- B: scan + bulk gather ----
    def upd_B(s, k):
        k_samp, k_scan = jax.random.split(k)
        big = replay_sample(s.replay, k_samp, K * B)
        batches = jax.tree.map(lambda x: x.reshape(K, B, *x.shape[1:]), big)

        def body(carry, xs):
            st = carry
            batch, ki = xs
            st, m = _update_with_batch(tr, st, batch, ki)
            return st, m

        keys = jax.random.split(k_scan, K)
        s2, ms = jax.lax.scan(body, s, (batches, keys))
        return s2, ms

    tB = float("nan")
    if "B" in args.variant:
        tB = timeit(jax.jit(upd_B), state, key)
        print(f"B scan + bulk gather     : {tB*1e3:7.2f} ms ({tB/K*1e3:.3f} ms/update)", flush=True)

    # ---- C: B + flat adam ----
    flat_actor, unr_actor = ravel_pytree(state.actor_params)
    flat_critic, unr_critic = ravel_pytree(state.critic_params)
    adam = optax.adam(cfg.lr)

    def upd_C(s, k):
        k_samp, k_scan = jax.random.split(k)
        big = replay_sample(s.replay, k_samp, K * B)
        batches = jax.tree.map(lambda x: x.reshape(K, B, *x.shape[1:]), big)

        ao = adam.init(flat_actor)
        co = adam.init(flat_critic)
        alo = adam.init(s.log_alpha)
        carry0 = (
            ravel_pytree(s.actor_params)[0],
            ravel_pytree(s.critic_params)[0],
            ravel_pytree(s.target_critic_params)[0],
            s.log_alpha, ao, co, alo,
        )

        def body(carry, xs):
            fa, fc, ft, la, ao, co, alo = carry
            batch, ki = xs
            k_c, k_a = jax.random.split(ki)
            ap = unr_actor(fa)
            alpha = jnp.exp(la)

            def closs(fc_):
                cp = unr_critic(fc_)
                mean, log_std = tr.actor.apply(ap, batch.next_obs)
                import space_gym_tpu.models.networks as networks
                na, nlp = networks.sample_tanh_gaussian(k_c, mean, log_std)
                q1t, q2t = tr.critic.apply(unr_critic(ft), batch.next_obs, na)
                tv = jnp.minimum(q1t, q2t) - alpha * nlp
                tq = jax.lax.stop_gradient(batch.reward + cfg.gamma * batch.discount * tv)
                q1, q2 = tr.critic.apply(cp, batch.obs, batch.action)
                return ((q1 - tq) ** 2 + (q2 - tq) ** 2).mean()

            cl, cg = jax.value_and_grad(closs)(fc)
            cupd, co = adam.update(cg, co)
            fc = optax.apply_updates(fc, cupd)

            def aloss(fa_):
                import space_gym_tpu.models.networks as networks
                mean, log_std = tr.actor.apply(unr_actor(fa_), batch.obs)
                a, lp = networks.sample_tanh_gaussian(k_a, mean, log_std)
                q1, q2 = tr.critic.apply(unr_critic(fc), batch.obs, a)
                return (alpha * lp - jnp.minimum(q1, q2)).mean(), lp

            (al, lp), ag = jax.value_and_grad(aloss, has_aux=True)(fa)
            aupd, ao = adam.update(ag, ao)
            fa = optax.apply_updates(fa, aupd)

            agrad = (-jnp.exp(la) * jax.lax.stop_gradient(lp + tr.target_entropy)).mean()
            agrad = jax.grad(lambda la_: (-la_ * jax.lax.stop_gradient(lp + tr.target_entropy)).mean())(la)
            alupd, alo = adam.update(agrad, alo)
            la = optax.apply_updates(la, alupd)

            ft = ft * (1 - cfg.tau) + fc * cfg.tau
            return (fa, fc, ft, la, ao, co, alo), (cl, al)

        keys = jax.random.split(k_scan, K)
        carry, ms = jax.lax.scan(body, carry0, (batches, keys))
        return carry, ms

    tC = float("nan")
    if "C" in args.variant:
        tC = timeit(jax.jit(upd_C), state, key)
        print(f"C + flat adam/polyak     : {tC*1e3:7.2f} ms ({tC/K*1e3:.3f} ms/update)", flush=True)

    steps = cfg.lanes * cfg.rollout_len
    t_roll = 1.9e-3
    for name, t in [("A", tA), ("B", tB), ("C", tC)]:
        print(f"  projected end-to-end {name}: {steps/(t+t_roll)/1e6:6.2f}M env-steps/s")


def _update_with_batch(tr, state, batch, key):
    """tr._update_once but with a presampled batch."""
    c = tr.cfg
    k_crit, k_act = jax.random.split(key)

    critic_loss, critic_grads = jax.value_and_grad(tr._critic_loss)(
        state.critic_params, state, batch, k_crit
    )
    upd, critic_opt = tr.opt.update(critic_grads, state.critic_opt)
    critic_params = optax.apply_updates(state.critic_params, upd)

    (actor_loss, logp), actor_grads = jax.value_and_grad(
        tr._actor_loss, has_aux=True
    )(state.actor_params, state, critic_params, batch, k_act)
    upd, actor_opt = tr.opt.update(actor_grads, state.actor_opt)
    actor_params = optax.apply_updates(state.actor_params, upd)

    alpha_grad = jax.grad(
        lambda la: (-la * jax.lax.stop_gradient(logp + tr.target_entropy)).mean()
    )(state.log_alpha)
    upd, alpha_opt = tr.opt.update(alpha_grad, state.alpha_opt)
    log_alpha = optax.apply_updates(state.log_alpha, upd)

    target = jax.tree.map(
        lambda t, p: t * (1 - c.tau) + p * c.tau,
        state.target_critic_params, critic_params,
    )
    return state._replace(
        actor_params=actor_params, critic_params=critic_params,
        target_critic_params=target, log_alpha=log_alpha,
        actor_opt=actor_opt, critic_opt=critic_opt, alpha_opt=alpha_opt,
    ), {"critic_loss": critic_loss, "actor_loss": actor_loss}


if __name__ == "__main__":
    main()
