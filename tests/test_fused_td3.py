"""Fused TD3 update (models/fused_td3): packed-layout reference vs the stock
flax/optax update, and the Pallas kernel vs the reference (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.models import TD3Config, TD3Trainer
from space_gym_tpu.models.replay import Transition
from space_gym_tpu.models import fused_td3 as ft


def make_trainer(env_id="GoalContinuous2P-v0"):
    eng = EnvEngine(space_gym_tpu.get_config(env_id))
    cfg = TD3Config(lanes=16, rollout_len=4, replay_rows=8, batch_size=64,
                    updates_per_iter=1, warmup_rows=4)
    return TD3Trainer(eng, cfg)


def rand_batch(key, b, obs_dim, act_dim=2):
    ks = jax.random.split(key, 5)
    return Transition(
        obs=jax.random.normal(ks[0], (b, obs_dim), jnp.float32),
        action=jax.random.uniform(ks[1], (b, act_dim), jnp.float32, minval=-1, maxval=1),
        reward=jax.random.normal(ks[2], (b,), jnp.float32),
        next_obs=jax.random.normal(ks[3], (b, obs_dim), jnp.float32),
        discount=(jax.random.uniform(ks[4], (b,)) > 0.1).astype(jnp.float32),
    )


def test_pack_roundtrip():
    tr = make_trainer()
    st = tr.init(jax.random.key(0))
    packed = ft.pack_params(st.actor_params, st.target_actor_params,
                            st.critic_params, st.target_critic_params)
    actor, tactor, critic, target = ft.unpack_params(
        packed, st.actor_params, st.critic_params)
    for got, want in [(actor, st.actor_params), (tactor, st.target_actor_params),
                      (critic, st.critic_params), (target, st.target_critic_params)]:
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # wmat roundtrip too
    w, v = ft.pack_wmat(packed)
    p2 = ft.unpack_wmat(w, v)
    for a, b in zip(packed, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def flax_update_with_noise(tr, state, batch, noise, lr):
    """models/td3.py::_update_once with explicit smoothing normals."""
    c = tr.cfg

    def critic_loss(cp):
        eps = jnp.clip(c.smooth_std * noise, -c.smooth_clip, c.smooth_clip)
        na = jnp.clip(
            tr.actor.apply(state.target_actor_params, batch.next_obs) + eps,
            -1.0, 1.0)
        q1t, q2t = tr.critic.apply(state.target_critic_params, batch.next_obs, na)
        tq = jax.lax.stop_gradient(
            batch.reward + c.gamma * batch.discount * jnp.minimum(q1t, q2t))
        q1, q2 = tr.critic.apply(cp, batch.obs, batch.action)
        return ((q1 - tq) ** 2 + (q2 - tq) ** 2).mean()

    opt = optax.adam(lr)
    cl, cg = jax.value_and_grad(critic_loss)(state.critic_params)
    upd, copt = opt.update(cg, state.critic_opt)
    critic_params = optax.apply_updates(state.critic_params, upd)

    def actor_loss(ap):
        a = tr.actor.apply(ap, batch.obs)
        q1, _ = tr.critic.apply(critic_params, batch.obs, a)
        return -q1.mean()

    al, ag = jax.value_and_grad(actor_loss)(state.actor_params)
    upd, aopt = opt.update(ag, state.actor_opt)
    new_actor = optax.apply_updates(state.actor_params, upd)

    do_actor = jnp.mod(state.n_updates, c.policy_delay) == 0
    sel = lambda n, o: jax.tree.map(lambda x, y: jnp.where(do_actor, x, y), n, o)
    actor_params = sel(new_actor, state.actor_params)
    aopt = sel(aopt, state.actor_opt)
    pol = lambda t, p: jax.tree.map(
        lambda ti, pi: jnp.where(do_actor, ti * (1 - c.tau) + pi * c.tau, ti), t, p)
    return state._replace(
        actor_params=actor_params,
        target_actor_params=pol(state.target_actor_params, actor_params),
        critic_params=critic_params,
        target_critic_params=pol(state.target_critic_params, critic_params),
        actor_opt=aopt, critic_opt=copt,
        n_updates=state.n_updates + 1,
    ), cl, al


def test_reference_matches_flax_update():
    """3 sequential updates exercise apply (k=0), skip (k=1), apply (k=2)."""
    tr = make_trainer()
    st = tr.init(jax.random.key(0))
    obs_dim, b, lr = tr.obs_dim, 64, tr.cfg.lr
    key = jax.random.key(7)

    packed = ft.pack_params(st.actor_params, st.target_actor_params,
                            st.critic_params, st.target_critic_params)
    adam = ft.adam_init(packed)

    state = st
    for k in range(3):
        kb, kn, key = jax.random.split(key, 3)
        batch = rand_batch(kb, b, obs_dim)
        noise = jax.random.normal(kn, (b, 2), jnp.float32)

        state, cl_f, al_f = flax_update_with_noise(tr, state, batch, noise, lr)
        batches = jax.tree.map(lambda x: x[None], batch)
        packed, adam, cl_p, al_p = ft.update_k_reference(
            packed, adam, batches, noise[None], obs_dim,
            tr.cfg.gamma, tr.cfg.tau, lr,
            tr.cfg.smooth_std, tr.cfg.smooth_clip, tr.cfg.policy_delay)

        np.testing.assert_allclose(float(cl_p[0]), float(cl_f), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(al_p[0]), float(al_f), rtol=2e-4, atol=1e-5)

    actor, tactor, critic, target = ft.unpack_params(
        packed, st.actor_params, st.critic_params)
    for name, got, want in [
        ("actor", actor, state.actor_params),
        ("tactor", tactor, state.target_actor_params),
        ("critic", critic, state.critic_params),
        ("target", target, state.target_critic_params),
    ]:
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=2e-5, err_msg=name)
    assert int(adam.count) == 3 and int(adam.count_a) == 2


def test_kernel_matches_reference_interpret():
    """Pallas kernel (interpret, f32) vs the autodiff reference: K=4 covers
    two delayed and two skipped actor steps; 2 batch tiles."""
    tr = make_trainer()
    st = tr.init(jax.random.key(1))
    obs_dim = tr.obs_dim
    K, B, BT = 4, 64, 32
    kb, kn = jax.random.split(jax.random.key(9))
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[rand_batch(jax.random.fold_in(kb, i), B, obs_dim) for i in range(K)])
    noises = jax.random.normal(kn, (K, B, 2), jnp.float32)

    packed = ft.pack_params(st.actor_params, st.target_actor_params,
                            st.critic_params, st.target_critic_params)
    adam = ft.adam_init(packed)
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr,
            tr.cfg.smooth_std, tr.cfg.smooth_clip, tr.cfg.policy_delay)

    p_ref, ad_ref, cl_ref, al_ref = ft.update_k_reference(
        packed, adam, batches, noises, *args)
    p_k, ad_k, cl_k, al_k = ft.fused_update_k(
        packed, adam, batches, noises, *args, block=BT, interpret=True,
        mm_bf16=False)

    np.testing.assert_allclose(np.asarray(cl_k), np.asarray(cl_ref),
                               rtol=1e-4, atol=1e-5, err_msg="critic loss")
    np.testing.assert_allclose(np.asarray(al_k), np.asarray(al_ref),
                               rtol=1e-3, atol=1e-5, err_msg="actor loss")
    for f in ft.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p_k, f)), np.asarray(getattr(p_ref, f)),
            rtol=2e-4, atol=2e-5, err_msg=f"param {f}")
    assert int(ad_k.count) == int(ad_ref.count) == K
    assert int(ad_k.count_a) == int(ad_ref.count_a) == 2


def test_from_replay_matches_reference_interpret():
    """In-kernel row sampling path (scalar prefetch over the packed ring)."""
    from space_gym_tpu.models.replay import pack_slab, unpack_flat

    tr = make_trainer()
    st = tr.init(jax.random.key(3))
    obs_dim = tr.obs_dim
    K, R, L, BT = 2, 8, 64, 32
    B = 2 * L

    kd, ki, kn = jax.random.split(jax.random.key(21), 3)
    tr_data = Transition(
        obs=jax.random.normal(kd, (R, L, obs_dim), jnp.float32),
        action=jax.random.uniform(jax.random.fold_in(kd, 1), (R, L, 2),
                                  jnp.float32, minval=-1, maxval=1),
        reward=jax.random.normal(jax.random.fold_in(kd, 2), (R, L), jnp.float32),
        next_obs=jax.random.normal(jax.random.fold_in(kd, 3), (R, L, obs_dim),
                                   jnp.float32),
        discount=(jax.random.uniform(jax.random.fold_in(kd, 4), (R, L)) > 0.1
                  ).astype(jnp.float32),
    )
    data = pack_slab(tr_data, obs_dim, 2)
    row_idx = jax.random.randint(ki, (K * 2,), 0, R)
    noises = jax.random.normal(kn, (K, B, 2), jnp.float32)

    packed = ft.pack_params(st.actor_params, st.target_actor_params,
                            st.critic_params, st.target_critic_params)
    adam = ft.adam_init(packed)
    kw = dict(obs_dim=obs_dim, gamma=tr.cfg.gamma, tau=tr.cfg.tau, lr=tr.cfg.lr,
              smooth_std=tr.cfg.smooth_std, smooth_clip=tr.cfg.smooth_clip,
              policy_delay=tr.cfg.policy_delay)

    gathered = unpack_flat(
        jnp.swapaxes(data[row_idx], 1, 2).reshape(K, B, -1), obs_dim, 2)
    p_ref, ad_ref, cl_ref, al_ref = ft.update_k_reference(
        packed, adam, gathered, noises, **kw)

    f = ft.fused_init(packed, adam)
    f2, cl_k, al_k = ft.fused_update_k_wmat(
        f, data, row_idx, noises, block=BT, interpret=True, mm_bf16=False, **kw)
    p_k, ad_k = ft.fused_unpack(f2)

    np.testing.assert_allclose(np.asarray(cl_k), np.asarray(cl_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_k), np.asarray(al_ref),
                               rtol=1e-3, atol=1e-5)
    for fld in ft.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p_k, fld)), np.asarray(getattr(p_ref, fld)),
            rtol=2e-4, atol=2e-5, err_msg=f"param {fld}")
    assert int(ad_k.count_a) == int(ad_ref.count_a) == 1


def test_trainer_fused_smoke():
    """TD3Trainer with fused_updates trains end-to-end (packed-reference path
    on CPU), preserves pytree structure, and tracks the delayed actor count."""
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    cfg = TD3Config(lanes=16, rollout_len=4, replay_rows=16, batch_size=32,
                    updates_per_iter=2, warmup_rows=4, fused_updates=True,
                    fused_block=32)
    tr = TD3Trainer(eng, cfg)
    st = tr.init(jax.random.key(0))
    tpl = jax.tree.structure(st)
    for i in range(5):
        st, m = tr.train_iter(st, jax.random.fold_in(jax.random.key(1), i))
    assert jax.tree.structure(st) == tpl
    vals = {k: float(np.asarray(v)) for k, v in m.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert int(st.fused.count) == 10 == int(st.n_updates)
    assert int(st.fused.count_a) == 5  # delay=2: every other update applied
    a0 = tr.init(jax.random.key(0)).actor_params
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), a0, st.actor_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_kernel_bf16_close_to_reference_interpret():
    """The production bf16 path (matmul inputs + post-relu activations in
    bf16, f32 accumulation/grads) stays within Adam-step-scale error of the
    f32 reference after K=2 updates."""
    tr = make_trainer()
    st = tr.init(jax.random.key(2))
    obs_dim = tr.obs_dim
    K, B, BT = 2, 64, 32
    lr = tr.cfg.lr
    kb, kn = jax.random.split(jax.random.key(11))
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[rand_batch(jax.random.fold_in(kb, i), B, obs_dim) for i in range(K)])
    noises = jax.random.normal(kn, (K, B, 2), jnp.float32)

    packed = ft.pack_params(st.actor_params, st.target_actor_params,
                            st.critic_params, st.target_critic_params)
    adam = ft.adam_init(packed)
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, lr,
            tr.cfg.smooth_std, tr.cfg.smooth_clip, tr.cfg.policy_delay)

    p_ref, *_ = ft.update_k_reference(packed, adam, batches, noises, *args)
    p_k, *_ = ft.fused_update_k(packed, adam, batches, noises, *args,
                                block=BT, interpret=True, mm_bf16=True)
    # Adam turns any sign-consistent gradient-rounding difference into a
    # full lr-scale step on isolated elements; bound K=2 updates by a few
    # steps per element and require the BULK of all parameters unchanged
    # (aggregated — tiny bias vectors legitimately carry a handful of
    # lr-scale outliers).
    all_d = []
    for f in ft.PackedParams._fields:
        d = np.abs(np.asarray(getattr(p_k, f)) - np.asarray(getattr(p_ref, f)))
        assert d.max() <= 2.0 * K * lr, (f, d.max())
        all_d.append(d.ravel())
    all_d = np.concatenate(all_d)
    assert (all_d <= 1e-4).mean() > 0.99, (all_d <= 1e-4).mean()


def test_kernel_sequential_calls_odd_count_interpret():
    """Two sequential kernel calls with K=3: the second starts at n_updates=3
    (odd), exercising the in-kernel delayed-step offset arithmetic
    (off = (-count0) mod delay) and the actor Adam count continuation."""
    tr = make_trainer()
    st = tr.init(jax.random.key(4))
    obs_dim = tr.obs_dim
    K, B, BT = 3, 64, 32
    kb, kn = jax.random.split(jax.random.key(13))
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr,
            tr.cfg.smooth_std, tr.cfg.smooth_clip, tr.cfg.policy_delay)

    packed_r = ft.pack_params(st.actor_params, st.target_actor_params,
                              st.critic_params, st.target_critic_params)
    adam_r = ft.adam_init(packed_r)
    packed_k, adam_k = packed_r, adam_r

    for call in range(2):
        batches = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[rand_batch(jax.random.fold_in(kb, 10 * call + i), B, obs_dim)
              for i in range(K)])
        noises = jax.random.normal(
            jax.random.fold_in(kn, call), (K, B, 2), jnp.float32)
        packed_r, adam_r, _, _ = ft.update_k_reference(
            packed_r, adam_r, batches, noises, *args)
        packed_k, adam_k, _, _ = ft.fused_update_k(
            packed_k, adam_k, batches, noises, *args, block=BT,
            interpret=True, mm_bf16=False)

    # delay=2, updates at n=0..5 -> actor applied at 0,2,4
    assert int(adam_k.count) == int(adam_r.count) == 6
    assert int(adam_k.count_a) == int(adam_r.count_a) == 3
    for f in ft.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(packed_k, f)), np.asarray(getattr(packed_r, f)),
            rtol=3e-4, atol=3e-5, err_msg=f"param {f}")


def test_width512_kernel_matches_reference_interpret():
    """build(512) TD3 twin of the SAC width test (VERDICT r3 item 4)."""
    ft512 = ft.build(512)
    assert ft512.WROWS == 3848 and ft.build(256).WROWS == ft.WROWS
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = TD3Trainer(eng, TD3Config(
        lanes=8, rollout_len=4, replay_rows=8, batch_size=32,
        updates_per_iter=2, warmup_rows=2, hidden=(512, 512),
        fused_updates=True, fused_block=32))
    st = tr.init(jax.random.key(0))
    assert st.fused.w.shape == (3848, 512)

    obs_dim = tr.obs_dim
    K, B = 2, 32
    kb, kn = jax.random.split(jax.random.key(9))
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[rand_batch(jax.random.fold_in(kb, k), B, obs_dim) for k in range(K)],
    )
    noises = jax.random.normal(kn, (K, B, 2), jnp.float32)
    packed = ft512.pack_params(st.actor_params, st.target_actor_params,
                               st.critic_params, st.target_critic_params)
    adam = ft.adam_init(packed)
    c = tr.cfg
    args = (obs_dim, c.gamma, c.tau, c.lr, c.smooth_std,
            c.smooth_clip, c.policy_delay)
    p_ref, ad_ref, cl_ref, al_ref = ft512.update_k_reference(
        packed, adam, batches, noises, *args)
    p_k, ad_k, cl_k, al_k = ft512.fused_update_k(
        packed, adam, batches, noises, *args, block=32, interpret=True,
        mm_bf16=False)
    np.testing.assert_allclose(np.asarray(cl_k), np.asarray(cl_ref),
                               rtol=1e-4, atol=1e-5)
    for f in ft.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p_k, f)), np.asarray(getattr(p_ref, f)),
            rtol=2e-4, atol=2e-5, err_msg=f"param {f}")
