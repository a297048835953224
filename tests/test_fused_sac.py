"""Fused SAC update (models/fused_sac): packed-layout reference vs the stock
flax/optax update, and the Pallas kernel vs the reference (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.models import SACConfig, SACTrainer, networks
from space_gym_tpu.models.replay import Transition
from space_gym_tpu.models import fused_sac as fs


def make_trainer(env_id="GoalContinuous2P-v0"):
    eng = EnvEngine(space_gym_tpu.get_config(env_id))
    cfg = SACConfig(lanes=16, rollout_len=4, replay_rows=8, batch_size=64,
                    updates_per_iter=1, warmup_rows=4)
    return SACTrainer(eng, cfg)


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
    packed = fs.pack_params(st.actor_params, st.critic_params,
                            st.target_critic_params, st.log_alpha)
    actor, critic, target, la = fs.unpack_params(
        packed, st.actor_params, st.critic_params)
    for a, b in zip(jax.tree.leaves(actor), jax.tree.leaves(st.actor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(critic), jax.tree.leaves(st.critic_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(la) == float(st.log_alpha)


def flax_update_with_noise(tr, state, batch, noise, lr):
    """_update_once with explicit normals instead of PRNG keys — the stock
    semantics the packed/fused paths must reproduce."""
    c = tr.cfg
    alpha = jnp.exp(state.log_alpha)

    def sample(mean, log_std, eps):
        std = jnp.exp(log_std)
        pre = mean + std * eps
        a = jnp.tanh(pre)
        logp = -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        logp = logp - 2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre))
        return a, logp.sum(-1)

    def critic_loss(cp):
        mean, log_std = tr.actor.apply(state.actor_params, batch.next_obs)
        na, nlogp = sample(mean, log_std, noise[:, 0])
        q1t, q2t = tr.critic.apply(state.target_critic_params, batch.next_obs, na)
        tq = batch.reward + c.gamma * batch.discount * (
            jnp.minimum(q1t, q2t) - alpha * nlogp)
        tq = jax.lax.stop_gradient(tq)
        q1, q2 = tr.critic.apply(cp, batch.obs, batch.action)
        return ((q1 - tq) ** 2 + (q2 - tq) ** 2).mean()

    opt = optax.adam(lr)
    cl, cg = jax.value_and_grad(critic_loss)(state.critic_params)
    upd, copt = opt.update(cg, state.critic_opt)
    critic_params = optax.apply_updates(state.critic_params, upd)

    def actor_loss(ap):
        mean, log_std = tr.actor.apply(ap, batch.obs)
        a, logp = sample(mean, log_std, noise[:, 1])
        q1, q2 = tr.critic.apply(critic_params, batch.obs, a)
        return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

    (al, logp), ag = jax.value_and_grad(actor_loss, has_aux=True)(state.actor_params)
    upd, aopt = opt.update(ag, state.actor_opt)
    actor_params = optax.apply_updates(state.actor_params, upd)

    g_la = -(jnp.mean(logp) + tr.target_entropy)
    upd, alopt = opt.update(g_la, state.alpha_opt)
    log_alpha = state.log_alpha + upd

    target = jax.tree.map(
        lambda t, p: t * (1 - c.tau) + p * c.tau,
        state.target_critic_params, critic_params)
    return state._replace(
        actor_params=actor_params, critic_params=critic_params,
        target_critic_params=target, log_alpha=log_alpha,
        critic_opt=copt, actor_opt=aopt, alpha_opt=alopt,
    ), cl, al


def test_reference_matches_flax_update():
    tr = make_trainer()
    st = tr.init(jax.random.key(0))
    obs_dim = tr.obs_dim
    b = 64
    lr = tr.cfg.lr
    key = jax.random.key(7)
    packed = fs.pack_params(st.actor_params, st.critic_params,
                            st.target_critic_params, st.log_alpha)
    adam = fs.adam_init(packed)

    state = st
    for k in range(2):  # two sequential updates: exercises adam count + polyak
        kb, kn, key = jax.random.split(key, 3)
        batch = rand_batch(kb, b, obs_dim)
        noise = jax.random.normal(kn, (b, 2, 2), jnp.float32)

        state, cl_f, al_f = flax_update_with_noise(tr, state, batch, noise, lr)
        batches = jax.tree.map(lambda x: x[None], batch)
        packed, adam, cl_p, al_p = fs.update_k_reference(
            packed, adam, batches, noise[None], obs_dim,
            tr.cfg.gamma, tr.cfg.tau, lr, tr.target_entropy)

        np.testing.assert_allclose(float(cl_p[0]), float(cl_f), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(al_p[0]), float(al_f), rtol=2e-4, atol=1e-5)

    actor, critic, target, la = fs.unpack_params(
        packed, st.actor_params, st.critic_params)
    for name, got, want in [
        ("actor", actor, state.actor_params),
        ("critic", critic, state.critic_params),
        ("target", target, state.target_critic_params),
    ]:
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=2e-5,
                err_msg=name)
    np.testing.assert_allclose(float(la), float(state.log_alpha), atol=1e-6)


def test_trainer_fused_smoke():
    """SACTrainer with fused_updates trains end-to-end (packed-reference path
    on CPU) and preserves the state pytree structure (checkpoint compat)."""
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    cfg = SACConfig(lanes=16, rollout_len=4, replay_rows=16, batch_size=32,
                    updates_per_iter=2, warmup_rows=4, fused_updates=True,
                    fused_block=32, alpha_floor=1e-3)
    tr = SACTrainer(eng, cfg)
    st = tr.init(jax.random.key(0))
    tpl = jax.tree.structure(st)
    for i in range(5):
        st, m = tr.train_iter(st, jax.random.fold_in(jax.random.key(1), i))
    assert jax.tree.structure(st) == tpl
    vals = {k: float(np.asarray(v)) for k, v in m.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert float(np.asarray(jnp.exp(st.log_alpha))) >= 1e-3 - 1e-9
    # warmup fills after iter 1's insert, so all 5 iters' K=2 updates count
    # (the canonical learner state is st.fused; flax opt fields are a
    # frozen init snapshot in fused mode)
    assert int(st.fused.count) == 5 * 2
    # params actually moved
    a0 = tr.init(jax.random.key(0)).actor_params
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), a0, st.actor_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_kernel_sequential_calls_interpret():
    """Two sequential kernel calls (K=2 each) track the reference over all 4
    updates — params AND Adam moments.  This is the oracle for the
    first-layer bias fold's copy-in/copy-out: biases and their moments must
    round-trip between the canonical vec rows and the working w rows across
    kernel invocations without loss or leakage into the padded rows."""
    tr = make_trainer()
    st = tr.init(jax.random.key(5))
    obs_dim = tr.obs_dim
    K, B, BT = 2, 64, 32
    kb, kn = jax.random.split(jax.random.key(17))
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr, tr.target_entropy)

    packed_r = fs.pack_params(st.actor_params, st.critic_params,
                              st.target_critic_params, st.log_alpha)
    adam_r = fs.adam_init(packed_r)
    packed_k, adam_k = packed_r, adam_r

    for call in range(2):
        batches = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[rand_batch(jax.random.fold_in(kb, 10 * call + i), B, obs_dim)
              for i in range(K)])
        noises = jax.random.normal(
            jax.random.fold_in(kn, call), (K, B, 2, 2), jnp.float32)
        packed_r, adam_r, _, _ = fs.update_k_reference(
            packed_r, adam_r, batches, noises, *args)
        packed_k, adam_k, _, _ = fs.fused_update_k(
            packed_k, adam_k, batches, noises, *args, block=BT,
            interpret=True, mm_bf16=False)

    assert int(adam_k.count) == int(adam_r.count) == 4
    for f in fs.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(packed_k, f)), np.asarray(getattr(packed_r, f)),
            rtol=3e-4, atol=3e-5, err_msg=f"param {f}")
        np.testing.assert_allclose(
            np.asarray(getattr(adam_k.m, f)), np.asarray(getattr(adam_r.m, f)),
            rtol=3e-4, atol=3e-5, err_msg=f"adam.m {f}")
    # padded-rows-are-zero invariant survives the fold (bias rows re-zeroed)
    for f in ("a_w1", "c_w1", "t_w1"):
        pad = np.asarray(getattr(packed_k, f))[..., obs_dim + 2 :, :]
        np.testing.assert_array_equal(pad, np.zeros_like(pad), err_msg=f)


@pytest.mark.parametrize("fold", [False, True], ids=["grid_k2t", "fold_k"])
def test_kernel_matches_reference_interpret(fold):
    """The Pallas kernel (interpret mode) reproduces the autodiff reference:
    K=2 updates, 2 batch tiles, all params + adam moments + losses.  Both
    grid schedules — the legacy (K,2,T) and the folded (K,) one-step-per-
    update schedule (VERDICT r4 item 3) — are pinned to the same oracle."""
    tr = make_trainer()
    st = tr.init(jax.random.key(1))
    obs_dim = tr.obs_dim
    K, B, BT = 2, 64, 32
    key = jax.random.key(9)
    kb, kn = jax.random.split(key)
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[rand_batch(jax.random.fold_in(kb, k), B, obs_dim) for k in range(K)],
    )
    noises = jax.random.normal(kn, (K, B, 2, 2), jnp.float32)

    packed = fs.pack_params(st.actor_params, st.critic_params,
                            st.target_critic_params, st.log_alpha)
    adam = fs.adam_init(packed)
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr, tr.target_entropy)

    p_ref, ad_ref, cl_ref, al_ref = fs.update_k_reference(
        packed, adam, batches, noises, *args)
    # mm_bf16=False: the correctness tier checks exact f32 math; the bf16
    # matmul mode is a TPU throughput option validated by the looser test below.
    p_k, ad_k, cl_k, al_k = fs.fused_update_k(
        packed, adam, batches, noises, *args, block=BT, interpret=True,
        mm_bf16=False, fold=fold)

    np.testing.assert_allclose(np.asarray(cl_k), np.asarray(cl_ref),
                               rtol=1e-4, atol=1e-5, err_msg="critic loss")
    np.testing.assert_allclose(np.asarray(al_k), np.asarray(al_ref),
                               rtol=1e-3, atol=1e-5, err_msg="actor loss")
    for f in fs.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p_k, f)), np.asarray(getattr(p_ref, f)),
            rtol=2e-4, atol=2e-5, err_msg=f"param {f}")
        np.testing.assert_allclose(
            np.asarray(getattr(ad_k.m, f)), np.asarray(getattr(ad_ref.m, f)),
            rtol=2e-3, atol=2e-5, err_msg=f"adam m {f}")
    assert int(ad_k.count) == int(ad_ref.count) == K


def test_kernel_bf16_close_to_reference_interpret():
    """bf16-matmul mode stays within mixed-precision tolerance of the f32
    reference after one update."""
    tr = make_trainer()
    st = tr.init(jax.random.key(2))
    obs_dim = tr.obs_dim
    B = 64
    kb, kn = jax.random.split(jax.random.key(11))
    batches = jax.tree.map(lambda x: x[None], rand_batch(kb, B, obs_dim))
    noises = jax.random.normal(kn, (1, B, 2, 2), jnp.float32)
    packed = fs.pack_params(st.actor_params, st.critic_params,
                            st.target_critic_params, st.log_alpha)
    adam = fs.adam_init(packed)
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr, tr.target_entropy)
    p_ref, _, cl_ref, _ = fs.update_k_reference(packed, adam, batches, noises, *args)
    p_k, _, cl_k, _ = fs.fused_update_k(
        packed, adam, batches, noises, *args, block=32, interpret=True,
        mm_bf16=True)
    np.testing.assert_allclose(float(cl_k[0]), float(cl_ref[0]), rtol=0.05)
    # One Adam step moves each weight by at most ~lr; bf16 can flip the sign
    # of a near-zero gradient, so the worst-case per-element deviation is
    # ~2*lr.  Assert that bound plus near-total agreement at tighter atol.
    lr = tr.cfg.lr
    for f in ("a_w1", "c_w1", "log_alpha"):
        d = np.abs(np.asarray(p_k._asdict()[f]) - np.asarray(p_ref._asdict()[f]))
        assert d.max() <= 2.5 * lr, (f, d.max())
        assert (d <= 1e-4).mean() > 0.99, (f, (d <= 1e-4).mean())


@pytest.mark.parametrize("fold", [False, True], ids=["grid_k2t", "fold_k"])
def test_from_replay_matches_reference_interpret(fold):
    """fused_update_k_from_replay (in-kernel row sampling) reproduces
    gather -> update_k_reference exactly: same rows, same math.
    Uses rows=8, lanes=64, B=128 (2 replay rows per minibatch, 2 lane tiles
    per row) so every index-map case (k, t//tpr, t%tpr) is exercised.
    fold=True additionally exercises the manual double-buffered row DMA
    (_make_kernel_fold ring mode) in interpret mode."""
    tr = make_trainer()
    st = tr.init(jax.random.key(3))
    obs_dim = tr.obs_dim
    K, R, L, BT = 2, 8, 64, 32
    B = 2 * L  # rpb = 2
    from space_gym_tpu.models.replay import pack_slab, unpack_flat

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
    data = pack_slab(tr_data, obs_dim, 2)  # (R, W, L) ring as ReplayState holds it
    row_idx = jax.random.randint(ki, (K * 2,), 0, R)
    noises = jax.random.normal(kn, (K, B, 2, 2), jnp.float32)

    packed = fs.pack_params(st.actor_params, st.critic_params,
                            st.target_critic_params, st.log_alpha)
    adam = fs.adam_init(packed)
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr, tr.target_entropy)

    # oracle: gather the same rows XLA-side, then the autodiff reference
    gathered = unpack_flat(
        jnp.swapaxes(data[row_idx], 1, 2).reshape(K, B, -1), obs_dim, 2)
    p_ref, ad_ref, cl_ref, al_ref = fs.update_k_reference(
        packed, adam, gathered, noises, *args)

    p_k, ad_k, cl_k, al_k = fs.fused_update_k_from_replay(
        packed, adam, data, row_idx, noises, *args, block=BT, interpret=True,
        mm_bf16=False, fold=fold)

    np.testing.assert_allclose(np.asarray(cl_k), np.asarray(cl_ref),
                               rtol=1e-4, atol=1e-5, err_msg="critic loss")
    np.testing.assert_allclose(np.asarray(al_k), np.asarray(al_ref),
                               rtol=1e-3, atol=1e-5, err_msg="actor loss")
    for f in fs.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p_k, f)), np.asarray(getattr(p_ref, f)),
            rtol=2e-4, atol=2e-5, err_msg=f"param {f}")
    assert int(ad_k.count) == int(ad_ref.count) == K


def test_width512_kernel_matches_reference_interpret():
    """build(512): the width-parameterized kernel namespace (VERDICT r3
    item 4) reproduces the autodiff reference at H=512 exactly like the
    flagship H=256 layout does."""
    fs512 = fs.build(512)
    assert fs512.WROWS == 3208 and fs.build(256).WROWS == fs.WROWS
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = SACTrainer(eng, SACConfig(
        lanes=8, rollout_len=4, replay_rows=8, batch_size=32,
        updates_per_iter=1, warmup_rows=2, hidden=(512, 512),
        fused_updates=True, fused_block=32))
    st = tr.init(jax.random.key(0))
    assert st.fused.w.shape == (3208, 512)

    obs_dim = tr.obs_dim
    K, B = 1, 32
    kb, kn = jax.random.split(jax.random.key(9))
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[rand_batch(jax.random.fold_in(kb, k), B, obs_dim) for k in range(K)],
    )
    noises = jax.random.normal(kn, (K, B, 2, 2), jnp.float32)
    packed = fs512.pack_params(st.actor_params, st.critic_params,
                               st.target_critic_params, st.log_alpha)
    adam = fs.adam_init(packed)
    args = (obs_dim, tr.cfg.gamma, tr.cfg.tau, tr.cfg.lr, tr.target_entropy)
    p_ref, ad_ref, cl_ref, al_ref = fs512.update_k_reference(
        packed, adam, batches, noises, *args)
    p_k, ad_k, cl_k, al_k = fs512.fused_update_k(
        packed, adam, batches, noises, *args, block=32, interpret=True,
        mm_bf16=False)
    np.testing.assert_allclose(np.asarray(cl_k), np.asarray(cl_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_k), np.asarray(al_ref),
                               rtol=1e-3, atol=1e-5)
    for f in fs.PackedParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p_k, f)), np.asarray(getattr(p_ref, f)),
            rtol=2e-4, atol=2e-5, err_msg=f"param {f}")
    assert int(ad_k.count) == K


def test_width_must_be_lane_multiple():
    with pytest.raises(ValueError):
        fs.build(192)
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    with pytest.raises(ValueError):
        SACTrainer(eng, SACConfig(hidden=(192, 192), fused_updates=True))
    with pytest.raises(ValueError):
        SACTrainer(eng, SACConfig(hidden=(256, 512), fused_updates=True))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic VMEM-oversubscription regression is TPU-only")
def test_width512_scan_stays_finite_tpu():
    """Regression: with vmem_limit_bytes=100MB the H=512 kernel inside
    lax.scan silently corrupted its aliased buffers (deterministic garbage
    -> NaN within 2 iterations; standalone dispatches were fine).  The
    64MB limit keeps the chained path correct — this locks that in."""
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"),
                    physics="pallas")
    tr = SACTrainer(eng, SACConfig(
        lanes=2048, rollout_len=8, replay_rows=2048, batch_size=8192,
        updates_per_iter=32, hidden=(512, 512), warmup_rows=1,
        fused_updates=True, fused_block=2048))
    st = tr.init(jax.random.key(0))
    st, m = tr.train_iters(st, jax.random.key(1), n=3)
    assert bool(jnp.isfinite(st.fused.w).all())
    assert np.isfinite(float(np.asarray(m["critic_loss"])))
