"""Learner stack tests: replay ring semantics, SAC/TD3 smoke training,
sharded multi-device train step (8 virtual CPU devices via conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.models import (
    DQNConfig,
    DQNTrainer,
    SACConfig,
    SACTrainer,
    TD3Config,
    TD3Trainer,
    Transition,
    replay_add_slab,
    replay_init,
    replay_sample,
)


def make_slab(t, lanes, obs_dim, act_dim, base):
    sh = lambda *s: jnp.full(s, base, jnp.float32)
    return Transition(
        obs=sh(t, lanes, obs_dim),
        action=sh(t, lanes, act_dim),
        reward=jnp.arange(base, base + t, dtype=jnp.float32)[:, None]
        * jnp.ones((1, lanes), jnp.float32),
        next_obs=sh(t, lanes, obs_dim),
        discount=jnp.ones((t, lanes), jnp.float32),
    )


def test_replay_ring_wraps():
    rs = replay_init(rows=8, lanes=4, obs_dim=3, action_dim=2)
    # 3 slabs of T=4 into 8 rows: third slab overwrites rows 0-3.
    for i in range(3):
        rs = replay_add_slab(rs, make_slab(4, 4, 3, 2, base=10 * i))
    assert int(rs.cursor) == 12
    assert int(rs.filled) == 8
    from space_gym_tpu.models.replay import replay_cols
    r0 = replay_cols(3, 2)[3]
    rewards = np.asarray(rs.data[:, r0, 0])
    # rows 0-3 hold slab 2 (base 20), rows 4-7 hold slab 1 (base 10)
    np.testing.assert_array_equal(rewards[:4], [20, 21, 22, 23])
    np.testing.assert_array_equal(rewards[4:], [10, 11, 12, 13])
    batch = replay_sample(rs, jax.random.key(0), 64)
    assert batch.obs.shape == (64, 3)
    assert np.isfinite(np.asarray(batch.reward)).all()


def test_replay_rejects_misaligned_slab():
    rs = replay_init(rows=8, lanes=2, obs_dim=3, action_dim=2)
    with pytest.raises(ValueError):
        replay_add_slab(rs, make_slab(3, 2, 3, 2, base=0))


def test_nstep_slab_matches_reference():
    """nstep_slab vs a direct per-(t,lane) python evaluation of the m-step
    target definition, on a random slab with terminations and truncations."""
    from space_gym_tpu.models.replay import nstep_slab

    rng = np.random.default_rng(3)
    T, L, D, n, gamma = 7, 5, 2, 3, 0.9
    reward = rng.normal(size=(T, L)).astype(np.float32)
    terminated = rng.random((T, L)) < 0.2
    truncated = (rng.random((T, L)) < 0.1) & ~terminated
    done = terminated | truncated
    discount = (1.0 - terminated).astype(np.float32)
    next_obs = rng.normal(size=(T, L, D)).astype(np.float32)
    slab = Transition(
        obs=jnp.zeros((T, L, D)), action=jnp.zeros((T, L, 1)),
        reward=jnp.asarray(reward), next_obs=jnp.asarray(next_obs),
        discount=jnp.asarray(discount),
    )
    out = jax.jit(lambda s, d: nstep_slab(s, d, gamma, n))(slab, jnp.asarray(done))

    for t in range(T):
        for l in range(L):
            # chain length m: extend while previous step continued and the
            # next step exists, up to n.
            m = 1
            while m < n and t + m < T and not done[t + m - 1, l]:
                m += 1
            r = sum(gamma**k * reward[t + k, l] for k in range(m))
            np.testing.assert_allclose(out.reward[t, l], r, rtol=1e-5,
                                       err_msg=f"reward t={t} l={l}")
            np.testing.assert_allclose(
                out.discount[t, l], gamma ** (m - 1) * discount[t + m - 1, l],
                rtol=1e-6, err_msg=f"discount t={t} l={l}")
            np.testing.assert_array_equal(
                np.asarray(out.next_obs[t, l]), next_obs[t + m - 1, l],
                err_msg=f"next_obs t={t} l={l}")
    # n=1 is the identity
    ident = nstep_slab(slab, jnp.asarray(done), gamma, 1)
    np.testing.assert_array_equal(np.asarray(ident.reward), reward)


@pytest.mark.parametrize("algo", ["sac", "td3", "dqn"])
def test_trainer_smoke(algo):
    kw = dict(lanes=32, rollout_len=4, replay_rows=16, batch_size=64,
              updates_per_iter=2, warmup_rows=4)
    if algo == "dqn":
        eng = EnvEngine(space_gym_tpu.get_config("DoNotCrashDiscrete-v0"))
        tr = DQNTrainer(eng, DQNConfig(**kw))
        get_params = lambda st: st.params
    else:
        eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
        tr = (SACTrainer(eng, SACConfig(**kw)) if algo == "sac"
              else TD3Trainer(eng, TD3Config(**kw)))
        get_params = lambda st: st.actor_params
    st = tr.init(jax.random.key(0))
    params0 = jax.tree.leaves(get_params(st))[0].copy()
    loss_key = "loss" if algo == "dqn" else "critic_loss"
    for i in range(4):
        st, m = tr.train_iter(st, jax.random.key(i + 1))
    assert np.isfinite(float(m[loss_key]))
    assert np.isfinite(float(m["mean_reward"]))
    # After warmup the parameters must actually move.
    params1 = jax.tree.leaves(get_params(st))[0]
    assert not np.allclose(np.asarray(params0), np.asarray(params1))
    # Deterministic eval action valid.
    a = np.asarray(tr.eval_act(get_params(st), st.obs))
    if algo == "dqn":
        assert a.dtype.kind == "i" and a.min() >= 0 and a.max() < 6
    else:
        assert np.all(np.abs(a) <= 1.0)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step(model_parallel):
    """Full SAC train step over an 8-virtual-device mesh: data-parallel lanes
    and replay, replicated (or column-TP) params — the SURVEY §2 design."""
    from space_gym_tpu.parallel import make_mesh, place, trainer_state_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=model_parallel)
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = SACTrainer(
        eng,
        SACConfig(lanes=32, rollout_len=4, replay_rows=16, batch_size=64,
                  updates_per_iter=1, warmup_rows=4),
    )
    st = tr.init(jax.random.key(0))
    sh = trainer_state_shardings(st, mesh, model_parallel)
    st = place(st, sh)
    with mesh:
        for i in range(2):
            st, m = tr.train_iter(st, jax.random.key(i + 1))
    assert np.isfinite(float(m["critic_loss"]))
    # Env lanes actually sharded along "data".
    spec = st.env_state.y.sharding.spec
    assert spec and spec[0] == "data"


def test_graft_entry_single_chip():
    import importlib
    import __graft_entry__ as g

    importlib.reload(g)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    env_state, obs, reward = out
    assert obs.ndim == 2 and np.isfinite(np.asarray(reward)).all()


def test_sac_train_iters_scan_matches_structure():
    """train_iters (n iterations scanned into one program) advances the state
    like n train_iter calls: step += n, fused Adam count += n*K, finite
    metrics, unchanged pytree structure."""
    import space_gym_tpu
    from space_gym_tpu.engine.core import EnvEngine
    from space_gym_tpu.models.sac import SACConfig, SACTrainer

    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    cfg = SACConfig(lanes=16, rollout_len=4, replay_rows=16, batch_size=32,
                    updates_per_iter=2, warmup_rows=4, fused_updates=True,
                    fused_block=32)
    tr = SACTrainer(eng, cfg)
    st = tr.init(jax.random.key(0))
    tpl = jax.tree.structure(st)
    st, m = tr.train_iters(st, jax.random.key(1), n=3)
    assert jax.tree.structure(st) == tpl
    assert int(st.step) == 3
    assert int(st.fused.count) == 3 * cfg.updates_per_iter
    assert all(np.isfinite(float(np.asarray(v))) for v in m.values())


@pytest.mark.parametrize("algo", ["sac", "td3"])
def test_fused_checkpoint_bridges(algo):
    """migrate_to_fused / rehydrate_from_fused (tools/train.py cross-format
    resume): the round trip flax -> fused -> flax is BITWISE on every learner
    leaf (packing is slicing/stacking, no arithmetic), and re-hydrating after
    fused training carries the TRAINED critics/moments over (not the frozen
    init snapshot a naive unfused resume would silently use)."""
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    kw = dict(lanes=32, rollout_len=4, replay_rows=16, batch_size=64,
              updates_per_iter=2, warmup_rows=2)
    mk = SACTrainer if algo == "sac" else TD3Trainer
    cfgc = SACConfig if algo == "sac" else TD3Config

    # Unfused training -> migrate -> rehydrate must be the identity.
    tr = mk(eng, cfgc(**kw))
    st = tr.init(jax.random.key(0))
    for i in range(3):
        st, _ = tr.train_iter(st, jax.random.key(i + 1))
    rt = tr.rehydrate_from_fused(tr.migrate_to_fused(st))
    fields = (
        ("actor_params", "critic_params", "target_critic_params", "log_alpha",
         "actor_opt", "critic_opt", "alpha_opt")
        if algo == "sac" else
        ("actor_params", "target_actor_params", "critic_params",
         "target_critic_params", "actor_opt", "critic_opt", "n_updates")
    )
    for f in fields:
        for a, b in zip(jax.tree.leaves(getattr(st, f)),
                        jax.tree.leaves(getattr(rt, f))):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"field {f}")

    # Fused training -> rehydrate: critics/moments leave the init snapshot
    # and the unfused trainer continues from them.
    trf = mk(eng, cfgc(**kw, fused_updates=True, fused_block=64))
    stf = trf.init(jax.random.key(0))
    crit0 = jax.tree.leaves(stf.critic_params)[0].copy()
    for i in range(3):
        stf, _ = trf.train_iter(stf, jax.random.key(i + 1))
    # fused mode freezes the flax critic fields at init...
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(stf.critic_params)[0]), np.asarray(crit0))
    re = trf.rehydrate_from_fused(stf)
    assert re.fused is None
    assert not np.allclose(
        np.asarray(jax.tree.leaves(re.critic_params)[0]), np.asarray(crit0))
    if algo == "sac":
        assert int(re.critic_opt[0].count) == 3 * kw["updates_per_iter"]
    else:
        assert int(re.critic_opt[0].count) == int(re.n_updates)
    st2, m = tr.train_iter(re, jax.random.key(99))
    assert np.isfinite(float(m["critic_loss"]))


def test_sharded_fused_train_step():
    """Fused-learner SAC over the 8-virtual-device mesh: the packed replay
    ring shards lanes-minor along "data", the FusedState wmat replicates, and
    train_iters scans under the mesh (CPU reference fallback for the kernel)."""
    from space_gym_tpu.parallel import make_mesh, place, trainer_state_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=1)
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = SACTrainer(
        eng,
        SACConfig(lanes=32, rollout_len=4, replay_rows=16, batch_size=64,
                  updates_per_iter=2, warmup_rows=4, fused_updates=True,
                  fused_block=64),
    )
    st = tr.init(jax.random.key(0))
    sh = trainer_state_shardings(st, mesh, 1)
    st = place(st, sh)
    with mesh:
        st, m = tr.train_iters(st, jax.random.key(1), n=3)
    assert np.isfinite(float(m["critic_loss"]))
    assert int(st.step) == 3 and int(st.fused.count) == 6
    # replay ring sharded on the minor lanes axis; fused wmat replicated
    assert st.replay.data.sharding.spec[2] == "data"
    assert all(s is None for s in (st.fused.w.sharding.spec or [None]))


def test_ppo_gae_matches_numpy():
    """GAE reverse scan vs an explicit numpy loop, including a mid-rollout
    termination (no bootstrap) and a truncation (bootstraps final_value)."""
    from space_gym_tpu.models.ppo import PPOConfig, PPOTrainer

    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = PPOTrainer(eng, PPOConfig(lanes=128, rollout_len=8, epochs=1,
                                   minibatches=2))
    T, L = 6, 3
    rng = np.random.default_rng(0)
    reward = rng.normal(size=(T, L)).astype(np.float32)
    value = rng.normal(size=(T, L)).astype(np.float32)
    fval = rng.normal(size=(T, L)).astype(np.float32)
    term = np.zeros((T, L), np.float32)
    done = np.zeros((T, L), np.float32)
    term[2, 0] = 1.0; done[2, 0] = 1.0          # termination lane 0 @ t2
    done[4, 1] = 1.0                            # truncation lane 1 @ t4
    data = {
        "reward": jnp.asarray(reward), "value": jnp.asarray(value),
        "final_value": jnp.asarray(fval),
        "nonterm": jnp.asarray(1.0 - term), "nondone": jnp.asarray(1.0 - done),
    }
    adv, ret = jax.jit(tr._gae)(data)
    g, lam = tr.cfg.gamma, tr.cfg.gae_lambda
    want = np.zeros((T, L), np.float32)
    nxt = np.zeros(L, np.float32)
    for t in reversed(range(T)):
        delta = reward[t] + g * (1 - term[t]) * fval[t] - value[t]
        want[t] = delta + g * lam * (1 - done[t]) * nxt
        nxt = want[t]
    np.testing.assert_allclose(np.asarray(adv), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), want + value, rtol=1e-5, atol=1e-6)


def test_ppo_trainer_smoke():
    from space_gym_tpu.models.ppo import PPOConfig, PPOTrainer

    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = PPOTrainer(eng, PPOConfig(lanes=128, rollout_len=8, epochs=2,
                                   minibatches=4))
    st = tr.init(jax.random.key(0))
    p0 = jax.tree.leaves(st.params)[0].copy()
    for i in range(3):
        st, m = tr.train_iter(st, jax.random.key(i + 1))
    assert all(np.isfinite(float(np.asarray(v))) for v in m.values())
    assert not np.allclose(np.asarray(p0), np.asarray(jax.tree.leaves(st.params)[0]))
    a = np.asarray(tr.eval_act(st.params, st.obs))
    assert np.all(np.abs(a) <= 1.0)


def test_sharded_ppo_train_step():
    """PPO train step over the 8-virtual-device mesh: lanes shard along
    "data" through rollout, GAE and the tile-permuted minibatch SGD; params
    replicate (gradient all-reduce inserted by GSPMD)."""
    from space_gym_tpu.models.ppo import PPOConfig, PPOTrainer
    from space_gym_tpu.parallel import make_mesh, place, trainer_state_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=1)
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    tr = PPOTrainer(eng, PPOConfig(lanes=256, rollout_len=4, epochs=2,
                                   minibatches=2))
    st = tr.init(jax.random.key(0))
    sh = trainer_state_shardings(st, mesh, 1)
    st = place(st, sh)
    with mesh:
        st, m = tr.train_iters(st, jax.random.key(1), n=2)
    assert np.isfinite(float(m["policy_loss"]))
    assert int(st.step) == 2
    assert st.env_state.y.sharding.spec[0] == "data"
