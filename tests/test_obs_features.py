"""Opt-in trainer-side observation featurization (engine obs_features).

The features are analytic functions of the raw observation only (no
privileged state): the penalty terms of _dense_reward5
(gym_space/envs/kepler.py:111-150) expanded through multi-scale tanh.
Default engines must be bit-identical to before the flag existed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.envs import kepler_math as km


def test_default_engine_unchanged():
    cfg = space_gym_tpu.get_config("KeplerCircleOrbit-v0")
    plain = EnvEngine(cfg, physics="fixed")
    feat = EnvEngine(cfg, physics="fixed", obs_features="kepler")
    assert plain.obs_dim == cfg.obs_dim
    assert feat.obs_dim == cfg.obs_dim + km.N_ERROR_FEATURES

    sp, op = plain._reset_batched(jax.random.key(3), 16)
    sf, of = feat._reset_batched(jax.random.key(3), 16)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(of[:, : cfg.obs_dim]))
    a = jnp.full((16, 2), 0.25, jnp.float32)
    sp, tsp = plain._step_batched(sp, a, jax.random.key(4))
    sf, tsf = feat._step_batched(sf, a, jax.random.key(4))
    # identical env dynamics/reward; featurized obs extends the raw obs
    np.testing.assert_array_equal(np.asarray(tsp.reward), np.asarray(tsf.reward))
    np.testing.assert_array_equal(
        np.asarray(tsp.obs), np.asarray(tsf.obs[:, : cfg.obs_dim]))
    np.testing.assert_array_equal(
        np.asarray(tsp.final_obs), np.asarray(tsf.final_obs[:, : cfg.obs_dim]))


def test_features_match_reference_orbit_math():
    """Scalar-math featurizer == the matrix-form parity functions (f64)."""
    cfg = space_gym_tpu.get_config("KeplerEllipseEasy-v0")  # ecc != 0 path
    eng = EnvEngine(cfg, physics="fixed", obs_features="kepler")
    state, obs = eng._reset_batched(jax.random.key(0), 8)
    state, ts = eng._step_batched(
        state, jnp.zeros((8, 2), jnp.float32), jax.random.key(1))
    raw = np.asarray(ts.final_obs[:, : cfg.obs_dim], np.float64)
    feats = np.asarray(ts.final_obs[:, cfg.obs_dim :], np.float64)
    alpha = km.G * cfg.kepler.planet_mass
    for i in range(raw.shape[0]):
        pos, vel = raw[i, 0:2], raw[i, 4:6]
        ang, ecc, a = raw[i, 7], raw[i, 8], raw[i, 9]
        cur = km.orbit_cur_rad(np, pos, ang, a, ecc)
        tgt = km.orbit_target_rad(np, pos, ang, a, ecc)
        tv = km.orbit_target_vel(np, alpha, pos, ang, a, ecc)
        e = np.array([cur - tgt, tv[0] - vel[0], tv[1] - vel[1]])
        exp = np.concatenate([np.tanh(g * e) for g in km.FEATURE_GAINS])
        np.testing.assert_allclose(feats[i], exp, atol=5e-6)


def test_features_invert_to_reward():
    """On lanes where the penalty is small enough that tanh(e) is invertible,
    C/(2|rad_err|+|ev_x|+|ev_y|+C) from the features reproduces the engine's
    zero-action reward (independent reward path through kepler_math)."""
    cfg = space_gym_tpu.get_config("KeplerCircleOrbit-v0")
    eng = EnvEngine(cfg, physics="fixed", obs_features="kepler")
    state, obs = eng._reset_batched(jax.random.key(7), 64)
    state, ts = eng._step_batched(
        state, jnp.zeros((64, 2), jnp.float32), jax.random.key(8))
    d = cfg.obs_dim
    e = np.asarray(ts.final_obs[:, d : d + 3], np.float64)
    small = np.max(np.abs(e), axis=1) < 0.9  # away from tanh saturation
    assert small.any()
    e = np.arctanh(e[small])
    C = cfg.kepler.numerator_C
    # act_penalty uses the TRANSLATED action (spaceship_env.py:72-73):
    # raw zeros -> [(0+1)/2, 0], norm 0.5
    act_pen = cfg.kepler.act_penalty_C * 0.5
    pen = (cfg.kepler.rad_penalty_C * np.abs(e[:, 0])
           + np.abs(e[:, 1]) + np.abs(e[:, 2]) + act_pen)
    # reward is computed pre-reset, so compare on non-done lanes only
    ok = ~np.asarray(ts.done)[small]
    pred = (C / (pen + C))[ok]
    got = np.asarray(ts.reward, np.float64)[small][ok]
    np.testing.assert_allclose(got, pred, rtol=2e-2)


def test_sac_trainer_with_features():
    """SACTrainer sizes nets/replay off engine.obs_dim and trains."""
    from space_gym_tpu.models import SACConfig, SACTrainer

    cfg = space_gym_tpu.get_config("KeplerCircleOrbit-v0")
    eng = EnvEngine(cfg, physics="fixed", obs_features="kepler")
    tr = SACTrainer(eng, SACConfig(
        lanes=8, rollout_len=4, replay_rows=16, batch_size=16,
        updates_per_iter=1, warmup_rows=1, hidden=(32, 32)))
    assert tr.obs_dim == cfg.obs_dim + km.N_ERROR_FEATURES
    st = tr.init(jax.random.key(0))
    assert st.obs.shape == (8, tr.obs_dim)
    st, m = tr.train_iter(st, jax.random.key(1))
    assert np.isfinite(float(np.asarray(m["critic_loss"])))
    a = tr.eval_act(st.actor_params, st.obs)
    assert a.shape == (8, 2)


def test_rejects_non_kepler():
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    with pytest.raises(ValueError):
        EnvEngine(cfg, physics="fixed", obs_features="kepler")


def test_learner_obs_expansion_function_preserving():
    """restore_learner's obs_dim migration: the expanded fused learner (new
    feature columns through zero first-layer rows, critic action rows
    shifted) computes EXACTLY the same actor and critic outputs on augmented
    obs as the original on raw obs, and preserves the Adam count."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from restore_learner import expand_first_layer

    from space_gym_tpu.models import SACConfig, SACTrainer, networks
    from space_gym_tpu.models import fused_sac as fs

    cfg = space_gym_tpu.get_config("KeplerCircleOrbit-v0")
    kw = dict(lanes=8, rollout_len=4, replay_rows=16, batch_size=16,
              updates_per_iter=1, warmup_rows=1, fused_updates=True,
              fused_block=16)
    old_tr = SACTrainer(EnvEngine(cfg, physics="fixed"), SACConfig(**kw))
    new_eng = EnvEngine(cfg, physics="fixed", obs_features="kepler")
    new_tr = SACTrainer(new_eng, SACConfig(**kw))
    old_st = old_tr.init(jax.random.key(0))
    for i in range(3):  # non-trivial weights/moments
        old_st, _ = old_tr.train_iter(old_st, jax.random.key(i + 1))

    old_d, new_d = old_tr.obs_dim, new_tr.obs_dim
    hidden = old_tr.cfg.hidden
    k = jax.random.key(0)
    a_tpl = networks.TanhGaussianActor(2, hidden).init(
        k, jnp.zeros((1, old_d), jnp.float32))
    c_tpl = networks.DoubleCritic(hidden).init(
        k, jnp.zeros((1, old_d), jnp.float32), jnp.zeros((1, 2), jnp.float32))
    packed, adam = fs.fused_unpack(old_st.fused)

    def expand_packed(p):
        a, c, t, la = fs.unpack_params(p, a_tpl, c_tpl)
        a = expand_first_layer(a, old_d, new_d, has_action=False)
        c = expand_first_layer(c, old_d, new_d, has_action=True)
        t = expand_first_layer(t, old_d, new_d, has_action=True)
        return fs.pack_params(a, c, t, la)

    fused2 = fs.fused_init(
        expand_packed(packed),
        fs.PackedAdam(m=expand_packed(adam.m), v=expand_packed(adam.v),
                      count=adam.count))

    raw_obs = old_st.obs
    aug_obs = new_eng._augment_obs(raw_obs)
    a_old = old_tr.eval_act(old_st.actor_params, raw_obs)
    a_new = new_tr.eval_act(
        fs.unpack_actor(fused2.w, fused2.vec, new_d, 2), aug_obs)
    np.testing.assert_array_equal(np.asarray(a_old), np.asarray(a_new))

    c_tpl2 = networks.DoubleCritic(hidden).init(
        k, jnp.zeros((1, new_d), jnp.float32), jnp.zeros((1, 2), jnp.float32))
    a_tpl2 = networks.TanhGaussianActor(2, hidden).init(
        k, jnp.zeros((1, new_d), jnp.float32))
    p2, ad2 = fs.fused_unpack(fused2)
    _, c1, _, _ = fs.unpack_params(packed, a_tpl, c_tpl)
    _, c2, _, _ = fs.unpack_params(p2, a_tpl2, c_tpl2)
    q1o, q2o = networks.DoubleCritic(hidden).apply(c1, raw_obs, a_old)
    q1n, q2n = networks.DoubleCritic(hidden).apply(c2, aug_obs, a_old)
    np.testing.assert_array_equal(np.asarray(q1o), np.asarray(q1n))
    np.testing.assert_array_equal(np.asarray(q2o), np.asarray(q2n))
    assert int(ad2.count) == int(adam.count)


# ---------------------------------------------------------------- goal -----


def test_goal_default_engine_unchanged():
    from space_gym_tpu.envs import goal_math as gm

    cfg = space_gym_tpu.get_config("GoalContinuous3P-v0")
    plain = EnvEngine(cfg, physics="fixed")
    feat = EnvEngine(cfg, physics="fixed", obs_features="goal")
    assert feat.obs_dim == cfg.obs_dim + gm.N_GOAL_FEATURES

    sp, op = plain._reset_batched(jax.random.key(3), 16)
    sf, of = feat._reset_batched(jax.random.key(3), 16)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(of[:, : cfg.obs_dim]))
    a = jnp.full((16, 2), 0.25, jnp.float32)
    sp, tsp = plain._step_batched(sp, a, jax.random.key(4))
    sf, tsf = feat._step_batched(sf, a, jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(tsp.reward), np.asarray(tsf.reward))
    np.testing.assert_array_equal(
        np.asarray(tsp.obs), np.asarray(tsf.obs[:, : cfg.obs_dim]))
    np.testing.assert_array_equal(
        np.asarray(tsp.final_obs), np.asarray(tsf.final_obs[:, : cfg.obs_dim]))


def test_goal_features_vs_state_ground_truth():
    """The lidar-derived features reproduce quantities computed from the
    env state's ACTUAL goal/planet positions (independent of the lidar
    encoding): goal distance/closing speed, closest-planet surface margin,
    and the net gravitational acceleration (ops/maths.gravity_force law)."""
    from space_gym_tpu.envs import goal_math as gm
    from space_gym_tpu.ops.constants import G

    cfg = space_gym_tpu.get_config("GoalContinuous4P-v0")
    eng = EnvEngine(cfg, physics="fixed", obs_features="goal")
    # Compare at reset: after a step, state.goal_pos can already be the NEXT
    # goal (mid-episode resample, quirk Q11) while obs encodes the old one.
    state, obs = eng._reset_batched(jax.random.key(11), 32)
    feats = np.asarray(obs[:, cfg.obs_dim :], np.float64)
    pos = np.asarray(state.y[:, 0:2], np.float64)
    vel = np.asarray(state.y[:, 3:5], np.float64)
    planets = np.asarray(state.planets_pos, np.float64)  # (B, P, 2)
    goal = np.asarray(state.goal_pos, np.float64)        # (B, 2)
    gmass = G * cfg.planet_masses[0]

    n_dist = len(gm.DIST_GAINS)
    n_vel = len(gm.VEL_GAINS)
    for i in range(32):
        gvec = goal[i] - pos[i]
        d = np.linalg.norm(gvec)
        ghat = gvec / d
        # goal margin feature (gain 1)
        np.testing.assert_allclose(
            feats[i, 0], np.tanh(d - cfg.goal_radius), atol=1e-5)
        # closing speed (gain 1)
        np.testing.assert_allclose(
            feats[i, n_dist], np.tanh(vel[i] @ ghat), atol=1e-5)
        # closest-planet margin (gain 1)
        surf = np.linalg.norm(planets[i] - pos[i], axis=-1) - cfg.planet_radii[0]
        k0 = n_dist + 2 * n_vel + 2
        np.testing.assert_allclose(
            feats[i, k0], np.tanh(surf.min() - cfg.goal.danger_zone), atol=1e-5)
        # net gravity vector (gain GRAV_GAINS[0]) vs Newton's law
        dvec = planets[i] - pos[i]
        r = np.linalg.norm(dvec, axis=-1, keepdims=True)
        acc = (gmass * dvec / r**3).sum(axis=0)
        k1 = k0 + len(gm.DANGER_GAINS) + n_vel + 1
        np.testing.assert_allclose(
            feats[i, k1], np.tanh(gm.GRAV_GAINS[0] * acc[0]), atol=1e-4)
        np.testing.assert_allclose(
            feats[i, k1 + len(gm.GRAV_GAINS)],
            np.tanh(gm.GRAV_GAINS[0] * acc[1]), atol=1e-4)


def test_goal_features_np_jnp_agree():
    from space_gym_tpu.envs import goal_math as gm

    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    eng = EnvEngine(cfg, physics="fixed")
    _, obs = eng._reset_batched(jax.random.key(5), 16)
    f_np = gm.features_for_config(np, np.asarray(obs), cfg)
    f_j = np.asarray(gm.features_for_config(jnp, obs, cfg))
    assert f_np.shape == (16, gm.N_GOAL_FEATURES)
    np.testing.assert_allclose(f_np, f_j, atol=1e-6)


def test_goal_features_reject_wrong_task():
    cfg = space_gym_tpu.get_config("KeplerCircleOrbit-v0")
    with pytest.raises(ValueError):
        EnvEngine(cfg, physics="fixed", obs_features="goal")


def test_sac_trainer_with_goal_features():
    from space_gym_tpu.envs import goal_math as gm
    from space_gym_tpu.models import SACConfig, SACTrainer

    cfg = space_gym_tpu.get_config("GoalContinuous3P-v0")
    eng = EnvEngine(cfg, physics="fixed", obs_features="goal")
    tr = SACTrainer(eng, SACConfig(
        lanes=8, rollout_len=4, replay_rows=16, batch_size=16,
        updates_per_iter=1, warmup_rows=1, hidden=(32, 32)))
    assert tr.obs_dim == cfg.obs_dim + gm.N_GOAL_FEATURES
    st = tr.init(jax.random.key(0))
    st, m = tr.train_iter(st, jax.random.key(1))
    assert np.isfinite(float(np.asarray(m["critic_loss"])))


def test_dnc_default_engine_unchanged():
    from space_gym_tpu.envs import dnc_math as dm

    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    plain = EnvEngine(cfg, physics="fixed")
    feat = EnvEngine(cfg, physics="fixed", obs_features="dnc")
    assert feat.obs_dim == cfg.obs_dim + dm.N_DNC_FEATURES

    sp, op = plain._reset_batched(jax.random.key(3), 16)
    sf, of = feat._reset_batched(jax.random.key(3), 16)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(of[:, : cfg.obs_dim]))
    a = jnp.full((16, 2), 0.25, jnp.float32)
    sp, tsp = plain._step_batched(sp, a, jax.random.key(4))
    sf, tsf = feat._step_batched(sf, a, jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(tsp.reward), np.asarray(tsf.reward))
    np.testing.assert_array_equal(
        np.asarray(tsp.obs), np.asarray(tsf.obs[:, : cfg.obs_dim]))


def test_dnc_features_vs_state_ground_truth():
    """Features reproduce the survival geometry computed from the state:
    annulus margins (the two crash events' distances-to-fire), radial /
    tangential velocity in the origin-centered frame, the vis-viva circular
    speed error, and the omega-cap margin (the third terminal event)."""
    from space_gym_tpu.envs import dnc_math as dm
    from space_gym_tpu.ops.constants import G

    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    eng = EnvEngine(cfg, physics="fixed", obs_features="dnc")
    state, obs = eng._reset_batched(jax.random.key(11), 32)
    feats = np.asarray(obs[:, cfg.obs_dim :], np.float64)
    pos = np.asarray(state.y[:, 0:2], np.float64)
    vel = np.asarray(state.y[:, 3:5], np.float64)
    w = np.asarray(state.y[:, 5], np.float64)
    gm = G * cfg.dnc.planet_mass

    nm = len(dm.MARGIN_GAINS)
    nv = len(dm.VEL_GAINS)
    no = len(dm.ORBIT_GAINS)
    for i in range(32):
        r = np.linalg.norm(pos[i])
        rhat = pos[i] / r
        v_rad = vel[i] @ rhat
        v_tan = vel[i][0] * rhat[1] - vel[i][1] * rhat[0]
        # margins (gain 1)
        np.testing.assert_allclose(
            feats[i, 0], np.tanh(r - cfg.dnc.planet_radius), atol=1e-5)
        np.testing.assert_allclose(
            feats[i, nm], np.tanh(cfg.dnc.border_radius - r), atol=1e-5)
        # radial / tangential velocity (gain 1)
        np.testing.assert_allclose(feats[i, 2 * nm], np.tanh(v_rad), atol=1e-5)
        np.testing.assert_allclose(
            feats[i, 2 * nm + nv], np.tanh(v_tan), atol=1e-5)
        # orbit-speed error (first gain)
        k = 2 * nm + 2 * nv
        np.testing.assert_allclose(
            feats[i, k],
            np.tanh(dm.ORBIT_GAINS[0] * (abs(v_tan) - np.sqrt(gm / r))),
            atol=1e-5)
        # omega-cap margin (first gain)
        k2 = k + 2 * no
        np.testing.assert_allclose(
            feats[i, k2],
            np.tanh(dm.OMEGA_GAINS[0] * (cfg.max_abs_vel_angle - abs(w[i]))),
            atol=1e-5)


def test_dnc_features_np_jnp_agree():
    from space_gym_tpu.envs import dnc_math as dm

    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    eng = EnvEngine(cfg, physics="fixed")
    _, obs = eng._reset_batched(jax.random.key(5), 16)
    f_np = dm.features_for_config(np, np.asarray(obs), cfg)
    f_j = np.asarray(dm.features_for_config(jnp, obs, cfg))
    assert f_np.shape == (16, dm.N_DNC_FEATURES)
    np.testing.assert_allclose(f_np, f_j, atol=1e-6)


def test_dnc_features_reject_wrong_task():
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    with pytest.raises(ValueError):
        EnvEngine(cfg, physics="fixed", obs_features="dnc")


def test_sac_trainer_with_dnc_features():
    from space_gym_tpu.envs import dnc_math as dm
    from space_gym_tpu.models import SACConfig, SACTrainer

    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    eng = EnvEngine(cfg, physics="fixed", obs_features="dnc")
    tr = SACTrainer(eng, SACConfig(
        lanes=8, rollout_len=4, replay_rows=16, batch_size=16,
        updates_per_iter=1, warmup_rows=1, hidden=(32, 32)))
    assert tr.obs_dim == cfg.obs_dim + dm.N_DNC_FEATURES
    st = tr.init(jax.random.key(0))
    st, m = tr.train_iter(st, jax.random.key(1))
    assert np.isfinite(float(np.asarray(m["critic_loss"])))
