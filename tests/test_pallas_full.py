"""Full-fusion Pallas kernel (ops.pallas_full): the entire env step in one
kernel.  Interpret-mode on CPU keeps sizes small; the compiled kernel is
exercised on TPU by bench.py and the on-chip validation recorded in RESULTS.
"""
import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine

SLOW = os.environ.get("SGT_SLOW_TESTS") == "1" or jax.default_backend() == "tpu"
slow_only = pytest.mark.skipif(
    not SLOW, reason="interpret-mode kernel is slow; set SGT_SLOW_TESTS=1"
)


def test_norminv_accuracy():
    from space_gym_tpu.ops.pallas_full import _norminv
    from scipy.special import ndtri

    u = np.linspace(1e-9, 1 - 1e-9, 20001)
    got = np.asarray(_norminv(jnp.asarray(u, jnp.float64)))
    ref = ndtri(u)
    assert np.abs(got - ref).max() < 1e-8


def test_full_matches_env_fused_on_live_lanes():
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    ea = EnvEngine(cfg, physics="pallas", dtype=jnp.float32, pallas_fuse="env")
    ef = EnvEngine(cfg, physics="pallas", dtype=jnp.float32, pallas_fuse="full")
    B = 128
    sa, oa = ea.init(jax.random.key(0), B)
    act = jax.random.uniform(jax.random.key(1), (B, 2), jnp.float32, minval=-1, maxval=1)
    sa2, ta = ea.step(sa, act, jax.random.key(2))
    sf2, tf = ef.step(sa, act, jax.random.key(2))
    assert (np.asarray(ta.done) == np.asarray(tf.done)).all()
    live = ~np.asarray(ta.done)
    reached = (
        np.linalg.norm(np.asarray(sa.goal_pos) - np.asarray(sa2.y[:, :2]), axis=-1)
        < cfg.goal_radius
    )
    m = live & ~reached
    assert m.sum() > B // 2
    np.testing.assert_allclose(np.asarray(tf.obs)[m], np.asarray(ta.obs)[m], rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tf.reward)[m], np.asarray(ta.reward)[m], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sf2.y)[m], np.asarray(sa2.y)[m], rtol=0, atol=2e-5)


def test_full_kernel_tiny_vs_fixed_always_on():
    """Always-on CI coverage for the PRODUCTION full-step kernel (VERDICT r1
    item 8): tiny interpret config (B=8, 3 steps) teacher-forced from the XLA
    fixed path's trajectory; physics/obs/reward must agree on live lanes.
    Runs in the default suite (no SGT_SLOW_TESTS gate) — the sizes keep
    interpret mode under ~30 s."""
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    ef = EnvEngine(cfg, physics="pallas", dtype=jnp.float32, pallas_fuse="full")
    ex = EnvEngine(cfg, physics="fixed", dtype=jnp.float32)
    B = 8
    state, _ = ex.init(jax.random.key(3), B)
    key = jax.random.key(4)
    checked = 0
    for t in range(3):
        key, ka, ks = jax.random.split(key, 3)
        act = jax.random.uniform(ka, (B, 2), jnp.float32, minval=-1, maxval=1)
        sx, tx = ex.step(state, act, ks)
        sf, tf = ef.step(state, act, ks)
        live = ~np.asarray(tx.done) & ~np.asarray(tf.done)
        reached = (
            np.linalg.norm(
                np.asarray(state.goal_pos) - np.asarray(sx.y[:, :2]), axis=-1
            )
            < cfg.goal_radius
        )
        m = live & ~reached
        if m.any():
            np.testing.assert_allclose(
                np.asarray(sf.y)[m], np.asarray(sx.y)[m], rtol=0, atol=2e-5,
                err_msg=f"t={t} state")
            np.testing.assert_allclose(
                np.asarray(tf.final_obs)[m], np.asarray(tx.final_obs)[m],
                rtol=0, atol=2e-5, err_msg=f"t={t} obs")
            np.testing.assert_allclose(
                np.asarray(tf.reward)[m], np.asarray(tx.reward)[m],
                rtol=1e-3, atol=1e-4, err_msg=f"t={t} reward")
            checked += int(m.sum())
        state = sx  # teacher-force both paths from the fixed trajectory
    assert checked >= B  # at least a full batch worth of live comparisons


@slow_only
def test_full_reset_distribution_matches_xla():
    """Force per-step truncation: every step emits in-kernel resets; their
    marginals must match the XLA reset sampler (KS)."""
    from scipy.stats import ks_2samp

    cfg = dataclasses.replace(
        space_gym_tpu.get_config("GoalContinuous2P-v0"), max_episode_steps=1
    )
    ef = EnvEngine(cfg, physics="pallas", dtype=jnp.float32, pallas_fuse="full")
    ex = EnvEngine(cfg, physics="fixed", dtype=jnp.float32)
    B = 512
    sf, _ = ef.init(jax.random.key(0), B)
    sx, _ = ex.init(jax.random.key(0), B)
    act = jnp.zeros((B, 2), jnp.float32)
    YF, YX, GF, GX = [], [], [], []
    for i in range(4):
        sf, _ = ef.step(sf, act, jax.random.key(100 + i))
        sx, _ = ex.step(sx, act, jax.random.key(200 + i))
        YF.append(np.asarray(sf.y)); YX.append(np.asarray(sx.y))
        GF.append(np.asarray(sf.goal_pos)); GX.append(np.asarray(sx.goal_pos))
    YF, YX = np.concatenate(YF), np.concatenate(YX)
    GF, GX = np.concatenate(GF), np.concatenate(GX)
    for name, a, b in [
        ("ship x", YF[:, 0], YX[:, 0]),
        ("speed", np.hypot(YF[:, 3], YF[:, 4]), np.hypot(YX[:, 3], YX[:, 4])),
        ("ang vel", YF[:, 5], YX[:, 5]),
        ("goal x", GF[:, 0], GX[:, 0]),
        ("ship-goal", np.linalg.norm(GF - YF[:, :2], axis=-1),
         np.linalg.norm(GX - YX[:, :2], axis=-1)),
    ]:
        stat, p = ks_2samp(a, b)
        assert p > 1e-3, f"{name}: KS p={p:.2e}"


@slow_only
def test_full_kepler_randomize_resets():
    cfg = dataclasses.replace(
        space_gym_tpu.get_config("KeplerRandomOrbits-v0"), max_episode_steps=1
    )
    ef = EnvEngine(cfg, physics="pallas", dtype=jnp.float32, pallas_fuse="full")
    B = 512
    sf, _ = ef.init(jax.random.key(0), B)
    act = jnp.zeros((B, 2), jnp.float32)
    sf, _ = ef.step(sf, act, jax.random.key(1))
    ref = np.asarray(sf.ref_orbit)
    assert ref[:, 1].min() >= 0 and ref[:, 1].max() <= 0.7   # ecc in [0, 0.7)
    assert ref[:, 0].min() >= 0 and ref[:, 0].max() <= 2 * np.pi
    assert ref[:, 1].std() > 0.1  # actually resampled
    r = np.hypot(np.asarray(sf.y)[:, 0], np.asarray(sf.y)[:, 1])
    assert r.min() >= 0.7 - 1e-5 and r.max() <= 2.5 + 1e-5


# -------------------------- in-kernel RNG modes ------------------------------

def test_threefry_matrix_matches_jax_uniform_bitwise():
    """The in-kernel threefry twin must reproduce jax.random.uniform's exact
    bits (jax/_src/prng.py partitionable counter layout + random.py::_uniform
    mantissa fill) for every (block, base) decomposition of the batch."""
    from space_gym_tpu.ops.pallas_full import _threefry_uniform_matrix

    key = jax.random.key(123)
    k0, k1 = (jnp.uint32(w) for w in jax.random.key_data(key))
    batch, n_rows, block = 512, 7, 128
    ref = np.asarray(jax.random.uniform(key, (batch, n_rows), jnp.float32)).T
    for pid in range(batch // block):
        base = jnp.uint32(pid * block * n_rows)
        got = np.asarray(_threefry_uniform_matrix(k0, k1, base, n_rows, block))
        want = ref[:, pid * block:(pid + 1) * block]
        assert (got.view(np.uint32) == want.view(np.uint32)).all()


def test_in_kernel_rng_bitwise_vs_xla_draw():
    """Full-fused step with in_kernel_rng="threefry" is bit-identical to the
    XLA-side bulk-uniform path, including through forced all-lane resets (the
    only consumer of the uniforms)."""
    cfg = dataclasses.replace(
        space_gym_tpu.get_config("GoalContinuous2P-v0"), max_episode_steps=1
    )
    B = 8
    act = jnp.zeros((B, 2), jnp.float32)
    outs = {}
    for mode in (False, "threefry"):
        eng = EnvEngine(cfg, physics="pallas", dtype=jnp.float32,
                        pallas_fuse="full", in_kernel_rng=mode)
        state, _ = eng.init(jax.random.key(0), B)
        for i in range(2):
            state, ts = eng.step(state, act, jax.random.key(50 + i))
        outs[mode] = (np.asarray(state.y), np.asarray(state.goal_pos),
                      np.asarray(ts.obs), np.asarray(ts.reward))
    for a, b in zip(outs[False], outs["threefry"]):
        assert (a.view(np.uint32) == b.view(np.uint32)).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu hardware PRNG lowers only on TPU")
def test_in_kernel_rng_hw_law_smoke():
    """The hardware-PRNG mode ("hw") draws its own stream: resets must land in
    the same supports as the XLA path (law parity), but the bits differ."""
    cfg = dataclasses.replace(
        space_gym_tpu.get_config("GoalContinuous2P-v0"), max_episode_steps=1
    )
    B = 256
    act = jnp.zeros((B, 2), jnp.float32)
    ys = {}
    for mode in (False, "hw"):
        eng = EnvEngine(cfg, physics="pallas", dtype=jnp.float32,
                        pallas_fuse="full", in_kernel_rng=mode)
        state, _ = eng.init(jax.random.key(0), B)
        state, ts = eng.step(state, act, jax.random.key(7))
        ys[mode] = np.asarray(state.y)
    y = ys["hw"]
    assert np.isfinite(y).all()
    ws = cfg.world_size
    assert (np.abs(y[:, :2]) <= ws / 2 + 1e-5).all()
    assert (y[:, :2] != ys[False][:, :2]).any()  # different stream
