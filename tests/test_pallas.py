"""Pallas fused physics kernel vs the XLA fixed-substep path.

Interpret mode executes the unrolled ~5k-op kernel op-by-op, so only one
representative equivalence test runs by default (~40 s); the full matrix
(all env families, event-surface test, engine end-to-end) runs with
SGT_SLOW_TESTS=1 or natively on a TPU backend where the compiled kernel is
fast.  The TPU bench pins the compiled kernel daily.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

SLOW = os.environ.get("SGT_SLOW_TESTS") == "1" or jax.default_backend() == "tpu"
slow_only = pytest.mark.skipif(
    not SLOW, reason="interpret-mode kernel is slow; set SGT_SLOW_TESTS=1"
)

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.ops.pallas_step import make_fused_step


@pytest.mark.parametrize(
    "env_id",
    [
        "GoalContinuous2P-v0",
        pytest.param("KeplerCircleOrbit-v0", marks=slow_only),
        pytest.param("DoNotCrashContinuous-v0", marks=slow_only),
    ],
)
def test_kernel_matches_fixed_path(env_id):
    cfg = space_gym_tpu.get_config(env_id)
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float32)
    B = 128
    state, obs = eng.init(jax.random.key(0), B)
    a = jax.random.uniform(jax.random.key(1), (B, 2), jnp.float32, minval=-1, maxval=1)
    ab = jax.vmap(eng._translate_action)(a)
    fused = make_fused_step(
        cfg.ship, cfg.planet_masses, cfg.planet_radii, cfg.world_size,
        cfg.max_abs_vel_angle, cfg.step_size, 2, 12, block=B, interpret=True,
    )
    y = state.y
    n_term_total = 0
    for step in range(2):
        yr, tr = jax.jit(jax.vmap(eng._physics))(y, ab, state.planets_pos)
        yp, tp = fused(y, ab, state.planets_pos)
        tr, tp = np.asarray(tr), np.asarray(tp)
        np.testing.assert_array_equal(tr, tp, err_msg=f"step {step}")
        np.testing.assert_allclose(
            np.asarray(yp), np.asarray(yr), rtol=0, atol=5e-6, err_msg=f"step {step}"
        )
        n_term_total += int(tr.sum())
        # Keep only live lanes advancing (dead lanes frozen like the engine).
        y = jnp.where(tp[:, None], y, yp)
    assert np.isfinite(np.asarray(y)).all()


def test_bs3_tableau_consistency():
    """Order/consistency conditions for the Bogacki-Shampine 3(2) constants.

    The bench-default throughput config runs the Pallas body with
    tableau="bs3" (ops/rk45.py BS3_*); these closed-form identities pin the
    constants independently of any integrator run:
      - third-order conditions: sum(b)=1, b.c=1/2, b.c^2=1/3, b.A.c=1/6;
      - the cubic dense interpolant evaluated at x=1 reproduces b with zero
        weight on the FSAL stage (so "state at substep end" == the RK update).
    The DP5 quartic interpolant satisfies the same endpoint identity.
    """
    from space_gym_tpu.ops.rk45 import (BS3_A, BS3_B, BS3_P, DP_B, DP_P)

    c = [0.0, 1 / 2, 3 / 4]
    b = list(BS3_B)
    assert abs(sum(b) - 1.0) < 1e-15
    assert abs(sum(bi * ci for bi, ci in zip(b, c)) - 0.5) < 1e-15
    assert abs(sum(bi * ci * ci for bi, ci in zip(b, c)) - 1 / 3) < 1e-15
    bAc = sum(
        b[i] * sum(BS3_A[i][j] * c[j] for j in range(len(BS3_A[i])))
        for i in range(3)
    )
    assert abs(bAc - 1 / 6) < 1e-15
    for P, B_ in ((BS3_P, BS3_B), (DP_P, DP_B)):
        endpoint = [sum(row) for row in P]  # Q(1) per stage
        for i, bi in enumerate(B_):
            assert abs(endpoint[i] - bi) < 1e-12, (i, endpoint[i], bi)
        for extra in endpoint[len(B_):]:  # FSAL stage weight
            assert abs(extra) < 1e-12


def test_kernel_bs3_sub1_matches_fixed_oracle():
    """The bench-default physics config (tableau="bs3", substeps=1) agrees
    with the DP5 x 2-substep fixed oracle: termination flags exact, live-lane
    state within the golden-tier tolerance.  BS3 x 1 unrolls ~4x fewer ops
    than the default DP5 x 2 interpret test, so this runs ungated."""
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float32)
    B = 128
    state, _ = eng.init(jax.random.key(3), B)
    a = jax.random.uniform(jax.random.key(4), (B, 2), jnp.float32, minval=-1, maxval=1)
    ab = jax.vmap(eng._translate_action)(a)
    fused = make_fused_step(
        cfg.ship, cfg.planet_masses, cfg.planet_radii, cfg.world_size,
        cfg.max_abs_vel_angle, cfg.step_size, n_substeps=1, refine_iters=12,
        block=B, interpret=True, tableau="bs3",
    )
    y = state.y
    for step in range(2):
        yr, tr = jax.jit(jax.vmap(eng._physics))(y, ab, state.planets_pos)
        yp, tp = fused(y, ab, state.planets_pos)
        tr, tp = np.asarray(tr), np.asarray(tp)
        np.testing.assert_array_equal(tr, tp, err_msg=f"step {step}")
        live = ~tr
        np.testing.assert_allclose(
            np.asarray(yp)[live], np.asarray(yr)[live], rtol=0, atol=2e-5,
            err_msg=f"step {step}",
        )
        y = jnp.where(tp[:, None], y, yp)
    assert np.isfinite(np.asarray(y)).all()


@slow_only
def test_kernel_event_state_on_surface():
    """Crash lanes come back at the event time (on the planet surface)."""
    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    B = 128
    fused = make_fused_step(
        cfg.ship, cfg.planet_masses, cfg.planet_radii, cfg.world_size,
        cfg.max_abs_vel_angle, cfg.step_size, 2, 20, block=B, interpret=True,
    )
    # All lanes aimed at the planet from 0.3 at speed 2 -> crash mid-step.
    y0 = jnp.tile(jnp.asarray([[0.3, 0.0, 0.0, -2.0, 0.0, 0.0]], jnp.float32), (B, 1))
    a = jnp.zeros((B, 2), jnp.float32)
    planets = jnp.tile(jnp.asarray(cfg.fixed_planet_pos, jnp.float32)[None], (B, 1, 1))
    y, term = fused(y0, a, planets)
    assert bool(np.asarray(term).all())
    r = np.hypot(np.asarray(y)[:, 0], np.asarray(y)[:, 1])
    np.testing.assert_allclose(r, cfg.dnc.planet_radius, atol=5e-5)


@slow_only
def test_engine_pallas_mode_end_to_end():
    cfg = space_gym_tpu.get_config("GoalContinuous2P-v0")
    engf = EnvEngine(cfg, physics="fixed", dtype=jnp.float32)
    engp = EnvEngine(cfg, physics="pallas", dtype=jnp.float32)
    sf, of = engf.init(jax.random.key(0), 128)
    sp, op = engp.init(jax.random.key(0), 128)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(op))
    a = jax.random.uniform(jax.random.key(1), (128, 2), jnp.float32, minval=-1, maxval=1)
    sf, tf = engf.step(sf, a, jax.random.key(2))
    sp, tp = engp.step(sp, a, jax.random.key(2))
    # Same RNG stream + near-identical physics => near-identical step.
    np.testing.assert_array_equal(np.asarray(tf.done), np.asarray(tp.done))
    np.testing.assert_allclose(
        np.asarray(tp.reward), np.asarray(tf.reward), rtol=0, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(tp.obs), np.asarray(tf.obs), rtol=0, atol=1e-4
    )
