"""Physics property tests (SURVEY.md §4, item 3): conservation laws on
thrust-free trajectories and termination-boundary invariants — the invariant
tier the reference never had."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import space_gym_tpu
from space_gym_tpu.engine import EnvEngine
from space_gym_tpu.envs import kepler_math
from space_gym_tpu.ops.constants import G


def coast_trajectory(physics, substeps, n_steps=200):
    """Zero-thrust Kepler coast on a bound orbit through the engine physics."""
    cfg = space_gym_tpu.get_config("KeplerCircleOrbit-v0")
    eng = EnvEngine(cfg, physics=physics, dtype=jnp.float64, substeps=substeps)
    alpha_gm = G * cfg.kepler.planet_mass
    # Circular-orbit speed at r=1.2.
    r0 = 1.2
    v0 = np.sqrt(alpha_gm / r0)
    y = jnp.asarray([r0, 0.0, 0.0, 0.0, v0, 0.0], jnp.float64)
    action = jnp.asarray([-1.0, 0.0], jnp.float64)  # engine=(a0+1)/2=0 after translate
    a = eng._translate_action(action)
    assert float(a[0]) == 0.0
    planets = jnp.asarray(cfg.fixed_planet_pos, jnp.float64)
    phys = jax.jit(eng._physics)
    states = [np.asarray(y)]
    for _ in range(n_steps):
        y, term = phys(y, a, planets)
        assert not bool(term)
        states.append(np.asarray(y))
    return np.array(states), alpha_gm


@pytest.mark.parametrize("physics,substeps,tol_e,tol_l", [
    ("fixed", 2, 1e-8, 1e-10),
    ("fixed", 1, 1e-7, 1e-9),
    ("adaptive", 2, 1e-4, 1e-6),  # reference-tolerance controller (rtol=1e-3)
])
def test_coast_conserves_energy_and_momentum(physics, substeps, tol_e, tol_l):
    states, alpha_gm = coast_trajectory(physics, substeps)
    E = kepler_math.specific_energy(np, alpha_gm, states[:, 0:2], states[:, 3:5])
    L = kepler_math.angular_momentum(np, states[:, 0:2], states[:, 3:5])
    assert np.max(np.abs(E - E[0])) / abs(E[0]) < tol_e
    assert np.max(np.abs(L - L[0])) / abs(L[0]) < tol_l


def test_lrl_vector_conserved_on_ellipse():
    states, alpha_gm = coast_trajectory("fixed", 2)
    A = kepler_math.lrl_vector(np, alpha_gm, states[:, 0:2], states[:, 3:5])
    drift = np.linalg.norm(A - A[0], axis=-1).max()
    assert drift < 1e-8 * alpha_gm


def test_fixed_integrator_is_higher_accuracy_than_reference_setting():
    """One orbital period round-trip error: the fixed 2-substep DP5 path beats
    the reference's adaptive rtol=1e-3 configuration on the same orbit."""
    sf, alpha = coast_trajectory("fixed", 2, n_steps=400)
    sa, _ = coast_trajectory("adaptive", 2, n_steps=400)
    r_f = np.hypot(sf[:, 0], sf[:, 1])
    r_a = np.hypot(sa[:, 0], sa[:, 1])
    # Circular orbit: radius should stay 1.2.
    assert np.abs(r_f - 1.2).max() < np.abs(r_a - 1.2).max()
    assert np.abs(r_f - 1.2).max() < 1e-6


def test_termination_states_respect_boundaries():
    """Auto-reset engine never leaves a live lane outside the world or inside
    a planet by more than the event-refinement tolerance."""
    cfg = space_gym_tpu.get_config("DoNotCrashContinuous-v0")
    eng = EnvEngine(cfg, physics="fixed", dtype=jnp.float64)
    state, obs = eng.init(jax.random.key(0), 256)
    pol = eng.random_policy()
    state, obs, traj = eng.rollout(state, obs, jax.random.key(1), pol, 300)
    # Live states (post auto-reset) always inside the border annulus.
    xy = np.asarray(traj.obs[..., 0:2]).reshape(-1, 2)
    r = np.hypot(xy[:, 0], xy[:, 1])
    tol = 2e-4
    assert r.max() <= cfg.dnc.border_radius + tol
    # final_obs of terminated lanes: at/past a boundary (that's why they died),
    # but never deep inside the planet (event refinement caught the crossing).
    term = np.asarray(traj.terminated).reshape(-1)
    fxy = np.asarray(traj.final_obs[..., 0:2]).reshape(-1, 2)[term]
    fr = np.hypot(fxy[:, 0], fxy[:, 1])
    fw = np.abs(np.asarray(traj.final_obs[..., 5]).reshape(-1)[term])
    crashed_planet = fr <= cfg.dnc.planet_radius + tol
    left_border = fr >= cfg.dnc.border_radius - tol
    overspin = fw >= cfg.max_abs_vel_angle - 1e-3
    assert (crashed_planet | left_border | overspin).all()
    assert fr.min() >= cfg.dnc.planet_radius - tol


def test_adaptive_solver_fails_loud_on_singular_lane():
    """Failure surfacing (SURVEY §5: the reference's only failure check is
    `assert ode_solution.success`): a lane with singular gravity (ship AT a
    planet centre -> non-finite RHS) must NaN-POISON that lane and leave the
    rest of the batch intact.  Regression: a NaN error estimate used to turn
    the step-size controller's h into NaN, and `nan < min_step` is False, so
    the adaptive while_loop spun forever — one bad lane wedged the whole
    lockstep batch."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine

    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"),
                    physics="adaptive")
    state, _ = eng.init(jax.random.key(0), 4)
    y = np.array(np.asarray(state.y), copy=True)
    y[0, :2] = np.asarray(state.planets_pos)[0, 0]
    state = state._replace(y=jnp.asarray(y))
    state2, ts = eng._step_batched(
        state, jnp.zeros((4, 2), jnp.float32), jax.random.key(1))
    assert not np.isfinite(np.asarray(state2.y[0])).any()   # poisoned, loud
    assert np.isfinite(np.asarray(state2.y[1:])).all()      # others intact
