"""Integrator parity: space_gym_tpu.ops.rk45.solve_step vs scipy solve_ivp.

These tests run the *actual ship dynamics* (GoalContinuous-style velocity
steering and DoNotCrash-style acceleration steering) through both integrators
from identical f64 initial states and assert near-bitwise agreement of the end
state, the termination flag, and (on termination) the event-time state.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial
from scipy.integrate import solve_ivp

from space_gym_tpu.ops import rk45, field, events
from space_gym_tpu.ops.constants import G


def np_rhs(ship: field.ShipParams, planet_masses, planets_pos, action):
    """Reference-style numpy RHS (independent rewrite of dynamic_model.py:129-176)."""

    def rhs(_t, y):
        engine, thruster = action
        fx = -np.cos(y[2]) * engine * ship.max_engine_force
        fy = -np.sin(y[2]) * engine * ship.max_engine_force
        for m, p in zip(planet_masses, planets_pos):
            d = p - y[0:2]
            dist = np.linalg.norm(d)
            f = (d / dist) * (G * ship.mass * m / dist**2)
            fx += f[0]
            fy += f[1]
        ax, ay = fx / ship.mass, fy / ship.mass
        if ship.steering == field.STEERING_ACCELERATION:
            aang = thruster * ship.max_thruster_force / ship.moi
        else:
            y[5] = field.VELOCITY_STEERING_SCALE * thruster  # in-place, like upstream
            aang = 0.0
        return np.array([y[3], y[4], y[5], ax, ay, aang])

    return rhs


def np_events(planet_radii, planets_pos, world_size, max_abs_vel_angle):
    evs = []
    for r, p in zip(planet_radii, planets_pos):
        def ev(_t, y, r=r, p=p):
            return np.linalg.norm(p - y[0:2]) - r

        ev.terminal = True
        evs.append(ev)

    def world_max(_t, y):
        return np.min(world_size / 2 - y[0:2])

    def world_min(_t, y):
        return np.min(world_size / 2 + y[0:2])

    def ang_vel(_t, y):
        return max_abs_vel_angle - np.abs(y[5])

    for ev in (world_max, world_min, ang_vel):
        ev.terminal = True
        evs.append(ev)
    return evs


GOAL_SHIP = field.ShipParams(
    steering=field.STEERING_VELOCITY, mass=1.0, moi=0.01,
    max_engine_force=0.4, max_thruster_force=0.05,
)
DNC_SHIP = field.ShipParams(
    steering=field.STEERING_ACCELERATION, mass=1.0, moi=0.05,
    max_engine_force=0.3, max_thruster_force=0.05,
)


def run_both(ship, planet_masses, planet_radii, planets_pos, world_size, max_w, y0, action, t1):
    planets_pos = np.asarray(planets_pos, np.float64)
    y0 = np.asarray(y0, np.float64)
    action = np.asarray(action, np.float64)

    # scipy path (mirrors make_step, dynamic_model.py:94-125)
    rhs = np_rhs(ship, planet_masses, planets_pos, action)
    y0_scipy = y0.copy()
    sol = solve_ivp(
        rhs, (0, t1), y0_scipy, method="RK45",
        events=np_events(planet_radii, planets_pos, world_size, max_w),
    )
    assert sol.success
    y_ref = sol.y[:, -1]
    done_ref = sol.status == 1

    # JAX path
    jpos = jnp.asarray(planets_pos)

    def jrhs(t, y):
        return field.ship_vector_field(ship, planet_masses, jpos, jnp.asarray(action), y)

    ev = events.make_event_fn(planet_radii, world_size, max_w)
    y0j = field.apply_steering_override(ship, jnp.asarray(y0), jnp.asarray(action))
    out = jax.jit(partial(rk45.solve_step, jrhs, lambda y: ev(jpos, y)))(y0j, t1)
    return y_ref, done_ref, np.asarray(out.y), bool(out.terminated), out


def test_velocity_steering_free_flight():
    planets_pos = [[0.4, -0.3], [-0.8, 0.9]]
    y0 = [0.1, 0.2, 1.3, 0.05, -0.02, 0.0]
    y_ref, done_ref, y_jax, done_jax, out = run_both(
        GOAL_SHIP, (5e8, 5e8), (0.3, 0.3), planets_pos, 3.0, 6.0, y0, [0.7, -0.4], 0.07
    )
    assert not done_ref and not done_jax
    np.testing.assert_allclose(y_jax, y_ref, rtol=0, atol=1e-13)


def test_acceleration_steering_free_flight():
    planets_pos = [[0.0, 0.0], [0.0, 0.0]]
    y0 = [0.5, 0.1, 2.0, 0.01, 0.04, 0.3]
    y_ref, done_ref, y_jax, done_jax, _ = run_both(
        DNC_SHIP, (6e8, 0.0), (0.25, 1.0), planets_pos, 2.0, 5.0, y0, [1.0, 1.0], 0.07
    )
    assert not done_ref and not done_jax
    np.testing.assert_allclose(y_jax, y_ref, rtol=0, atol=1e-13)


def test_planet_crash_event_state_at_event_time():
    # Aim the ship at the planet with high velocity so it crashes inside the step.
    planets_pos = [[0.0, 0.0], [0.0, 0.0]]
    y0 = [0.5, 0.0, np.pi, -4.5, 0.0, 0.0]  # heading toward planet at r=0.25
    y_ref, done_ref, y_jax, done_jax, out = run_both(
        DNC_SHIP, (6e8, 0.0), (0.25, 1.0), planets_pos, 2.0, 5.0, y0, [0.0, 0.0], 0.07
    )
    assert done_ref and done_jax
    # The returned state is the state AT the event time (quirk Q8): the ship
    # sits exactly on the planet surface.
    assert abs(np.linalg.norm(y_ref[:2]) - 0.25) < 1e-9
    np.testing.assert_allclose(y_jax, y_ref, rtol=0, atol=1e-12)


def test_world_boundary_event():
    planets_pos = [[0.0, 0.0], [0.0, 0.0]]
    y0 = [0.9, 0.0, 0.0, 3.0, 0.0, 0.0]  # flying out of the +x boundary at 1.0
    y_ref, done_ref, y_jax, done_jax, _ = run_both(
        GOAL_SHIP, (0.0, 0.0), (0.25, 1e9), planets_pos, 2.0, 5.0, y0, [-1.0, 0.0], 0.07
    )
    assert done_ref and done_jax
    np.testing.assert_allclose(y_jax, y_ref, rtol=0, atol=1e-12)


def test_angular_velocity_event_acceleration_steering():
    planets_pos = [[0.0, 0.0]]
    y0 = [0.5, 0.5, 0.0, 0.0, 0.0, 4.9]
    # strong thruster pushes omega over the 5.0 cap mid-step
    y_ref, done_ref, y_jax, done_jax, _ = run_both(
        DNC_SHIP, (0.0,), (0.25,), planets_pos, 4.0, 5.0, y0, [0.0, 1.0], 0.5
    )
    assert done_ref and done_jax
    np.testing.assert_allclose(y_jax, y_ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("seed", range(25))
def test_random_states_match(seed):
    rng = np.random.RandomState(seed)
    planets_pos = rng.uniform(-1, 1, (2, 2))
    y0 = np.concatenate([
        rng.uniform(-1.2, 1.2, 2),
        [rng.uniform(0, 2 * np.pi)],
        rng.standard_normal(2) * 0.2,
        [rng.uniform(-4, 4)],
    ])
    action = [rng.uniform(0, 1), rng.uniform(-1, 1)]
    y_ref, done_ref, y_jax, done_jax, _ = run_both(
        GOAL_SHIP, (5e8, 5e8), (0.3, 0.3), planets_pos, 3.0, 6.0, y0, action, 0.07
    )
    assert done_ref == done_jax
    np.testing.assert_allclose(y_jax, y_ref, rtol=0, atol=1e-12)


def test_vmap_batch():
    ship = GOAL_SHIP
    jpos = jnp.asarray([[0.4, -0.3], [-0.8, 0.9]], jnp.float64)
    ev = events.make_event_fn((0.3, 0.3), 3.0, 6.0)

    def one(y0, action):
        def jrhs(t, y):
            return field.ship_vector_field(ship, (5e8, 5e8), jpos, action, y)

        y0 = field.apply_steering_override(ship, y0, action)
        return rk45.solve_step(jrhs, lambda y: ev(jpos, y), y0, 0.07)

    rng = np.random.RandomState(0)
    y0s = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-1, 1, (16, 2)),
                rng.uniform(0, 2 * np.pi, (16, 1)),
                rng.standard_normal((16, 2)) * 0.1,
                rng.uniform(-4, 4, (16, 1)),
            ],
            axis=1,
        )
    )
    actions = jnp.asarray(rng.uniform(-1, 1, (16, 2)))
    out = jax.jit(jax.vmap(one))(y0s, actions)
    assert out.y.shape == (16, 6)
    # cross-check lane 3 against the single-env path
    single = one(y0s[3], actions[3])
    np.testing.assert_array_equal(np.asarray(single.y), np.asarray(out.y[3]))
