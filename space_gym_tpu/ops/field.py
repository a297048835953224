"""Ship ODE vector field (L1 physics core).

Behavioral contract (reference gym_space/dynamic_model.py:129-176):

* state vector y = [x, y, theta, vx, vy, omega]
* engine thrust acts along -heading, scaled by max_engine_force
* thruster torque scaled by max_thruster_force
* Steering.acceleration: domega/dt = torque / moi
* Steering.velocity: the reference OVERWRITES omega in place with
  thruster_action * 5.0 on every RHS evaluation (dynamic_model.py:138-141; the
  comment upstream says 4 but the code says 5.0 — we replicate 5.0).  Because
  domega/dt == 0 in that mode, the in-place mutation is functionally equivalent
  to forcing omega := 5*thruster once at the start of each control step and
  using a plain RHS.  `apply_steering_override` implements that pre-step
  override; `ship_vector_field` is then a pure function.

Gravity is accumulated over planets sequentially in planet order so the f64
floating-point addition order matches the reference loop
(dynamic_model.py:155-157) for bitwise parity.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import exact, maths

STEERING_ACCELERATION = 0
STEERING_VELOCITY = 1
VELOCITY_STEERING_SCALE = 5.0  # dynamic_model.py:140 (comment says 4, code says 5.0)


class ShipParams(NamedTuple):
    """Static ship parameters (reference gym_space/ship_params.py:11-17)."""

    steering: int  # 0 = acceleration, 1 = velocity (2 = angle: never implemented upstream)
    mass: float
    moi: float  # moment of inertia
    max_engine_force: float
    max_thruster_force: float


def apply_steering_override(
    ship: ShipParams, y: jax.Array, action: jax.Array, f32_action: bool = False
) -> jax.Array:
    """Pre-step state fixup equivalent to the reference's in-place RHS mutation.

    In velocity steering the reference sets y[5] := thruster * 5.0 inside every
    RHS call (dynamic_model.py:138-141); since the mutated component has zero
    derivative this equals overriding it once before integrating.

    `f32_action=True` replicates the continuous envs' mixed precision: the
    raw action is float32 (spaceship_env.py:69-71) and NumPy>=2 evaluates
    float32 * python-float in float32, so the override value is f32-rounded
    before landing in the f64 state.
    """
    if ship.steering == STEERING_VELOCITY:
        thr = action[..., 1]
        if f32_action:
            val = (thr.astype(jnp.float32) * jnp.float32(VELOCITY_STEERING_SCALE)).astype(y.dtype)
        else:
            val = VELOCITY_STEERING_SCALE * thr
        return y.at[..., 5].set(val)
    return y


def ship_vector_field(
    ship: ShipParams,
    planet_masses: Sequence[float],
    planets_pos: jax.Array,  # (P, 2)
    action: jax.Array,  # (2,) = (engine in [0,1], thruster in [-1,1])
    y: jax.Array,  # (6,)
    f32_action: bool = False,
) -> jax.Array:
    """dy/dt for the ship (dynamic_model.py:129-176), pure-functional.

    `planet_masses` is a static sequence (python floats) so the per-planet
    accumulation unrolls at trace time; `planets_pos` is a traced (P, 2) array
    because Goal envs re-sample planet positions every episode.

    `f32_action=True` replicates the continuous envs' mixed precision under
    NumPy>=2: the float32 action times python-float ship constants stays
    float32 (engine force scalar, thruster torque, torque/moi) before being
    combined with the f64 state — these roundings are visible in reference
    trajectories.
    """
    engine_action = action[..., 0]
    thruster_action = action[..., 1]
    pos_xy = y[..., 0:2]
    angle = y[..., 2]

    # External force due to the action (dynamic_model.py:168-176).
    if f32_action:
        f32 = jnp.float32
        engine_force_scalar = (
            engine_action.astype(f32) * f32(ship.max_engine_force)
        ).astype(y.dtype)
        ext_force_angle_f32 = thruster_action.astype(f32) * f32(ship.max_thruster_force)
        ext_force_angle = ext_force_angle_f32.astype(y.dtype)
    else:
        engine_force_scalar = engine_action * ship.max_engine_force
        ext_force_angle = thruster_action * ship.max_thruster_force
    engine_force_direction = -maths.angle_to_unit_vector(angle)
    ext_force_xy = engine_force_direction * engine_force_scalar[..., None]

    # Gravity accumulated planet-by-planet in order (dynamic_model.py:155-157).
    force_xy = ext_force_xy
    for i, mass in enumerate(planet_masses):
        force_xy = force_xy + maths.gravity_force(
            pos_xy, planets_pos[..., i, :], ship.mass, mass
        )
    # exact.divc: numpy emits a true division by the constant ship mass/moi;
    # XLA's reciprocal strength-reduction is 1 ulp off (parity-mode guard).
    acceleration_xy = exact.divc(force_xy, ship.mass)

    if ship.steering == STEERING_ACCELERATION:
        if f32_action:
            # f32 torque / python-float moi stays f32 upstream (dynamic_model.py:161)
            acceleration_angle = exact.divc(
                ext_force_angle_f32, jnp.float32(ship.moi)
            ).astype(y.dtype)
        else:
            acceleration_angle = exact.divc(ext_force_angle, ship.moi)
    else:
        acceleration_angle = jnp.zeros_like(ext_force_angle)

    return jnp.concatenate(
        [
            y[..., 3:6],
            acceleration_xy,
            acceleration_angle[..., None],
        ],
        axis=-1,
    )


def wrap_ship_angle(y: jax.Array) -> jax.Array:
    """theta := theta mod 2*pi, applied after each control step (dynamic_model.py:179-180)."""
    return y.at[..., 2].set(jnp.mod(y[..., 2], 2 * jnp.pi))
