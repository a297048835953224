"""Termination event functions.

Mirrors gym_space/dynamic_model.py:183-217: continuous functions of the state
that are positive iff the state is non-terminal.  All are `terminal=True`
upstream with direction 0, so a termination fires on any sign change of any
component between consecutive accepted integrator steps.

Event vector layout (order matters — it is the tie-break order on simultaneous
roots, matching the list construction order upstream):
    [per-planet crash (P entries), world_max, world_min, angular_velocity]

The "border-as-planet" trick (DoNotCrash/Kepler fly *inside* a zero-mass planet
whose radius is the outer boundary — do_not_crash.py:17-18, kepler.py:205-206)
needs no special handling: the planet-crash event distance goes negative when
leaving the border disk.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import exact


def make_event_fn(
    planet_radii: Sequence[float],
    world_size: float,
    max_abs_vel_angle: float,
):
    """Build `g(planets_pos, y) -> (E,)`, E = P + 3.

    Components positive iff non-terminal:
      * planet i:  ||planet_i - ship_xy|| - radius_i      (dynamic_model.py:187-194)
      * world max: min(ws/2 - x, ws/2 - y)                (dynamic_model.py:196-201)
      * world min: min(ws/2 + x, ws/2 + y)                (dynamic_model.py:203-208)
      * ang. vel.: max_abs_vel_angle - |omega|            (dynamic_model.py:210-215)
    """
    radii = tuple(float(r) for r in planet_radii)
    half = world_size / 2

    def event_fn(planets_pos: jax.Array, y: jax.Array) -> jax.Array:
        pos_xy = y[0:2]
        # Parity: the reference's per-planet event is np.linalg.norm of a
        # 2-vector — numpy's 1-D norm = sqrt(BLAS ddot) (ops.exact).
        planet_g = exact.norm_last(planets_pos - pos_xy) - jnp.asarray(
            radii, dtype=y.dtype
        )
        world_max = jnp.min(half - pos_xy)
        world_min = jnp.min(half + pos_xy)
        ang_vel = max_abs_vel_angle - jnp.abs(y[5])
        return jnp.concatenate(
            [planet_g, jnp.stack([world_max, world_min, ang_vel])]
        )

    return event_fn


def make_event_component_fns(
    planet_radii: Sequence[float],
    world_size: float,
    max_abs_vel_angle: float,
):
    """Per-event scalar versions of `make_event_fn`, as a static tuple.

    The fixed-substep integrator root-finds each event separately; giving it
    one scalar function per event lets XLA dead-code-eliminate the unused
    state components of the dense-output polynomial (planet/world events read
    only x,y; the angular-velocity event reads only omega), instead of
    evaluating the full event vector at every bisection candidate.
    """
    radii = tuple(float(r) for r in planet_radii)
    half = world_size / 2

    fns = []
    for i, r in enumerate(radii):
        def planet_ev(planets_pos, y, i=i, r=r):
            return exact.norm_last(planets_pos[i] - y[0:2]) - r

        fns.append(planet_ev)
    fns.append(lambda planets_pos, y: jnp.min(half - y[0:2]))
    fns.append(lambda planets_pos, y: jnp.min(half + y[0:2]))
    fns.append(lambda planets_pos, y: max_abs_vel_angle - jnp.abs(y[5]))
    return tuple(fns)


def crossings(g_old: jax.Array, g_new: jax.Array) -> jax.Array:
    """Sign-change mask, replicating scipy's find_active_events with direction=0:
    up = (g_old <= 0) & (g_new >= 0); down = (g_old >= 0) & (g_new <= 0)."""
    up = (g_old <= 0) & (g_new >= 0)
    down = (g_old >= 0) & (g_new <= 0)
    return up | down
