"""Pallas TPU kernel: the fused fixed-substep physics step.

Same semantics as ops.fixed_rk.fixed_solve_step (static Dormand-Prince 5(4)
substeps + per-event dense-output bisection, state returned at the earliest
event time), but laid out TPU-first:

* **component-major layout** — state is (6, B), planets (2P, B), action
  (2, B): the lane axis rides the VPU's 128-wide lane dimension at full
  occupancy, instead of wasting 122/128 lanes on a (B, 6) row layout;
* **one kernel per control step** — every intermediate of the ~5k-op substep
  chain (RK stages, dense coefficients, bisection iterates) lives in
  VMEM/registers for a whole lane block; nothing round-trips to HBM between
  the unrolled operations;
* grid over lane blocks of `block` lanes (default 1024, the measured sweet
  spot: 74/97/86/60 M physics-steps/s at block 256/1024/2048/4096 on one
  chip).

The engine uses it via `EnvEngine(..., physics="pallas")`; `interpret=True`
makes the same kernel run (slowly) on CPU for tests.  Dynamics reference:
gym_space/dynamic_model.py:129-217 (see ops/field.py and ops/events.py for
the semantics contract; this kernel must agree with ops.fixed_rk to fp
tolerance, enforced by tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import G
from .field import STEERING_ACCELERATION, STEERING_VELOCITY, VELOCITY_STEERING_SCALE, ShipParams
from .rk45 import DP_A, DP_B, DP_P, N_STAGES


def _wsum(vecs, coeffs):
    acc = vecs[0] * coeffs[0]
    for v, c in zip(vecs[1:], coeffs[1:]):
        acc = acc + v * c
    return acc


def make_fused_step(
    ship: ShipParams,
    planet_masses: Sequence[float],
    planet_radii: Sequence[float],
    world_size: float,
    max_abs_vel_angle: float,
    step_size: float,
    n_substeps: int = 2,
    refine_iters: int = 12,
    block: int = 1024,
    interpret: bool = False,
):
    """Build `step(y (B,6), action (B,2), planets (B,P,2)) -> (y', terminated)`.

    All config is static (baked into the kernel); B must be a multiple of
    `block`.
    """
    n_planets = len(planet_masses)
    n_events = n_planets + 3
    half = world_size / 2
    radii = tuple(float(r) for r in planet_radii)
    masses = tuple(float(m) for m in planet_masses)
    h = step_size / n_substeps

    # ---- component-major physics on (block,) vectors -------------------
    def rhs(comp, px, py, ae, at):
        """comp: list of 6 (block,) arrays [x, y, th, vx, vy, w]."""
        x, y, th, vx, vy, w = comp
        efs = ae * ship.max_engine_force
        fx = -jnp.cos(th) * efs
        fy = -jnp.sin(th) * efs
        for i in range(n_planets):
            dx = px[i] - x
            dy = py[i] - y
            d2 = dx * dx + dy * dy
            inv_d = jax.lax.rsqrt(d2)
            s = (G * ship.mass * masses[i]) / d2 * inv_d
            fx = fx + dx * s
            fy = fy + dy * s
        if ship.steering == STEERING_ACCELERATION:
            aang = at * (ship.max_thruster_force / ship.moi)
        else:
            aang = jnp.zeros_like(at)
        return [vx, vy, w, fx / ship.mass, fy / ship.mass, aang]

    def events(comp, px, py):
        x, y, _, _, _, w = comp
        out = []
        for i in range(n_planets):
            dx = px[i] - x
            dy = py[i] - y
            out.append(jnp.sqrt(dx * dx + dy * dy) - radii[i])
        out.append(jnp.minimum(half - x, half - y))
        out.append(jnp.minimum(half + x, half + y))
        out.append(max_abs_vel_angle - jnp.abs(w))
        return out

    def lcomb(stacks, coeffs):
        """Per-component weighted sum over RK stages."""
        return [_wsum([st[c] for st in stacks], coeffs) for c in range(6)]

    def kernel(y_ref, a_ref, p_ref, yo_ref, term_ref):
        comp = [y_ref[c, :] for c in range(6)]
        ae = a_ref[0, :]
        at = a_ref[1, :]
        px = [p_ref[2 * i, :] for i in range(n_planets)]
        py = [p_ref[2 * i + 1, :] for i in range(n_planets)]

        if ship.steering == STEERING_VELOCITY:
            comp[5] = VELOCITY_STEERING_SCALE * at

        dt = y_ref.dtype
        f = rhs(comp, px, py, ae, at)
        g = events(comp, px, py)
        zeros = jnp.zeros_like(comp[0])
        terminated = zeros > 1.0  # all-False (block,) bool
        y_final = [c + 0.0 for c in comp]
        t = 0.0

        for _ in range(n_substeps):
            # Dormand-Prince stages (unrolled; FSAL).
            K = [f]
            for s in range(1, N_STAGES):
                dy = lcomb(K, DP_A[s])
                ys = [comp[c] + dy[c] * h for c in range(6)]
                K.append(rhs(ys, px, py, ae, at))
            inc = lcomb(K, DP_B)
            y_new = [comp[c] + h * inc[c] for c in range(6)]
            f_new = rhs(y_new, px, py, ae, at)
            K.append(f_new)

            g_new = events(y_new, px, py)
            active = []
            for e in range(n_events):
                up = (g[e] <= 0) & (g_new[e] >= 0)
                down = (g[e] >= 0) & (g_new[e] <= 0)
                active.append(up | down)
            any_event = active[0]
            for e in range(1, n_events):
                any_event = any_event | active[e]
            fire = any_event & ~terminated

            # Quartic dense output Q[c][m] (per component, 4 coefficients).
            Q = [
                [_wsum([st[c] for st in K], tuple(DP_P[j][m] for j in range(7)))
                 for m in range(4)]
                for c in range(6)
            ]
            t0 = t

            def sol(tq):
                xq = (tq - t0) / h
                p1 = xq
                p2 = p1 * xq
                p3 = p2 * xq
                p4 = p3 * xq
                return [
                    h * (Q[c][0] * p1 + Q[c][1] * p2 + Q[c][2] * p3 + Q[c][3] * p4)
                    + comp[c]
                    for c in range(6)
                ]

            def sol_events(tq):
                return events(sol(tq), px, py)

            # Per-event bisection (unrolled) on [t, t+h].
            roots = []
            for e in range(n_events):
                lo = jnp.full_like(comp[0], t0)
                hi = jnp.full_like(comp[0], t0 + h)
                f_lo = g[e]
                for _ in range(refine_iters):
                    mid = 0.5 * (lo + hi)
                    g_mid = sol_events(mid)[e]
                    left = (jnp.signbit(f_lo) != jnp.signbit(g_mid)) | (g_mid == 0)
                    lo = jnp.where(left, lo, mid)
                    hi = jnp.where(left, mid, hi)
                    f_lo = jnp.where(left, f_lo, g_mid)
                roots.append(jnp.where(active[e], hi, jnp.asarray(jnp.inf, dt)))
            t_root = roots[0]
            for e in range(1, n_events):
                t_root = jnp.minimum(t_root, roots[e])
            y_root = sol(t_root)

            for c in range(6):
                y_final[c] = jnp.where(
                    fire, y_root[c], jnp.where(terminated, y_final[c], y_new[c])
                )
            terminated = terminated | fire
            comp = [jnp.where(terminated, y_final[c], y_new[c]) for c in range(6)]
            f = [jnp.where(terminated, zeros, f_new[c]) for c in range(6)]
            g = [jnp.where(terminated, g[e], g_new[e]) for e in range(n_events)]
            t = t + h

        # wrap_ship_angle (dynamic_model.py:179-180)
        y_final[2] = jnp.mod(y_final[2], 2 * jnp.pi)
        for c in range(6):
            yo_ref[c, :] = y_final[c]
        term_ref[0, :] = terminated.astype(jnp.int32)

    def step(y: jax.Array, action: jax.Array, planets: jax.Array):
        """y (B,6), action (B,2) translated, planets (B,P,2) -> (y', term)."""
        B = y.shape[0]
        if B % block:
            raise ValueError(f"batch {B} must be a multiple of block {block}")
        yt = y.T  # (6, B)
        at = action.T  # (2, B)
        pt = planets.reshape(B, 2 * n_planets).T  # (2P, B)

        grid = (B // block,)
        yo, term = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((6, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (2 * n_planets, block), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec((6, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((6, B), y.dtype),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ],
            interpret=interpret,
        )(yt, at, pt)
        return yo.T, term[0].astype(bool)

    return step


@functools.lru_cache(maxsize=None)
def fused_step_for_config(config, substeps=2, refine_iters=12, block=1024, interpret=False):
    """EnvConfig -> fused step (cached; EnvConfig is hashable)."""
    return make_fused_step(
        config.ship,
        config.planet_masses,
        config.planet_radii,
        config.world_size,
        config.max_abs_vel_angle,
        config.step_size,
        n_substeps=substeps,
        refine_iters=refine_iters,
        block=block,
        interpret=interpret,
    )
