"""Pallas TPU kernels: fused fixed-substep physics (and optionally the whole
observation + reward tail) for the vectorized engine.

Same semantics as ops.fixed_rk.fixed_solve_step (static Dormand-Prince 5(4)
substeps + dense-output Illinois event refinement, state returned at the
earliest event time), laid out TPU-first:

* **component-major layout** — state is (6, B), planets (2P, B), action
  (2, B): the lane axis rides the VPU's 128-wide lane dimension at full
  occupancy, instead of wasting 122/128 lanes on a (B, 6) row layout;
* **one kernel per control step** — every intermediate of the ~5k-op substep
  chain (RK stages, dense coefficients, refinement iterates) lives in
  VMEM/registers for a whole lane block; nothing round-trips to HBM between
  the unrolled operations;
* grid over lane blocks of `block` lanes (default 1024, the measured sweet
  spot: 74/97/86/60 M physics-steps/s at block 256/1024/2048/4096 on one
  chip).

Two kernels share one physics body:

* `make_fused_step`     — physics only: (y, action, planets) -> (y', term).
* `make_fused_env_step` — physics + observation (spaceship_env.py:113-140,
  built from the PRE-resample goal per the reference's obs-before-reward
  order) + per-task reward (goal.py:147-158 sans the RNG-consuming resample,
  kepler.py:111-150, DNC constant): -> (y', term, obs, reward).  The engine's
  XLA tail keeps only goal resampling, truncation and auto-reset.

Lidar note: the reference computes unit(atan2(v)) * scale; the kernel uses
v/|v| * scale — mathematically identical direction, ulp-level fp difference,
covered by the kernel-vs-XLA tolerance tests.

The engine uses these via `EnvEngine(..., physics="pallas")`;
`interpret=True` runs the same kernels (slowly) on CPU for tests.  Dynamics
reference: gym_space/dynamic_model.py:129-217 (see ops/field.py and
ops/events.py for the semantics contract; agreement with ops.fixed_rk is
enforced by tests/test_pallas.py).
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

from .rk45 import (BS3_A, BS3_B, BS3_N_STAGES, BS3_P, DP_A, DP_B,
                   DP_P, N_STAGES)

TWO_PI = 6.283185307179586


def _wsum(vecs, coeffs):
    acc = vecs[0] * coeffs[0]
    for v, c in zip(vecs[1:], coeffs[1:]):
        acc = acc + v * c
    return acc


def _make_physics_body(
    ship: ShipParams,
    planet_masses: Sequence[float],
    planet_radii: Sequence[float],
    world_size: float,
    max_abs_vel_angle: float,
    step_size: float,
    n_substeps: int,
    refine_iters: int,
    tableau: str = "dp5",
):
    """Component-major DP5 + event-bisection body shared by both kernels.

    Returns `body(comp, px, py, ae, at) -> (y_final comps, terminated)` where
    comp is a list of 6 (block,) arrays and px/py are per-planet coordinate
    vectors.  The velocity-steering omega override is applied inside.
    """
    if tableau == "dp5":
        T_A, T_B, T_P, n_stages = DP_A, DP_B, DP_P, N_STAGES
    elif tableau == "bs3":
        T_A, T_B, T_P, n_stages = BS3_A, BS3_B, BS3_P, BS3_N_STAGES
    else:
        raise ValueError(f"unknown tableau {tableau!r}")
    n_pw = len(T_P[0])
    n_planets = len(planet_masses)
    n_events = n_planets + 3
    half = world_size / 2
    radii = tuple(float(r) for r in planet_radii)
    masses = tuple(float(m) for m in planet_masses)
    h = step_size / n_substeps

    def rhs(comp, px, py, ae, at):
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
        return [_wsum([st[c] for st in stacks], coeffs) for c in range(6)]

    def body(comp, px, py, ae, at):
        if ship.steering == STEERING_VELOCITY:
            comp = list(comp)
            comp[5] = VELOCITY_STEERING_SCALE * at

        dt = comp[0].dtype
        f = rhs(comp, px, py, ae, at)
        g = events(comp, px, py)
        zeros = jnp.zeros_like(comp[0])
        terminated = zeros > 1.0  # all-False (block,) bool
        y_final = [c + 0.0 for c in comp]
        t = 0.0

        for _ in range(n_substeps):
            K = [f]
            for s in range(1, n_stages):
                dy = lcomb(K, T_A[s])
                ys = [comp[c] + dy[c] * h for c in range(6)]
                K.append(rhs(ys, px, py, ae, at))
            inc = lcomb(K, T_B)
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

            Q = [
                [_wsum([st[c] for st in K],
                       tuple(T_P[j][m] for j in range(n_stages + 1)))
                 for m in range(n_pw)]
                for c in range(6)
            ]
            t0 = t

            def sol(tq, Q=Q, comp=comp, t0=t0):
                xq = (tq - t0) / h
                pws, pw = [], xq
                for _m in range(n_pw):
                    pws.append(pw)
                    pw = pw * xq
                return [
                    h * sum(Q[c][m] * pws[m] for m in range(n_pw)) + comp[c]
                    for c in range(6)
                ]

            # JOINT event refinement (r5, VERDICT r4 item 5): one root-find on
            # the sign-normalized minimum over ACTIVE events instead of one
            # per event + min of roots.  Cuts the dominant serial chain from
            # n_events*refine_iters dense evals (60 for 2P) to refine_iters.
            # For a lane with exactly ONE active event — the overwhelmingly
            # common case — the iterates are identical to the per-event
            # refinement (the min is that event's normalized g), so the
            # refined time is bit-equal to ops.fixed_rk._refine_scalar's;
            # with several simultaneously active events it converges to the
            # earliest crossing of the combined front (events are
            # sign-normalized so every active g decreases through its root;
            # inactive events sit at +inf).
            one = jnp.asarray(1.0, dt)
            inf = jnp.asarray(jnp.inf, dt)
            sgn = [jnp.where(g[e] < 0, -one, one) for e in range(n_events)]

            def m_norm(ge):
                mm = None
                for e in range(n_events):
                    v = jnp.where(active[e], sgn[e] * ge[e], inf)
                    mm = v if mm is None else jnp.minimum(mm, v)
                return mm

            # Root refinement: safeguarded Illinois false position (r5b).
            # The normalized front f(t) decreases through its root (f_lo >= 0,
            # f_hi <= 0 on firing lanes), so the secant point brackets with
            # superlinear convergence; when the secant proposal leaves the
            # bracket or is non-finite (non-firing lanes carry inf/nan), the
            # iteration falls back to the bisection midpoint, preserving the
            # bisection worst case.  The Illinois halving of the retained
            # endpoint's value prevents the classic regula-falsi stall.  Net:
            # event-time accuracy at refine_iters=8 matches-or-beats the old
            # 12-iteration plain bisection (measured worst crash-lane state
            # error 5.4e-5; at 12 it is ~6e-8 — see RESULTS.md), shortening
            # the serial per-substep chain by a third at the bench config.
            lo = jnp.full_like(comp[0], t0)
            hi = jnp.full_like(comp[0], t0 + h)
            f_lo = m_norm(g)  # events at t0 already evaluated (>= 0)
            f_hi = None
            for e in range(n_events):
                v = jnp.where(active[e], sgn[e] * g_new[e], inf)
                f_hi = v if f_hi is None else jnp.minimum(f_hi, v)
            side = jnp.zeros_like(comp[0])  # +1: hi moved last, -1: lo moved
            for _ in range(refine_iters):
                mid_fp = hi - f_hi * (hi - lo) / (f_hi - f_lo)
                good = jnp.isfinite(mid_fp) & (mid_fp > lo) & (mid_fp < hi)
                mid = jnp.where(good, mid_fp, 0.5 * (lo + hi))
                g_mid = m_norm(events(sol(mid), px, py))
                left = g_mid <= 0  # root in [lo, mid]
                f_lo = jnp.where(left, jnp.where(side > 0, 0.5 * f_lo, f_lo),
                                 g_mid)
                f_hi = jnp.where(left, g_mid,
                                 jnp.where(side < 0, 0.5 * f_hi, f_hi))
                lo = jnp.where(left, lo, mid)
                hi = jnp.where(left, mid, hi)
                side = jnp.where(left, one, -one)
            t_root = hi
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
        y_final[2] = jnp.mod(y_final[2], TWO_PI)
        return y_final, terminated

    return body


def _grid_call(kernel, ins, in_rows, out_rows, out_dtypes, B, block, interpret):
    """pallas_call helper: everything is (rows, B) blocked along lanes."""
    grid = (B // block,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in in_rows
        ],
        out_specs=[
            pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in out_rows
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, B), d) for r, d in zip(out_rows, out_dtypes)
        ],
        interpret=interpret,
    )(*ins)


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
    tableau: str = "dp5",
):
    """Build `step(y (B,6), action (B,2), planets (B,P,2)) -> (y', terminated)`."""
    n_planets = len(planet_masses)
    body = _make_physics_body(
        ship, planet_masses, planet_radii, world_size, max_abs_vel_angle,
        step_size, n_substeps, refine_iters, tableau,
    )

    def kernel(y_ref, a_ref, p_ref, yo_ref, term_ref):
        comp = [y_ref[c, :] for c in range(6)]
        ae = a_ref[0, :]
        at = a_ref[1, :]
        px = [p_ref[2 * i, :] for i in range(n_planets)]
        py = [p_ref[2 * i + 1, :] for i in range(n_planets)]
        y_final, terminated = body(comp, px, py, ae, at)
        for c in range(6):
            yo_ref[c, :] = y_final[c]
        term_ref[0, :] = terminated.astype(jnp.int32)

    def step(y: jax.Array, action: jax.Array, planets: jax.Array):
        B = y.shape[0]
        if B % block:
            raise ValueError(f"batch {B} must be a multiple of block {block}")
        yo, term = _grid_call(
            kernel,
            (y.T, action.T, planets.reshape(B, 2 * n_planets).T),
            in_rows=(6, 2, 2 * n_planets),
            out_rows=(6, 1),
            out_dtypes=(y.dtype, jnp.int32),
            B=B, block=block, interpret=interpret,
        )
        return yo.T, term[0].astype(bool)

    return step


def make_fused_env_step(
    config,
    n_substeps: int = 2,
    refine_iters: int = 12,
    block: int = 1024,
    interpret: bool = False,
    tableau: str = "dp5",
):
    """Physics + observation + reward in one kernel.

    `step(y (B,6), action (B,2), planets (B,P,2), goal (B,2), ref_orbit (B,3))
    -> (y' (B,6), terminated (B,), obs (B,D), reward (B,))`.

    The observation uses the PRE-step goal (reference obs-before-reward order);
    the reward includes the goal sparse bonus but NOT the resample (RNG stays
    in the engine's XLA tail).
    """
    from ..envs.config import TASK_GOAL, TASK_KEPLER

    n_planets = config.n_planets
    body = _make_physics_body(
        config.ship, config.planet_masses, config.planet_radii,
        config.world_size, config.max_abs_vel_angle, config.step_size,
        n_substeps, refine_iters, tableau,
    )
    radii = tuple(float(r) for r in config.planet_radii)
    ws = config.world_size
    obs_dim = config.obs_dim
    task = config.task
    k = config.kepler
    gl = config.goal
    alpha_gm = G * k.planet_mass if k is not None else 0.0

    def lidar(pos_x, pos_y, ox, oy, radius):
        """unit(ship->obj) * (dist - radius) * 2 / ws (spaceship_env.py:133-140);
        direction via v/|v| instead of cos/sin(atan2) — identical value."""
        vx = ox - pos_x
        vy = oy - pos_y
        d = jnp.sqrt(vx * vx + vy * vy)
        scale = (d - radius) * (2.0 / ws) / d
        return vx * scale, vy * scale

    def kernel(y_ref, a_ref, p_ref, g_ref, r_ref, yo_ref, term_ref, obs_ref, rew_ref):
        comp0 = [y_ref[c, :] for c in range(6)]
        ae = a_ref[0, :]
        at = a_ref[1, :]
        px = [p_ref[2 * i, :] for i in range(n_planets)]
        py = [p_ref[2 * i + 1, :] for i in range(n_planets)]
        gx = g_ref[0, :]
        gy = g_ref[1, :]

        yf, terminated = body(comp0, px, py, ae, at)
        for c in range(6):
            yo_ref[c, :] = yf[c]
        term_ref[0, :] = terminated.astype(jnp.int32)

        x, yy, th, vx, vy, w = yf
        # --- observation (spaceship_env.py:113-131; raw, quirk Q1) ---
        row = 0
        obs_ref[0, :] = x
        obs_ref[1, :] = yy
        obs_ref[2, :] = jnp.cos(th)
        obs_ref[3, :] = jnp.sin(th)
        obs_ref[4, :] = vx
        obs_ref[5, :] = vy
        obs_ref[6, :] = w
        row = 7
        if config.with_lidar:
            for i in range(n_planets):
                lx, ly = lidar(x, yy, px[i], py[i], radii[i])
                obs_ref[row, :] = lx
                obs_ref[row + 1, :] = ly
                row += 2
            if config.with_goal:
                lx, ly = lidar(x, yy, gx, gy, 0.0)
                obs_ref[row, :] = lx
                obs_ref[row + 1, :] = ly
                row += 2
        if task == TASK_KEPLER:
            obs_ref[row, :] = r_ref[0, :]
            obs_ref[row + 1, :] = r_ref[1, :]
            obs_ref[row + 2, :] = r_ref[2, :]
            row += 3
        assert row == obs_dim, (row, obs_dim)

        # --- reward ---
        if task == TASK_GOAL:
            x0 = comp0[0]
            y0 = comp0[1]
            dxg = gx - x
            dyg = gy - yy
            cur = jnp.sqrt(dxg * dxg + dyg * dyg)
            dxl = gx - x0
            dyl = gy - y0
            last = jnp.sqrt(dxl * dxl + dyl * dyl)
            gvr = (last - cur) * gl.distance_fctr
            # closest planet: track min dist + its coordinates/radius.
            mind = None
            cx = cy = None
            cr = None
            for i in range(n_planets):
                dx = px[i] - x
                dy = py[i] - yy
                d = jnp.sqrt(dx * dx + dy * dy)
                if mind is None:
                    mind, cx, cy, cr = d, px[i], py[i], jnp.full_like(d, radii[i])
                else:
                    closer = d < mind
                    cx = jnp.where(closer, px[i], cx)
                    cy = jnp.where(closer, py[i], cy)
                    cr = jnp.where(closer, radii[i], cr)
                    mind = jnp.minimum(d, mind)
            pdx = cx - x0
            pdy = cy - y0
            prev = jnp.sqrt(pdx * pdx + pdy * pdy)
            danger = (mind - cr) < gl.danger_zone
            approach = prev > mind
            safety = jnp.where(danger & approach, -gl.distance_fctr * (prev - mind), 0.0)
            reward = (
                gl.survival_reward_scale
                + gl.goal_vel_reward_scale * gvr
                + gl.safety_reward_scale * safety
            )
            reward = reward + jnp.where(cur < config.goal_radius, gl.goal_sparse_reward, 0.0)
        elif task == TASK_KEPLER:
            # _dense_reward5 (kepler.py:111-150) in component form.
            ra = r_ref[0, :]   # ref orbit angle
            ecc = r_ref[1, :]
            a_ax = r_ref[2, :]
            b_ax = jnp.sqrt(a_ax * a_ax * (1 - ecc * ecc))
            c_f = jnp.sqrt(a_ax * a_ax - b_ax * b_ax)
            ca = jnp.cos(ra)
            sa = jnp.sin(ra)
            # rotate(pos, ra): [c*x + s*y, -s*x + c*y]
            wpos = ca * x + sa * yy - c_f
            zpos = -sa * x + ca * yy
            r2 = wpos * wpos + zpos * zpos
            cur_rad = jnp.sqrt(r2)
            # (ecc*cos(atan2(z,w)))^2 == ecc^2 * w^2 / (w^2+z^2) — avoids
            # atan2 (kepler.py:98-109 computes the same quantity via theta).
            target_rad = b_ax * jax.lax.rsqrt(1 - ecc * ecc * wpos * wpos / r2)
            sc = target_rad / cur_rad
            wq = wpos * sc
            zq = zpos * sc
            vtw = -(a_ax / b_ax) * zq
            vtz = (b_ax / a_ax) * wq
            rfoc = jnp.sqrt((wq + c_f) ** 2 + zq * zq)
            vmag = jnp.sqrt(alpha_gm * (2 / rfoc - 1 / a_ax))
            vnorm = jnp.sqrt(vtw * vtw + vtz * vtz)
            vtw = vtw * vmag / vnorm
            vtz = vtz * vmag / vnorm
            # rotate back by -ra
            tvx = ca * vtw - sa * vtz
            tvy = sa * vtw + ca * vtz
            act_pen = jnp.sqrt(ae * ae + at * at)
            C = k.numerator_C
            reward = C / (
                k.rad_penalty_C * jnp.abs(cur_rad - target_rad)
                + jnp.abs(tvx - vx)
                + jnp.abs(tvy - vy)
                + k.act_penalty_C * act_pen
                + C
            )
        else:
            reward = jnp.full_like(x, config.dnc.reward_per_step)
        rew_ref[0, :] = reward

    def step(y, action, planets, goal, ref_orbit):
        B = y.shape[0]
        if B % block:
            raise ValueError(f"batch {B} must be a multiple of block {block}")
        yo, term, obs, rew = _grid_call(
            kernel,
            (
                y.T,
                action.T,
                planets.reshape(B, 2 * n_planets).T,
                goal.T,
                ref_orbit.T,
            ),
            in_rows=(6, 2, 2 * n_planets, 2, 3),
            out_rows=(6, 1, obs_dim, 1),
            out_dtypes=(y.dtype, jnp.int32, y.dtype, y.dtype),
            B=B, block=block, interpret=interpret,
        )
        return yo.T, term[0].astype(bool), obs.T, rew[0]

    return step


@functools.lru_cache(maxsize=None)
def fused_step_for_config(config, substeps=2, refine_iters=12, block=1024, interpret=False,
                          tableau="dp5"):
    """EnvConfig -> physics-only fused step (cached; EnvConfig is hashable)."""
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
        tableau=tableau,
    )


@functools.lru_cache(maxsize=None)
def fused_env_step_for_config(config, substeps=2, refine_iters=12, block=1024, interpret=False,
                              tableau="dp5"):
    """EnvConfig -> physics+obs+reward fused step (cached)."""
    return make_fused_env_step(
        config,
        n_substeps=substeps,
        refine_iters=refine_iters,
        block=block,
        interpret=interpret,
        tableau=tableau,
    )
