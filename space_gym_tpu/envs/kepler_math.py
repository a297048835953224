"""Kepler reference-orbit math (gym_space/envs/kepler.py:43-150).

Written once against a generic array namespace `xp` (numpy for the host
parity adapter, jax.numpy for the device engine) with the reference's exact
operation order, so both paths produce identical f64 values.
"""
from __future__ import annotations

from ..ops.constants import G  # noqa: F401  (re-exported for callers)


def _sq(xp, v):
    """v ** 2 as the reference computes it: on the host path v is a numpy
    SCALAR, whose ** 2 goes through libm pow (1 ulp from v*v on some inputs);
    the parity namespace (ops.exact.ExactNamespace) exposes pow2 to match."""
    pow2 = getattr(xp, "pow2", None)
    return pow2(v) if pow2 is not None else v**2


def semi_minor(xp, a, ecc):
    """Semi-minor axis (kepler.py:43-45)."""
    return xp.sqrt(a * a * (1 - ecc * ecc))


def focal_dist(xp, a, b):
    """Focal-point distance from the ellipse centre (kepler.py:47-49)."""
    return xp.sqrt(a * a - b * b)


def rotate(xp, pos_xy, alpha):
    """Rotation by alpha via the reference's 2x2 matrix dot (kepler.py:51-58)."""
    row0 = xp.stack([xp.cos(alpha), xp.sin(alpha)], axis=-1)
    row1 = xp.stack([-xp.sin(alpha), xp.cos(alpha)], axis=-1)
    R = xp.stack([row0, row1], axis=-2)
    return xp.dot(R, pos_xy)


def orbit_vel(xp, alpha_gm, r, ref_a):
    """Vis-viva speed on the reference orbit (kepler.py:60-62);
    alpha_gm = G * planet_mass precomputed in python floats like upstream."""
    return xp.sqrt(alpha_gm * (2 / r - 1 / ref_a))


def _shifted_wz(xp, pos_xy, ref_angle, a, ecc):
    b = semi_minor(xp, a, ecc)
    pos_wz = rotate(xp, pos_xy, ref_angle)
    c = focal_dist(xp, a, b)
    w = pos_wz[..., 0] - c
    return xp.stack([w, pos_wz[..., 1]], axis=-1), b, c


def orbit_target_vel(xp, alpha_gm, pos_xy, ref_angle, ref_a, ecc, curl=1.0):
    """Tangential target velocity on the reference ellipse (kepler.py:64-88)."""
    a = ref_a
    pos_wz, b, c = _shifted_wz(xp, pos_xy, ref_angle, a, ecc)
    theta = xp.arctan2(pos_wz[..., 1], pos_wz[..., 0])
    target_rad = b / xp.sqrt(1 - _sq(xp, ecc * xp.cos(theta)))
    pos_wz = pos_wz * target_rad / xp.linalg.norm(pos_wz)
    vt = xp.stack(
        [-curl * a / b * pos_wz[..., 1], curl * b / a * pos_wz[..., 0]], axis=-1
    )
    r = xp.linalg.norm(pos_wz + xp.stack([c, xp.zeros_like(c)], axis=-1))
    vt = vt * orbit_vel(xp, alpha_gm, r, a) / xp.linalg.norm(vt)
    return rotate(xp, vt, -ref_angle)


def orbit_cur_rad(xp, pos_xy, ref_angle, ref_a, ecc):
    """Current radius w.r.t. the occupied focal point (kepler.py:90-96)."""
    pos_wz, _, _ = _shifted_wz(xp, pos_xy, ref_angle, ref_a, ecc)
    return xp.linalg.norm(pos_wz)


def orbit_target_rad(xp, pos_xy, ref_angle, ref_a, ecc):
    """Reference-orbit radius at the current angle (kepler.py:98-109)."""
    pos_wz, b, _ = _shifted_wz(xp, pos_xy, ref_angle, ref_a, ecc)
    theta = xp.arctan2(pos_wz[..., 1], pos_wz[..., 0])
    return b / xp.sqrt(1 - _sq(xp, ecc * xp.cos(theta)))


def dense_reward(
    xp,
    alpha_gm,
    pos_xy,
    vel_xy,
    act_penalty,
    ref_angle,
    ref_a,
    ecc,
    numerator_C,
    rad_penalty_C,
    act_penalty_C,
):
    """_dense_reward5 (kepler.py:111-150): C shrinks toward 1 as radius,
    velocity and action-energy deviations from the reference orbit vanish."""
    cur_rad = orbit_cur_rad(xp, pos_xy, ref_angle, ref_a, ecc)
    target_vel = orbit_target_vel(xp, alpha_gm, pos_xy, ref_angle, ref_a, ecc)
    target_rad = orbit_target_rad(xp, pos_xy, ref_angle, ref_a, ecc)
    rad_penalty = xp.abs(cur_rad - target_rad)
    vel_x_penalty = xp.abs(target_vel[..., 0] - vel_xy[..., 0])
    vel_y_penalty = xp.abs(target_vel[..., 1] - vel_xy[..., 1])
    C = numerator_C
    return C / (
        rad_penalty_C * rad_penalty
        + vel_x_penalty
        + vel_y_penalty
        + act_penalty_C * act_penalty
        + C
    )


# Multi-scale tanh gains for `error_features`.  The reward C/(penalty+C)
# with C=0.01 (gym_space/__init__.py:87) only approaches 1 once the summed
# orbit deviation is ~1e-2, i.e. per-channel errors of a few 1e-3 on obs
# whose raw components are O(1) — a plain MLP has almost no input gradient
# at that resolution.  tanh(g*e) at geometric gains keeps one feature in its
# linear range at every error magnitude from O(1) down to ~1e-5.
FEATURE_GAINS = (1.0, 8.0, 64.0, 512.0)
N_ERROR_FEATURES = 3 * len(FEATURE_GAINS)  # (rad_err, vel_err_x, vel_err_y)


def error_features(xp, alpha_gm, pos_xy, vel_xy, ref_angle, ecc, a):
    """Batched orbit-deviation features, analytic functions of the raw
    observation (no extra environment information): the radial error
    cur_rad - target_rad and both components of target_vel - vel — exactly
    the penalty terms of _dense_reward5 (kepler.py:111-150) — each expanded
    through tanh at FEATURE_GAINS.  Returns (..., N_ERROR_FEATURES).

    Written with explicit scalar math (no (..,2,2) matmuls) so it stays a
    fused elementwise epilogue on TPU; all leading batch shapes broadcast.
    """
    ca, sa = xp.cos(ref_angle), xp.sin(ref_angle)
    x, y = pos_xy[..., 0], pos_xy[..., 1]
    # rotate(pos, ref_angle) then shift by the focal distance (kepler.py:51-58)
    b = xp.sqrt(a * a * (1.0 - ecc * ecc))
    c = xp.sqrt(xp.maximum(a * a - b * b, 0.0))
    w = ca * x + sa * y - c
    z = -sa * x + ca * y
    cur_rad = xp.sqrt(w * w + z * z)
    theta = xp.arctan2(z, w)
    ecos = ecc * xp.cos(theta)
    target_rad = b / xp.sqrt(1.0 - ecos * ecos)
    rad_err = cur_rad - target_rad

    # target velocity (kepler.py:64-88): tangent of the ellipse at the ray
    # through (w, z), rescaled to the vis-viva speed, rotated back
    scale = target_rad / xp.maximum(cur_rad, 1e-8)
    pw, pz = w * scale, z * scale
    vtw = -(a / b) * pz
    vtz = (b / a) * pw
    r = xp.sqrt((pw + c) ** 2 + pz * pz)
    speed = xp.sqrt(xp.maximum(alpha_gm * (2.0 / r - 1.0 / a), 0.0))
    vn = xp.sqrt(vtw * vtw + vtz * vtz)
    vtw, vtz = vtw * speed / xp.maximum(vn, 1e-8), vtz * speed / xp.maximum(vn, 1e-8)
    tvx = ca * vtw - sa * vtz
    tvy = sa * vtw + ca * vtz
    ev_x = tvx - vel_xy[..., 0]
    ev_y = tvy - vel_xy[..., 1]

    errs = xp.stack([rad_err, ev_x, ev_y], axis=-1)
    feats = [xp.tanh(g * errs) for g in FEATURE_GAINS]
    return xp.concatenate(feats, axis=-1)


def specific_energy(xp, alpha_gm, pos_xy, vel_xy):
    """Specific orbital energy v^2/2 - GM/r — the reference's unused _H helper
    (kepler.py:20-29) promoted to a real analysis/testing utility: conserved
    along thrust-free trajectories, so it doubles as an integrator invariant."""
    r = xp.linalg.norm(pos_xy, axis=-1)
    v2 = xp.sum(vel_xy * vel_xy, axis=-1)
    return v2 / 2 - alpha_gm / r


def angular_momentum(xp, pos_xy, vel_xy):
    """Specific angular momentum x*vy - y*vx (z component); conserved in any
    central-force field."""
    return pos_xy[..., 0] * vel_xy[..., 1] - pos_xy[..., 1] * vel_xy[..., 0]


def lrl_vector(xp, alpha_gm, pos_xy, vel_xy):
    """Laplace-Runge-Lenz vector A = v x L - GM * r_hat — the reference's
    unused _A helper (kepler.py:31-41); conserved on Kepler orbits and points
    along the major axis."""
    L = angular_momentum(xp, pos_xy, vel_xy)
    r = xp.linalg.norm(pos_xy, axis=-1, keepdims=True)
    vxL = xp.stack([vel_xy[..., 1] * L, -vel_xy[..., 0] * L], axis=-1)
    return vxL - alpha_gm * pos_xy / r
