"""DoNotCrash analytic observation features (opt-in, trainer-side).

The DNC task (gym_space/envs/do_not_crash.py:10-48) pays a constant
100/300 per surviving step; the ONLY learning signal is avoiding the three
terminal events (dynamic_model.py:183-217): the central planet (r = 0.25),
the border pseudo-planet flown from inside (r = 1.0), and the angular-
velocity cap (|omega| >= 5).  With `with_lidar=False` the raw observation
is just 7 dims — [pos(2), cos/sin(angle), vel(2), vel_angle]
(spaceship_env.py:113-131) — and both obstacles are centered at the
origin, so every survival-relevant quantity is an analytic function of the
raw obs + registration constants:

* the annulus margins (radius - planet_r, border_r - radius) — the two
  crash events' distances-to-fire;
* radial / tangential velocity — which margin is shrinking and how fast;
* the circular-orbit speed error |v_t| - sqrt(GM/r) and the specific
  orbital energy v^2/2 - GM/r — the physics of *staying* in the annulus
  (gravity GM = G * 6e8 ~ 0.04 rivals max_engine_force = 0.3 here);
* the omega-cap margin (the third terminal event);
* thrust projections on the radial/tangential frame (thrust acts along
  -(cos, sin), ops/field.py).

Same legality rules as [[goal_math.goal_features]] /
[[kepler_math.error_features]]: functions of the raw observation and
static config constants ONLY, written against a generic array namespace
`xp` (numpy or jax.numpy), pure elementwise math that fuses into the step
program on TPU.
"""
from __future__ import annotations

from ..ops.constants import G

# Multi-scale tanh gains.  DNC geometry lives at O(0.1-1): the annulus is
# [0.25, 1.0], spawn radii are [0.45, 0.85], orbit speeds ~0.2-0.3.
MARGIN_GAINS = (1.0, 4.0, 16.0)   # annulus margins
VEL_GAINS = (1.0, 8.0)            # radial / tangential speeds
ORBIT_GAINS = (2.0, 8.0)          # orbit-speed error, specific energy
OMEGA_GAINS = (0.5, 2.0)          # omega-cap margin

N_DNC_FEATURES = (
    2 * len(MARGIN_GAINS)   # inner + outer annulus margins
    + 2 * len(VEL_GAINS)    # radial + tangential velocity
    + len(ORBIT_GAINS)      # circular-orbit speed error
    + len(ORBIT_GAINS)      # specific orbital energy
    + len(OMEGA_GAINS)      # omega-cap margin
    + 2                     # thrust radial/tangential alignment
    + 1                     # gravity magnitude
)

_EPS = 1e-8


def dnc_features(
    xp,
    obs,
    *,
    planet_radius: float,
    border_radius: float,
    gm: float,
    max_abs_vel_angle: float,
):
    """(..., 7) raw DNC observation -> (..., N_DNC_FEATURES).

    Raw layout (spaceship_env.py:113-131, no lidar for DNC):
      [0:2] pos_xy   [2:4] cos/sin(angle)   [4:6] vel_xy   [6] vel_angle
    Both the planet and the border pseudo-planet sit at the origin
    (envs/config.py dnc_config), so the radial frame is exact.
    """
    pos_x, pos_y = obs[..., 0], obs[..., 1]
    tx, ty = -obs[..., 2], -obs[..., 3]      # thrust direction (field.py)
    vx, vy = obs[..., 4], obs[..., 5]
    w = obs[..., 6]

    r = xp.sqrt(pos_x * pos_x + pos_y * pos_y)
    inv_r = 1.0 / xp.maximum(r, _EPS)
    rx, ry = pos_x * inv_r, pos_y * inv_r    # outward radial unit vector

    inner = r - planet_radius                # crash-event margin (planet)
    outer = border_radius - r                # crash-event margin (border)
    v_rad = vx * rx + vy * ry                # >0 -> moving outward
    v_tan = vx * ry - vy * rx                # signed tangential speed

    v_circ = xp.sqrt(gm * inv_r)             # vis-viva circular speed
    orbit_err = xp.abs(v_tan) - v_circ       # 0 at a sustainable orbit
    energy = 0.5 * (vx * vx + vy * vy) - gm * inv_r
    # Reference circular-orbit energy at the annulus midpoint, so the
    # feature is centered where the good policies live.
    e_mid = -gm / (planet_radius + border_radius)
    w_margin = max_abs_vel_angle - xp.abs(w)  # omega-cap event margin

    align_rad = tx * rx + ty * ry            # thrust outward component
    align_tan = tx * ry - ty * rx            # thrust prograde component

    feats = []
    feats += [xp.tanh(g * inner) for g in MARGIN_GAINS]
    feats += [xp.tanh(g * outer) for g in MARGIN_GAINS]
    feats += [xp.tanh(g * v_rad) for g in VEL_GAINS]
    feats += [xp.tanh(g * v_tan) for g in VEL_GAINS]
    feats += [xp.tanh(g * orbit_err) for g in ORBIT_GAINS]
    feats += [xp.tanh(g * (energy - e_mid)) for g in ORBIT_GAINS]
    feats += [xp.tanh(g * w_margin) for g in OMEGA_GAINS]
    feats += [align_rad, align_tan]
    feats += [xp.tanh(8.0 * gm * inv_r * inv_r)]
    return xp.stack(feats, axis=-1)


def features_for_config(xp, obs, config):
    """dnc_features with constants pulled from an EnvConfig (envs/config.py)."""
    p = config.dnc
    return dnc_features(
        xp,
        obs,
        planet_radius=p.planet_radius,
        border_radius=p.border_radius,
        gm=G * p.planet_mass,
        max_abs_vel_angle=config.max_abs_vel_angle,
    )
