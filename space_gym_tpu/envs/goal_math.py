"""Goal-task analytic observation features (opt-in, trainer-side).

The GoalEnv reward (gym_space/envs/goal.py:148-227) is driven by three
geometric quantities the raw observation (spaceship_env.py:113-140) only
encodes implicitly:

* the goal-approach rate  (last_dist - dist) * 100        (goal.py:160-164)
* the closest-planet danger margin inside danger_zone=0.25 (goal.py:204-227)
* terminal crash margins (planet surfaces and the world border)

A plain MLP on the raw 13/15/17-dim obs has to *discover* dot products,
norms and argmins before it can even see the reward gradient; this module
computes them analytically — functions of the raw observation and static
config constants ONLY, no extra environment state — exactly the rules that
made the Kepler featurization ([[kepler_math.error_features]]) legal and
decisive (2.2x the upstream asymptote, RESULTS.md).

Written once against a generic array namespace `xp` (numpy or jax.numpy)
like kepler_math; pure elementwise/reduce math (static unrolled loop over
the 2-4 planets, no gathers) so it fuses into the step program on TPU.

Raw Goal obs layout (spaceship_env.py:113-131):
  [0:2]  pos_xy          (raw, world in [-1.5, 1.5]^2, quirk Q1)
  [2:4]  cos/sin(angle)  (engine thrust acts along -(cos,sin), field.py)
  [4:6]  vel_xy
  [6]    vel_angle
  [7:7+2n] planet lidars: unit(ship->planet) * (center_dist - R) * 2/W
  [-2:]  goal lidar:      unit(ship->goal)   * center_dist * 2/W
"""
from __future__ import annotations

from ..ops.constants import G

# Multi-scale tanh gains.  Goal geometry lives at O(0.1-4): the sparse-reward
# trigger radius is 0.125-0.225, danger_zone is 0.25, and the dense reward is
# 100 * dt * closing_speed.  Gains are geometric so one feature stays in its
# linear range at every magnitude from O(1) down to ~1e-2.
DIST_GAINS = (1.0, 4.0, 16.0, 64.0)   # goal-distance margin
DANGER_GAINS = (1.0, 4.0, 16.0)       # closest-planet / border margins
VEL_GAINS = (1.0, 8.0)                # closing / crossing speeds
GRAV_GAINS = (2.0, 16.0)              # local gravity (|a| ~ 0.02-0.6)

N_GOAL_FEATURES = (
    len(DIST_GAINS)        # goal-distance margin
    + 2 * len(VEL_GAINS)   # goal closing + crossing speed
    + 2                    # thrust/goal alignment (cos, sin)
    + len(DANGER_GAINS)    # closest-planet margin
    + len(VEL_GAINS)       # closing speed toward closest planet
    + 1                    # thrust/closest-planet alignment
    + 2 * len(GRAV_GAINS)  # net gravity vector
    + 2                    # gravity projected on goal dir / thrust dir
    + 2 * len(DANGER_GAINS)  # border margins (x, y)
    + 2                    # border approach speeds
)

_EPS = 1e-8


def goal_features(
    xp,
    obs,
    *,
    n_planets: int,
    world_size: float,
    planet_radius: float,
    goal_radius: float,
    danger_zone: float,
    gm_per_planet: float,
):
    """(..., obs_dim) raw Goal observation -> (..., N_GOAL_FEATURES).

    Every feature is an analytic function of the raw obs + registration
    constants (goal.py:18-30): distances come from lidar norms (the lidar IS
    unit_vec * scaled_dist, spaceship_env.py:133-140), planet positions are
    recovered from lidars for the gravity term, and thrust direction is
    -(cos, sin) of the ship angle (dynamic_model.py:168-171 via ops/field.py).
    All outputs are tanh-bounded; static python loops over the 2-4 planets
    unroll at trace time (no gathers / dynamic indexing).
    """
    half_w = world_size / 2.0
    pos_x, pos_y = obs[..., 0], obs[..., 1]
    # thrust acts along -(cos(angle), sin(angle))  (ops/field.py:107)
    tx, ty = -obs[..., 2], -obs[..., 3]
    vx, vy = obs[..., 4], obs[..., 5]

    # --- goal block: lidar -> distance + unit direction -------------------
    gx_l, gy_l = obs[..., -2], obs[..., -1]
    g_norm = xp.sqrt(gx_l * gx_l + gy_l * gy_l)
    goal_dist = g_norm * half_w
    inv_g = 1.0 / xp.maximum(g_norm, _EPS)
    ghx, ghy = gx_l * inv_g, gy_l * inv_g            # unit(ship -> goal)
    v_close = vx * ghx + vy * ghy                    # d(-dist)/dt: reward rate
    v_cross = vx * ghy - vy * ghx
    align_c = tx * ghx + ty * ghy                    # thrust-goal alignment
    align_s = tx * ghy - ty * ghx
    goal_margin = goal_dist - goal_radius            # sparse-reward trigger

    # --- closest-planet block + net gravity (static unroll, no argmin) ----
    min_surf = None
    min_ux = min_uy = None
    grav_x = grav_y = 0.0
    for i in range(n_planets):
        lx, ly = obs[..., 7 + 2 * i], obs[..., 8 + 2 * i]
        nrm = xp.sqrt(lx * lx + ly * ly)
        surf = nrm * half_w                          # center_dist - R
        inv = 1.0 / xp.maximum(nrm, _EPS)
        ux, uy = lx * inv, ly * inv                  # unit(ship -> planet)
        center_dist = surf + planet_radius
        a = gm_per_planet / xp.maximum(center_dist * center_dist, _EPS)
        grav_x = grav_x + a * ux
        grav_y = grav_y + a * uy
        if min_surf is None:
            min_surf, min_ux, min_uy = surf, ux, uy
        else:
            closer = surf < min_surf
            min_ux = xp.where(closer, ux, min_ux)
            min_uy = xp.where(closer, uy, min_uy)
            min_surf = xp.minimum(surf, min_surf)

    danger_margin = min_surf - danger_zone           # <0 -> penalty accrues
    v_danger = vx * min_ux + vy * min_uy             # >0 -> approaching
    align_danger = tx * min_ux + ty * min_uy
    grav_close = grav_x * ghx + grav_y * ghy         # gravity along goal dir
    grav_thrust = grav_x * tx + grav_y * ty          # gravity along thrust

    # --- border block (border crash is terminal, events.py) ---------------
    border_x = half_w - xp.abs(pos_x)
    border_y = half_w - xp.abs(pos_y)
    v_border_x = xp.sign(pos_x) * vx                 # >0 -> approaching
    v_border_y = xp.sign(pos_y) * vy

    feats = []
    feats += [xp.tanh(g * goal_margin) for g in DIST_GAINS]
    feats += [xp.tanh(g * v_close) for g in VEL_GAINS]
    feats += [xp.tanh(g * v_cross) for g in VEL_GAINS]
    feats += [align_c, align_s]
    feats += [xp.tanh(g * danger_margin) for g in DANGER_GAINS]
    feats += [xp.tanh(g * v_danger) for g in VEL_GAINS]
    feats += [align_danger]
    feats += [xp.tanh(g * grav_x) for g in GRAV_GAINS]
    feats += [xp.tanh(g * grav_y) for g in GRAV_GAINS]
    feats += [xp.tanh(8.0 * grav_close), xp.tanh(8.0 * grav_thrust)]
    feats += [xp.tanh(g * (border_x - danger_zone)) for g in DANGER_GAINS]
    feats += [xp.tanh(g * (border_y - danger_zone)) for g in DANGER_GAINS]
    feats += [xp.tanh(4.0 * v_border_x), xp.tanh(4.0 * v_border_y)]
    return xp.stack(feats, axis=-1)


def features_for_config(xp, obs, config):
    """goal_features with constants pulled from an EnvConfig (envs/config.py)."""
    mass = config.planet_masses[0]
    return goal_features(
        xp,
        obs,
        n_planets=config.n_planets,
        world_size=config.world_size,
        planet_radius=config.planet_radii[0],
        goal_radius=config.goal_radius,
        danger_zone=config.goal.danger_zone,
        gm_per_planet=G * mass,
    )
