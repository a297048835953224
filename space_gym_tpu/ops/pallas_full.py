"""Pallas TPU kernel: the COMPLETE env step in one kernel.

Extends ops.pallas_step's physics+obs+reward kernel with the remaining env
machinery — Goal's mid-episode goal resample, TimeLimit truncation, and the
masked auto-reset including the hexagonal-tiling layout sampler — so one
kernel launch per control step touches HBM exactly once per state component.
The XLA side only generates the bulk uniforms and assembles the TimeStep.

Distribution contracts (same laws as tiling/device.py, which mirrors the
reference sampler gym_space/hexagonal_tiling.py:53-134):
* ordered k-of-n tile choice    -> k sequential masked argmin passes over iid
                                   uniforms (identical law to argsort[:k])
* goal candidate top-3          -> 3 sequential masked argmax passes over the
                                   free-entry scores (identical law to top_k)
* disk / polar / normal draws   -> same transforms; normals via the rational
                                   Acklam inverse-CDF approximation (~1e-9
                                   abs error — far below the physical scales
                                   the resets multiply by)

Engine wiring: EnvEngine(..., physics="pallas", pallas_fuse="full").  The
uniform-consumption layout is this kernel's own (row cursor over the (n_u, B)
uniforms block); the XLA path stays the reference implementation and the two
are cross-checked deterministically on non-reset lanes and distributionally
on reset lanes (tests/test_pallas_full.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_step import TWO_PI, _make_physics_body
from .constants import G


def _norminv(u):
    """Acklam's rational approximation of the standard normal inverse CDF
    (measured max abs error 3.9e-9 in f64 over (1e-9, 1-1e-9)) — branchless lower/central/upper evaluation."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow = 0.02425
    # dtype-aware clip: a fixed 1-1e-12 rounds to 1.0 in f32 and NaNs the
    # tail logarithm.
    eps = jnp.finfo(u.dtype).epsneg
    u = jnp.clip(u, eps, 1 - eps)

    # central region
    q = u - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r) + 1.0
    central = q * num / den

    # tails (evaluate on the mirrored lower-tail variable)
    ul = jnp.minimum(u, 1 - u)
    ql = jnp.sqrt(-2.0 * jnp.log(ul))
    numt = ((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]
    dent = ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql) + 1.0
    tail = numt / dent
    tail = jnp.where(u < 0.5, tail, -tail)

    in_tail = (u < plow) | (u > 1 - plow)
    return jnp.where(in_tail, tail, central)


def _threefry_uniform_matrix(k0, k1, base_index, n_rows, block):
    """(n_rows, block) f32 uniforms in [0,1), bit-identical to
    ``jax.random.uniform(key, (batch, n_rows)).T``'s block columns.

    Reproduces jax's default partitionable threefry
    (jax/_src/prng.py::_threefry_random_bits_partitionable: element i is the
    XOR of the two threefry2x32(key, (hi32(i)=0, lo32(i)=i)) output words) and
    the mantissa-fill uniform conversion (jax/_src/random.py::_uniform:
    ``bitcast(bits >> 9 | 0x3F800000) - 1``).  `base_index` is the flat index
    of this block's (lane 0, row 0) element, i.e. program_id * block * n_rows.

    Written in plain jnp uint32 ops so it lowers identically under Mosaic and
    interpret mode — the in-kernel RNG path is therefore CPU-testable and
    produces the exact stream of the XLA-side bulk draw it replaces.
    """
    row = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, block), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, block), 1)
    # element (global_lane, row) of the (batch, n_rows) draw, row-major
    c1 = base_index + lane * jnp.uint32(n_rows) + row
    ks0 = k0
    ks1 = k1
    ks2 = jnp.uint32(0x1BD11BDA) ^ k0 ^ k1
    ks = (ks0, ks1, ks2)
    x0 = jnp.zeros_like(c1) + ks0          # counter word 0 is 0: batch*n_rows < 2**32
    x1 = c1 + ks1
    rots = ((13, 15, 26, 6), (17, 29, 16, 24))
    for g in range(5):
        for r in rots[g % 2]:
            x0 = x0 + x1
            x1 = ((x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))) ^ x0
        x0 = x0 + ks[(g + 1) % 3]
        x1 = x1 + ks[(g + 2) % 3] + jnp.uint32(g + 1)
    bits = x0 ^ x1
    fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(fb, jnp.float32) - 1.0


def make_full_step(config, n_substeps=2, refine_iters=12, block=1024, interpret=False,
                   in_kernel_rng=False, tableau="dp5"):
    """Build the full env-step kernel for `config`.

    step(y, action, planets, goal, ref_orbit, tili, col_shift, steps_f? ...)
    — see `FullStep.apply` below for the exact packed signature.
    """
    from ..envs.config import TASK_GOAL, TASK_KEPLER
    from ..tiling.geometry import DIAGONAL_CASES, MAX_GOAL_CANDIDATES

    cfg = config
    task = cfg.task
    n_planets = cfg.n_planets
    radii = tuple(float(r) for r in cfg.planet_radii)
    ws = cfg.world_size
    obs_dim = cfg.obs_dim
    k = cfg.kepler
    gl = cfg.goal
    d = cfg.dnc
    geom = cfg.tiling
    alpha_gm = G * k.planet_mass if k is not None else 0.0
    max_w = 0.7 * cfg.max_abs_vel_angle
    DUP = MAX_GOAL_CANDIDATES  # free-entry duplicate cap (tiling/device.py)

    body = _make_physics_body(
        cfg.ship, cfg.planet_masses, cfg.planet_radii, ws,
        cfg.max_abs_vel_angle, cfg.step_size, n_substeps, refine_iters,
        tableau,
    )

    if geom is not None:
        n_tiles = geom.n_tiles
        cols = geom.cols
        rows_ = geom.rows
        tile_row = tuple(rc[0] for rc in geom.tiles_coord)
        tile_col = tuple(rc[1] for rc in geom.tiles_coord)
    else:
        n_tiles = cols = rows_ = 0
        tile_row = tile_col = ()

    # ---------------- uniform-row cursor helpers (trace-time static) --------
    class U:
        def __init__(self, ref):
            self.ref = ref
            self.i = 0

        def take(self):
            v = self.ref[self.i, :]
            self.i += 1
            return v

        def uniform(self, lo=0.0, hi=1.0):
            return lo + self.take() * (hi - lo)

        def normal(self):
            return _norminv(self.take())

    def disk_noise(u, radius):
        """uniform_disk (helpers.py:48-53): angle then radius."""
        ang = u.take() * TWO_PI
        r = jnp.sqrt(u.take()) * radius
        return r * jnp.cos(ang), r * jnp.sin(ang)

    def tile_center(tile, case_b, flip, col_shift_rows):
        """tile_center_pos (hexagonal_tiling.py:136-158) for a (B,) int tile."""
        # row/col lookups via select chains over static coords.
        row = jnp.zeros_like(tile, dtype=col_shift_rows[0].dtype)
        col = jnp.zeros_like(row)
        shift = jnp.zeros_like(row)
        colf_parity = jnp.zeros_like(row)
        for tnr in range(n_tiles):
            is_t = tile == tnr
            row = jnp.where(is_t, float(tile_row[tnr]), row)
            col = jnp.where(is_t, float(tile_col[tnr]), col)
            shift = jnp.where(is_t, col_shift_rows[tile_col[tnr]], shift)
            colf_parity = jnp.where(is_t, float(tile_col[tnr] % 2), colf_parity)
        zero_x = -ws / 2 + geom.hex_width / 2
        zero_y = jnp.where(case_b, ws / 2 - geom.hex_height, ws / 2 - geom.hex_height / 2)
        x = zero_x + col * (1.5 * geom.a) + shift
        y_cols = -colf_parity * (geom.hex_height / 2)
        y_cols = jnp.where(case_b, -y_cols, y_cols)
        y = zero_y - row * geom.hex_height + y_cols
        xf = jnp.where(flip, y, x)
        yf = jnp.where(flip, x, y)
        return xf, yf

    def pick_distinct(u, scores_rows, n_pick):
        """n_pick sequential masked argmin over (n_rows,B) iid scores: returns
        list of (B,) int32 row indices — same law as argsort[:n_pick]."""
        banned = None
        picks = []
        for _ in range(n_pick):
            best_v = None
            best_i = None
            for i, sc in enumerate(scores_rows):
                scm = sc if banned is None else jnp.where(banned[i], 2.0, sc)
                if best_v is None:
                    best_v, best_i = scm, jnp.full_like(scm, i, dtype=jnp.int32)
                else:
                    better = scm < best_v
                    best_v = jnp.where(better, scm, best_v)
                    best_i = jnp.where(better, i, best_i)
            picks.append(best_i)
            new_banned = [
                (banned[i] if banned is not None else best_v < -1.0) | (best_i == i)
                for i in range(len(scores_rows))
            ]
            banned = new_banned
        return picks

    def goal_place(u, free_rows, ship_tile, goal_tile, case_b, flip, col_shift_rows):
        """find_new_goal (hexagonal_tiling.py:95-128 / tiling/device.py):
        returns (free', ship', goal', gx, gy)."""
        subsequent = goal_tile >= 0
        free2 = [
            jnp.where(
                subsequent & (ship_tile == i), jnp.minimum(free_rows[i] + 1, DUP), free_rows[i]
            )
            for i in range(n_tiles)
        ]
        ship2 = jnp.where(subsequent, goal_tile, ship_tile)

        same = u.take() < 0.25
        # entry scores (n_tiles * DUP rows); invalid entries masked ABOVE any
        # valid score so argmax passes skip them.
        entry_scores = []
        for i in range(n_tiles):
            for j in range(DUP):
                sc = u.take()
                valid = free2[i] > j
                entry_scores.append(jnp.where(valid, sc, -1.0))
        # 3 sequential masked argmax passes -> candidate entries.
        banned = [s < -2.0 for s in entry_scores]  # all-False
        cand_tiles = []
        cand_valid = []
        for _ in range(min(MAX_GOAL_CANDIDATES, n_tiles * DUP)):
            best_v = None
            best_e = None
            for e, sc in enumerate(entry_scores):
                scm = jnp.where(banned[e], -2.0, sc)
                if best_v is None:
                    best_v, best_e = scm, jnp.full_like(scm, e, dtype=jnp.int32)
                else:
                    better = scm > best_v
                    best_v = jnp.where(better, scm, best_v)
                    best_e = jnp.where(better, e, best_e)
            banned = [banned[e] | (best_e == e) for e in range(len(entry_scores))]
            # entry -> tile: entries are built i-major (DUP per tile), so the
            # mapping is arithmetic — no n_tiles*DUP-deep select chain.
            t = best_e // DUP
            cand_tiles.append(t)
            cand_valid.append(best_v >= 0)

        # farthest taxi distance from ship2; random candidate order breaks ties.
        ship_r = jnp.zeros_like(ship2)
        ship_c = jnp.zeros_like(ship2)
        for tnr in range(n_tiles):
            is_t = ship2 == tnr
            ship_r = jnp.where(is_t, tile_row[tnr], ship_r)
            ship_c = jnp.where(is_t, tile_col[tnr], ship_c)
        best_taxi = None
        best_tile = None
        for t, v in zip(cand_tiles, cand_valid):
            tr = jnp.zeros_like(t)
            tc = jnp.zeros_like(t)
            for tnr in range(n_tiles):
                is_t = t == tnr
                tr = jnp.where(is_t, tile_row[tnr], tr)
                tc = jnp.where(is_t, tile_col[tnr], tc)
            taxi = jnp.abs(tr - ship_r) + jnp.abs(tc - ship_c)
            taxi = jnp.where(v, taxi, -1)
            if best_taxi is None:
                best_taxi, best_tile = taxi, t
            else:
                better = taxi > best_taxi
                best_taxi = jnp.where(better, taxi, best_taxi)
                best_tile = jnp.where(better, t, best_tile)

        goal2 = jnp.where(same, ship2, best_tile)
        # decrement only when NOT same and tile == best (goal2==best then)
        free3 = [
            jnp.where(~same & (best_tile == i), free2[i] - 1, free2[i])
            for i in range(n_tiles)
        ]
        cx, cy = tile_center(goal2, case_b, flip, col_shift_rows)
        nx, ny = disk_noise(u, geom.hex_height / 2 - geom.goal_radius)
        return free3, ship2, goal2, cx + nx, cy + ny

    def goal_reset(u):
        """tiling_reset + first goal + ship kinematics (goal.py:133-145)."""
        case_b = u.take() < 0.5
        flip = u.take() < 0.5
        raws = [u.take() for _ in range(cols)]
        cums = []
        acc = None
        for r in raws:
            acc = r if acc is None else acc + r
            cums.append(acc)
        free_x = ws - geom.tiling_width
        col_shift_rows = [c * (free_x / cums[-1]) for c in cums]

        n_obj = n_planets + 1
        scores = [u.take() for _ in range(n_tiles)]
        picks = pick_distinct(u, scores, n_obj)  # ship + planets
        if n_planets == 2:
            use_diag = u.take() < 0.25
            cu = u.take()
            case_i = jnp.minimum((cu * len(DIAGONAL_CASES)).astype(jnp.int32),
                                 len(DIAGONAL_CASES) - 1)
            for slot in range(3):
                dv = jnp.zeros_like(picks[slot])
                for ci, diag in enumerate(DIAGONAL_CASES):
                    dv = jnp.where(case_i == ci, diag[slot], dv)
                picks[slot] = jnp.where(use_diag, dv, picks[slot])

        free = [
            jnp.ones_like(picks[0])
            for _ in range(n_tiles)
        ]
        for i in range(n_tiles):
            occ = picks[0] == i
            for p in picks[1:]:
                occ = occ | (p == i)
            free[i] = jnp.where(occ, 0, free[i])

        # disc positions: ship then planets (hexagonal_tiling.py:130-134
        # draws per-object vectors; device.py draws angle-vector then
        # radius-vector — here per object, same joint law).
        obj_radii = [geom.ship_radius] + [geom.planets_radius] * n_planets
        pos = []
        for p, orad in zip(picks, obj_radii):
            cx, cy = tile_center(p, case_b, flip, col_shift_rows)
            nx, ny = disk_noise(u, geom.hex_height / 2 - orad)
            pos.append((cx + nx, cy + ny))
        ship_tile = picks[0]
        goal_tile0 = jnp.full_like(ship_tile, -1)
        free, ship_tile, goal_tile, gx, gy = goal_place(
            u, free, ship_tile, goal_tile0, case_b, flip, col_shift_rows
        )
        angle = u.take() * TWO_PI
        vx = u.normal() * 0.07
        vy = u.normal() * 0.07
        w0 = jnp.clip(u.normal() * (max_w / 3), -max_w, max_w)
        sx, sy = pos[0]
        y_new = [sx, sy, angle, vx, vy, w0]
        planets_new = [c for p in pos[1:] for c in p]  # px0,py0,px1,py1,...
        return (y_new, planets_new, (gx, gy), free, ship_tile, goal_tile,
                case_b, flip, col_shift_rows)

    def kepler_reset(u):
        pa = u.take() * TWO_PI
        dist = u.uniform(k.planet_radius + 0.5, k.border_radius - 0.5)
        px = jnp.cos(pa) * dist
        py = jnp.sin(pa) * dist
        sa = u.take() * TWO_PI
        if k.randomize:
            ecc = u.take() * 0.7
            oa = u.take() * TWO_PI
        else:
            ecc = None
            oa = None
        vx = u.normal() * 0.05
        vy = u.normal() * 0.05
        w0 = jnp.clip(u.normal() * (max_w / 5), -max_w, max_w)
        return [px, py, sa, vx, vy, w0], (oa, ecc)

    def dnc_reset(u):
        pa = u.take() * TWO_PI
        dist = u.uniform(d.planet_radius + 0.2, d.border_radius - 0.15)
        px = jnp.cos(pa) * dist
        py = jnp.sin(pa) * dist
        sa = u.take() * TWO_PI
        vx = u.normal() * 0.07
        vy = u.normal() * 0.07
        w0 = jnp.clip(u.normal() * (max_w / 3), -max_w, max_w)
        return [px, py, sa, vx, vy, w0]

    def lidar(pos_x, pos_y, ox, oy, radius):
        vx = ox - pos_x
        vy = oy - pos_y
        dd = jnp.sqrt(vx * vx + vy * vy)
        scale = (dd - radius) * (2.0 / ws) / dd
        return vx * scale, vy * scale

    def observe(comp, px, py, gx, gy, ref_rows):
        x, yy, th, vx, vy, w = comp
        out = [x, yy, jnp.cos(th), jnp.sin(th), vx, vy, w]
        if cfg.with_lidar:
            for i in range(n_planets):
                lx, ly = lidar(x, yy, px[i], py[i], radii[i])
                out += [lx, ly]
            if cfg.with_goal:
                lx, ly = lidar(x, yy, gx, gy, 0.0)
                out += [lx, ly]
        if task == TASK_KEPLER:
            out += list(ref_rows)
        assert len(out) == obs_dim
        return out

    def reward_fn(comp0, yf, px, py, gx, gy, ref_rows, ae, at):
        x, yy, _, vx, vy, _ = yf
        if task == TASK_GOAL:
            x0, y0 = comp0[0], comp0[1]
            cur = jnp.sqrt((gx - x) ** 2 + (gy - yy) ** 2)
            last = jnp.sqrt((gx - x0) ** 2 + (gy - y0) ** 2)
            gvr = (last - cur) * gl.distance_fctr
            mind = cx = cy = cr = None
            for i in range(n_planets):
                dx = px[i] - x
                dy = py[i] - yy
                dd = jnp.sqrt(dx * dx + dy * dy)
                if mind is None:
                    mind, cx, cy, cr = dd, px[i], py[i], jnp.full_like(dd, radii[i])
                else:
                    closer = dd < mind
                    cx = jnp.where(closer, px[i], cx)
                    cy = jnp.where(closer, py[i], cy)
                    cr = jnp.where(closer, radii[i], cr)
                    mind = jnp.minimum(dd, mind)
            prev = jnp.sqrt((cx - x0) ** 2 + (cy - y0) ** 2)
            safety = jnp.where(
                ((mind - cr) < gl.danger_zone) & (prev > mind),
                -gl.distance_fctr * (prev - mind), 0.0,
            )
            rew = (gl.survival_reward_scale + gl.goal_vel_reward_scale * gvr
                   + gl.safety_reward_scale * safety)
            reached = cur < cfg.goal_radius
            return rew + jnp.where(reached, gl.goal_sparse_reward, 0.0), reached
        if task == TASK_KEPLER:
            ra, ecc, a_ax = ref_rows
            b_ax = jnp.sqrt(a_ax * a_ax * (1 - ecc * ecc))
            c_f = jnp.sqrt(a_ax * a_ax - b_ax * b_ax)
            ca = jnp.cos(ra)
            sa = jnp.sin(ra)
            wp = ca * x + sa * yy - c_f
            zp = -sa * x + ca * yy
            r2 = wp * wp + zp * zp
            cur_rad = jnp.sqrt(r2)
            target_rad = b_ax * jax.lax.rsqrt(1 - ecc * ecc * wp * wp / r2)
            sc = target_rad / cur_rad
            wq, zq = wp * sc, zp * sc
            vtw = -(a_ax / b_ax) * zq
            vtz = (b_ax / a_ax) * wq
            rfoc = jnp.sqrt((wq + c_f) ** 2 + zq * zq)
            vmag = jnp.sqrt(alpha_gm * (2 / rfoc - 1 / a_ax))
            vn = jnp.sqrt(vtw * vtw + vtz * vtz)
            vtw, vtz = vtw * vmag / vn, vtz * vmag / vn
            tvx = ca * vtw - sa * vtz
            tvy = sa * vtw + ca * vtz
            act_pen = jnp.sqrt(ae * ae + at * at)
            C = k.numerator_C
            rew = C / (k.rad_penalty_C * jnp.abs(cur_rad - target_rad)
                       + jnp.abs(tvx - vx) + jnp.abs(tvy - vy)
                       + k.act_penalty_C * act_pen + C)
            return rew, rew < -1.0  # never "reached"
        rew = jnp.full_like(x, d.reward_per_step)
        return rew, rew < -1.0

    n_int_rows = n_tiles + 5  # free counts + ship + goal + steps + case + flip

    def _count_uniform_rows() -> int:
        """Rows of u the kernel consumes, by abstract tracing of the same
        consumer sequence (resample-then-reset, matching the kernel body)."""
        recorded = 0

        def probe(uarr):
            nonlocal recorded
            u = U(uarr)
            if task == TASK_GOAL:
                z = jnp.zeros((1,))
                zi = jnp.zeros((1,), jnp.int32)
                zb = z > 1.0
                freed = [zi + 1 for _ in range(n_tiles)]
                csd = [z for _ in range(cols)]
                goal_place(u, freed, zi, zi, zb, zb, csd)
                goal_reset(u)
            elif task == TASK_KEPLER:
                kepler_reset(u)
            else:
                dnc_reset(u)
            recorded = u.i
            return jnp.zeros(())

        jax.eval_shape(probe, jax.ShapeDtypeStruct((4096, 1), jnp.float32))
        return recorded

    n_uniform_rows = _count_uniform_rows()

    def kernel(y_ref, a_ref, p_ref, g_ref, r_ref, cs_ref, u_ref, ti_ref,
               yo_ref, po_ref, go_ref, ro_ref, cso_ref, obs_ref, fobs_ref,
               rew_ref, tio_ref, flag_ref):
        comp0 = [y_ref[c, :] for c in range(6)]
        ae = a_ref[0, :]
        at = a_ref[1, :]
        px = [p_ref[2 * i, :] for i in range(n_planets)]
        py = [p_ref[2 * i + 1, :] for i in range(n_planets)]
        gx = g_ref[0, :]
        gy = g_ref[1, :]
        ref_rows = [r_ref[i, :] for i in range(3)]
        col_shift_rows = [cs_ref[i, :] for i in range(max(cols, 1))]
        free = [ti_ref[i, :] for i in range(n_tiles)]
        ship_tile = ti_ref[n_tiles, :] if n_tiles else None
        goal_tile = ti_ref[n_tiles + 1, :] if n_tiles else None
        steps = ti_ref[n_int_rows - 3, :] if n_tiles else ti_ref[0, :]
        case_b = (ti_ref[n_int_rows - 2, :] if n_tiles else ti_ref[1, :]) > 0
        flip = (ti_ref[n_int_rows - 1, :] if n_tiles else ti_ref[2, :]) > 0
        if in_kernel_rng == "hw":
            # Hardware per-core PRNG: near-free bits, own stream (law-parity
            # only — not the jax threefry stream).  Seeded per (key, block).
            # Mosaic accepts at most 2 seed words: fold the block index into
            # word 0 (golden-ratio multiply keeps nearby blocks decorrelated).
            pid_mix = pl.program_id(0).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            pltpu.prng_seed(u_ref[0] ^ pid_mix, u_ref[1])
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((n_uniform_rows, block)), jnp.uint32)
            fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
            u = U(jax.lax.bitcast_convert_type(fb, jnp.float32) - 1.0)
        elif in_kernel_rng:
            # u_ref is the (2,) uint32 key words in SMEM; generate the whole
            # uniforms block in-register — zero HBM traffic for randomness,
            # bit-identical to the XLA-side bulk draw.
            base = pl.program_id(0).astype(jnp.uint32) * jnp.uint32(
                block * n_uniform_rows)
            u = U(_threefry_uniform_matrix(
                u_ref[0], u_ref[1], base, n_uniform_rows, block))
        else:
            u = U(u_ref)

        # ---- physics ----
        yf, terminated = body(comp0, px, py, ae, at)
        steps1 = steps + 1
        truncated = (steps1 >= cfg.max_episode_steps) & ~terminated
        done = terminated | truncated

        # ---- obs (pre-resample goal) + reward ----
        fobs = observe(yf, px, py, gx, gy, ref_rows)
        rew, reached = reward_fn(comp0, yf, px, py, gx, gy, ref_rows, ae, at)

        # ---- goal resample (Goal only; consumes u unconditionally) ----
        if task == TASK_GOAL:
            nfree, nship, ngoal, ngx, ngy = goal_place(
                u, free, ship_tile, goal_tile, case_b, flip, col_shift_rows
            )
            free = [jnp.where(reached, nf, f) for nf, f in zip(nfree, free)]
            ship_tile = jnp.where(reached, nship, ship_tile)
            goal_tile = jnp.where(reached, ngoal, goal_tile)
            gx1 = jnp.where(reached, ngx, gx)
            gy1 = jnp.where(reached, ngy, gy)
        else:
            gx1, gy1 = gx, gy

        # ---- fresh reset (consumed unconditionally, applied where done) ----
        if task == TASK_GOAL:
            (ry, rplan, (rgx, rgy), rfree, rship, rgoal,
             rcase, rflip, rcs) = goal_reset(u)
            sel = lambda n, o: jnp.where(done, n, o)
            y_out = [sel(ry[c], yf[c]) for c in range(6)]
            p_out = [sel(rp, pc) for rp, pc in zip(rplan, [v for i in range(n_planets) for v in (px[i], py[i])])]
            gx_out = sel(rgx, gx1)
            gy_out = sel(rgy, gy1)
            free = [sel(rf, f) for rf, f in zip(rfree, free)]
            ship_tile = sel(rship, ship_tile)
            goal_tile = sel(rgoal, goal_tile)
            # Mosaic lowers where-on-bool via i8 and trips on the i8->i1
            # truncation; select in i32 and compare back.
            case_b = sel(rcase.astype(jnp.int32), case_b.astype(jnp.int32)) > 0
            flip = sel(rflip.astype(jnp.int32), flip.astype(jnp.int32)) > 0
            col_shift_out = [sel(rc, c0) for rc, c0 in zip(rcs, col_shift_rows)]
            ref_out = ref_rows
        elif task == TASK_KEPLER:
            ry, (roa, recc) = kepler_reset(u)
            sel = lambda n, o: jnp.where(done, n, o)
            y_out = [sel(ry[c], yf[c]) for c in range(6)]
            p_out = [v for i in range(n_planets) for v in (px[i], py[i])]
            gx_out, gy_out = gx1, gy1
            if k.randomize:
                ref_out = [sel(roa, ref_rows[0]), sel(recc, ref_rows[1]), ref_rows[2]]
            else:
                ref_out = ref_rows
            col_shift_out = col_shift_rows
        else:
            ry = dnc_reset(u)
            sel = lambda n, o: jnp.where(done, n, o)
            y_out = [sel(ry[c], yf[c]) for c in range(6)]
            p_out = [v for i in range(n_planets) for v in (px[i], py[i])]
            gx_out, gy_out = gx1, gy1
            ref_out = ref_rows
            col_shift_out = col_shift_rows

        steps_out = jnp.where(done, 0, steps1)
        px_out = [p_out[2 * i] for i in range(n_planets)]
        py_out = [p_out[2 * i + 1] for i in range(n_planets)]
        obs = observe(y_out, px_out, py_out, gx_out, gy_out, ref_out)
        obs = [jnp.where(done, o_new, o_f) for o_new, o_f in zip(obs, fobs)]
        # (where done, obs of fresh state; else final obs — same semantics as
        # the engine's XLA tail)

        # ---- write outputs ----
        for c in range(6):
            yo_ref[c, :] = y_out[c]
        for i in range(2 * n_planets):
            po_ref[i, :] = p_out[i]
        go_ref[0, :] = gx_out
        go_ref[1, :] = gy_out
        for i in range(3):
            ro_ref[i, :] = ref_out[i]
        for i in range(max(cols, 1)):
            cso_ref[i, :] = col_shift_out[i] if i < len(col_shift_out) else cs_ref[i, :]
        for i in range(obs_dim):
            obs_ref[i, :] = obs[i]
            fobs_ref[i, :] = fobs[i]
        rew_ref[0, :] = rew
        if n_tiles:
            for i in range(n_tiles):
                tio_ref[i, :] = free[i].astype(jnp.int32)
            tio_ref[n_tiles, :] = ship_tile
            tio_ref[n_tiles + 1, :] = goal_tile
            tio_ref[n_int_rows - 3, :] = steps_out
            tio_ref[n_int_rows - 2, :] = case_b.astype(jnp.int32)
            tio_ref[n_int_rows - 1, :] = flip.astype(jnp.int32)
        else:
            tio_ref[0, :] = steps_out
            tio_ref[1, :] = jnp.zeros_like(steps_out)
            tio_ref[2, :] = jnp.zeros_like(steps_out)
        flag_ref[0, :] = terminated.astype(jnp.int32)
        flag_ref[1, :] = truncated.astype(jnp.int32)
        flag_ref[2, :] = done.astype(jnp.int32)

    int_rows = n_int_rows if n_tiles else 3
    cs_rows = max(cols, 1)

    def apply(y, action, planets, goal, ref_orbit, col_shift, tili, u):
        """All f32 inputs (B, rows) EXCEPT tili (B, int_rows) int32 and
        u — (B, n_u) f32 bulk uniforms, or, with in_kernel_rng, the (2,)
        uint32 key words (the kernel then draws the identical threefry
        stream itself).  Returns the packed outputs, all transposed back."""
        B = y.shape[0]
        if B % block:
            raise ValueError(f"batch {B} must be a multiple of block {block}")
        grid = (B // block,)

        def spec(r):
            return pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM)

        if in_kernel_rng:
            u_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
            u_in = u.astype(jnp.uint32)
        else:
            u_spec = spec(u.shape[1])
            u_in = u.T

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(6), spec(2), spec(2 * n_planets), spec(2), spec(3),
                      spec(cs_rows), u_spec, spec(int_rows)],
            out_specs=[spec(6), spec(2 * n_planets), spec(2), spec(3),
                       spec(cs_rows), spec(obs_dim), spec(obs_dim), spec(1),
                       spec(int_rows), spec(3)],
            out_shape=[
                jax.ShapeDtypeStruct((6, B), y.dtype),
                jax.ShapeDtypeStruct((2 * n_planets, B), y.dtype),
                jax.ShapeDtypeStruct((2, B), y.dtype),
                jax.ShapeDtypeStruct((3, B), y.dtype),
                jax.ShapeDtypeStruct((cs_rows, B), y.dtype),
                jax.ShapeDtypeStruct((obs_dim, B), y.dtype),
                jax.ShapeDtypeStruct((obs_dim, B), y.dtype),
                jax.ShapeDtypeStruct((1, B), y.dtype),
                jax.ShapeDtypeStruct((int_rows, B), jnp.int32),
                jax.ShapeDtypeStruct((3, B), jnp.int32),
            ],
            interpret=interpret,
        )(
            y.T, action.T, planets.reshape(B, 2 * n_planets).T, goal.T,
            ref_orbit.T, col_shift.T, u_in, tili.T,
        )
        return outs

    apply.n_int_rows = int_rows
    apply.cs_rows = cs_rows
    apply.n_uniform_rows = n_uniform_rows
    apply.in_kernel_rng = in_kernel_rng
    return apply


@functools.lru_cache(maxsize=None)
def full_step_for_config(config, substeps=2, refine_iters=12, block=1024, interpret=False,
                         in_kernel_rng=False, tableau="dp5"):
    return make_full_step(config, substeps, refine_iters, block, interpret,
                          in_kernel_rng, tableau)
