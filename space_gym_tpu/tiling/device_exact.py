"""Sequential-EXACT device twin of the hexagonal-tiling sampler (parity tier).

The production sampler (tiling/device.py) is a branchless distribution-
equivalent rewrite — right for throughput, useless as a bitwise oracle.  This
module is the other end of the spectrum: the reference sampler's arithmetic
(gym_space/hexagonal_tiling.py:53-158) restructured into fixed-shape JAX ops
whose float operations happen in the reference's exact order, so that feeding
the recorded MT19937 DRAWS reproduces the reference's ship/planet/goal
positions bit-for-bit on the device engine (VERDICT r2 item 4: the Goal parity
feed carries draws, not positions).

What counts as a "draw" in the feed (same standard as the Kepler tier in
parity/device_replay.py): the direct output of one reference RNG call —
  * float uniforms verbatim (case/flip, column shifts, the p=0.25 gates,
    disk radius fractions), range-scaled uniforms as returned by
    RandomState.uniform(0, 2pi, ...) (disk angles),
  * integer outputs of the MT19937 integer path (randint / choice without
    replacement), which — like the polar-method normals — cannot be
    reproduced from float uniforms and are therefore fed as values.
Everything downstream of the draws (column-shift normalization, tile-center
geometry, uniform-disk assembly, the ordered free-list evolution, the
taxi-distance argmax) runs HERE, on device.

Run under the parity environment only (f64, XLA fusion/algsimp disabled,
SGT_EXACT_MATH): float adds/muls then match numpy op-for-op; cos/sin/sqrt are
bitwise-safe XLA ops (same precedent as the Kepler reset assembly).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .device import TilingState
from .geometry import DIAGONAL_CASES, MAX_GOAL_CANDIDATES, TilingGeometry

# Free-list capacity headroom above n_tiles: the reference's free list grows
# by one entry per goal-reuse draw (find_new_goal appends the old ship tile
# unconditionally and pops only on the non-reuse branch,
# hexagonal_tiling.py:104,128).  Golden episodes reach the goal a handful of
# times; the feed builder asserts the true episode never exceeds this.
FREE_CAP_EXTRA = 48


class ExactTilingConsts(NamedTuple):
    """Static per-config constants, precomputed on the HOST with the exact
    numpy/python expressions of tiling/host.py (itself the bitwise oracle of
    hexagonal_tiling.py:136-158), so every static subexpression is bit-equal
    by construction."""

    static_x: tuple          # per tile: col * 1.5 * a  (host: f64 numpy)
    cy_case_a: tuple         # per tile: full y centre, case A
    cy_case_b: tuple         # per tile: full y centre, case B
    tzx: float               # tile-zero x
    free_x_space: float      # world_size - tiling_width
    nr2_reset: tuple         # (hex_height/2 - radius)**2 per reset object
    nr2_goal: float          # scalar python-pow variant (host.py goal call)
    col_of: tuple            # per tile: column index
    coords: tuple            # (row, col) per tile
    cap: int                 # free-list buffer size


def make_exact_consts(geom: TilingGeometry) -> ExactTilingConsts:
    coords = np.asarray(geom.tiles_coord)
    row_nrs = coords[:, 0]
    col_nrs = coords[:, 1]
    # hexagonal_tiling.py:136-158 expression order, numpy f64:
    static_x = col_nrs * 1.5 * geom.a
    tile_zero_pos_x = -geom.world_size / 2 + geom.hex_width / 2
    tile_zero_pos_y = geom.world_size / 2 - geom.hex_height / 2
    y_shifts_due_rows = -row_nrs * geom.hex_height
    y_shifts_due_cols = -(col_nrs % 2) * geom.hex_height / 2
    cy_case_a = tile_zero_pos_y + (y_shifts_due_rows + y_shifts_due_cols)
    cy_case_b = (tile_zero_pos_y - geom.hex_height / 2) + (
        y_shifts_due_rows + y_shifts_due_cols * -1
    )
    # reset path: noise_radius is a numpy ARRAY -> arr**2 is numpy square;
    # goal path: python floats -> ** is libm pow (the documented numpy-scalar
    # pow quirk).  Both computed here exactly as host.py computes them.
    radii = np.array([geom.ship_radius] + geom.n_planets * [geom.planets_radius])
    nr2_reset = (geom.hex_height / 2 - radii) ** 2
    nr2_goal = (geom.hex_height / 2 - geom.goal_radius) ** 2
    return ExactTilingConsts(
        static_x=tuple(static_x.tolist()),
        cy_case_a=tuple(cy_case_a.tolist()),
        cy_case_b=tuple(cy_case_b.tolist()),
        tzx=float(tile_zero_pos_x),
        free_x_space=float(geom.world_size - geom.tiling_width),
        nr2_reset=tuple(nr2_reset.tolist()),
        nr2_goal=float(nr2_goal),
        col_of=tuple(int(c) for c in col_nrs),
        coords=tuple((int(r), int(c)) for r, c in coords),
        cap=geom.n_tiles + FREE_CAP_EXTRA,
    )


def tile_center_exact(consts: ExactTilingConsts, ts: TilingState, tile_nr):
    """Centre of tile(s) under the episode's case/flip/shift, float ops in the
    hexagonal_tiling.py:136-158 order (two adds for x; y fully static per
    case).  tile_nr: scalar or (N,) int32 -> (..., 2) f64."""
    dtype = ts.col_shift.dtype
    sx = jnp.asarray(consts.static_x, dtype)[tile_nr]
    col = jnp.asarray(consts.col_of, jnp.int32)[tile_nr]
    x_shifts = sx + ts.col_shift[col]
    cx = jnp.asarray(consts.tzx, dtype) + x_shifts
    cy_tab = jnp.where(
        ts.case_b,
        jnp.asarray(consts.cy_case_b, dtype),
        jnp.asarray(consts.cy_case_a, dtype),
    )
    cy = cy_tab[tile_nr]
    pos = jnp.stack([cx, cy], axis=-1)
    return jnp.where(ts.flip_xy, pos[..., ::-1], pos)


def _disk_noise(angle, r_u, nr2):
    """uniform_disk_distribution tail (helpers.py:48-53 via
    hexagonal_tiling.py:130-134): angle is the range-scaled draw, r_u the raw
    radius fraction, nr2 the host-precomputed noise_radius**2."""
    r = jnp.sqrt(r_u * nr2)
    return r[..., None] * jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


# ------------------------------------------------------- ordered free list --
# The reference keeps free tiles as an ORDERED python list; candidate draws
# index into it and pop() shifts it.  Device twin: (cap,) int32, entries are
# tile numbers, -1 past the end.

def _freelist_count(fl):
    # dtype pinned: under x64, jnp.sum(int32) silently promotes to int64.
    return jnp.sum(fl >= 0, dtype=jnp.int32)


def _freelist_append(fl, x):
    count = _freelist_count(fl)
    idx = jnp.arange(fl.shape[0], dtype=jnp.int32)
    return jnp.where(idx == count, x, fl)


def _freelist_pop(fl, pos):
    """Remove the entry at index `pos`, shifting the tail left (list.pop)."""
    shifted = jnp.concatenate([fl[1:], jnp.full((1,), -1, fl.dtype)])
    idx = jnp.arange(fl.shape[0], dtype=jnp.int32)
    return jnp.where(idx < pos, fl, shifted)


def reset_exact(geom: TilingGeometry, consts: ExactTilingConsts, rs, dtype):
    """hexagonal_tiling.py:53-93 from recorded draws.

    Draw slots consumed (in feed order): u_case(2), u_cols(cols),
    [n_planets==2: u_diag(1), diag_idx(1)], tiles(n_planets+1),
    disk angles(n_obj, range-scaled), disk radius fractions(n_obj).
    Returns (TilingState, positions (n_obj, 2)) — ship first, like the
    reference."""
    n_obj = geom.n_planets + 1

    u_case = rs.take(2)
    case_b = u_case[0] < 0.5
    flip_xy = u_case[1] < 0.5

    u_cols = rs.take(geom.cols).astype(dtype)
    # numpy cumsum is sequential; an unrolled chain of adds reproduces it
    # (jnp.cumsum may lower to a reassociated scan).
    acc = u_cols[0]
    cs = [acc]
    for j in range(1, geom.cols):
        acc = acc + u_cols[j]
        cs.append(acc)
    cs = jnp.stack(cs)
    col_shift = cs * (jnp.asarray(consts.free_x_space, dtype) / cs[-1])

    if geom.n_planets == 2:
        u_diag = rs.take(1)[0]
        diag_idx = rs.take(1)[0].astype(jnp.int32)
        tiles_feed = rs.take(n_obj).astype(jnp.int32)
        diag = jnp.asarray(DIAGONAL_CASES, jnp.int32)[diag_idx]
        tiles = jnp.where(u_diag < 0.25, diag, tiles_feed)
    else:
        tiles = rs.take(n_obj).astype(jnp.int32)

    # Ordered ascending free list (reference: [i for i in range(n_tiles) if
    # i not in tiles_nrs], hexagonal_tiling.py:92).
    iota_t = jnp.arange(geom.n_tiles, dtype=jnp.int32)
    is_free = ~jnp.any(iota_t[:, None] == tiles[None, :], axis=1)
    pos = jnp.cumsum(is_free.astype(jnp.int32)) - 1
    count = jnp.sum(is_free, dtype=jnp.int32)
    slots = jnp.arange(consts.cap, dtype=jnp.int32)
    onehot = (pos[None, :] == slots[:, None]) & is_free[None, :]
    vals = jnp.sum(onehot.astype(jnp.int32) * iota_t[None, :], axis=1, dtype=jnp.int32)
    freelist = jnp.where(slots < count, vals, jnp.asarray(-1, jnp.int32))

    ts = TilingState(
        free=freelist,
        ship_tile=tiles[0],
        goal_tile=jnp.asarray(-1, jnp.int32),
        case_b=case_b,
        flip_xy=flip_xy,
        col_shift=col_shift,
    )

    angles = rs.take(n_obj).astype(dtype)   # range-scaled uniform(0, 2pi, n)
    r_u = rs.take(n_obj).astype(dtype)
    centers = tile_center_exact(consts, ts, tiles).astype(dtype)
    positions = centers + _disk_noise(angles, r_u, jnp.asarray(consts.nr2_reset, dtype))
    return ts, positions


def find_new_goal_exact(geom: TilingGeometry, consts: ExactTilingConsts,
                        ts: TilingState, rs, dtype):
    """hexagonal_tiling.py:95-128 from recorded draws.

    Draw slots consumed: u_reuse(1), candidate free-list indices(3, choice
    outputs padded with 0 — only the first min(3, len(free)) are live),
    goal disk angle(1, range-scaled), goal disk radius fraction(1).
    Returns (TilingState, goal_pos (2,))."""
    fl = ts.free
    subsequent = ts.goal_tile >= 0
    # "ship inherits the old goal tile, old ship tile returns to the free
    # list" (hexagonal_tiling.py:102-105).
    fl = jnp.where(subsequent, _freelist_append(fl, ts.ship_tile), fl)
    ship_tile = jnp.where(subsequent, ts.goal_tile, ts.ship_tile)
    count = _freelist_count(fl)

    u_reuse = rs.take(1)[0]
    cand = rs.take(MAX_GOAL_CANDIDATES).astype(jnp.int32)
    k = jnp.minimum(jnp.asarray(MAX_GOAL_CANDIDATES, jnp.int32), count)

    coords = jnp.asarray(consts.coords, jnp.int32)
    ship_rc = coords[ship_tile]
    # Reference scan: first strict-greater taxi distance wins
    # (hexagonal_tiling.py:112-121); -1 sentinel plays the role of -inf
    # (taxi distances are >= 0 so the first valid candidate always takes).
    best_d = jnp.asarray(-1, jnp.int32)
    best_pos = jnp.asarray(0, jnp.int32)
    for j in range(MAX_GOAL_CANDIDATES):
        tile_j = fl[cand[j]]
        taxi_j = jnp.sum(jnp.abs(coords[tile_j] - ship_rc), dtype=jnp.int32)
        take = (jnp.asarray(j, jnp.int32) < k) & (taxi_j > best_d)
        best_d = jnp.where(take, taxi_j, best_d)
        best_pos = jnp.where(take, cand[j], best_pos)

    reuse = u_reuse < 0.25
    goal_tile = jnp.where(reuse, ship_tile, fl[best_pos])
    fl = jnp.where(reuse, fl, _freelist_pop(fl, best_pos))

    new_ts = TilingState(
        free=fl,
        ship_tile=ship_tile,
        goal_tile=goal_tile,
        case_b=ts.case_b,
        flip_xy=ts.flip_xy,
        col_shift=ts.col_shift,
    )
    g_angle = rs.take(1).astype(dtype)      # uniform(0, 2pi, size=1)
    g_ru = rs.take(1).astype(dtype)
    center = tile_center_exact(consts, new_ts, goal_tile).astype(dtype)
    # host.py goal call goes through the size-1 vector path then np.squeeze.
    noise = _disk_noise(g_angle, g_ru, jnp.asarray(consts.nr2_goal, dtype))[0]
    return new_ts, center + noise
