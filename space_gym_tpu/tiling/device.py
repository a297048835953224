"""JAX-native hexagonal-tiling sampler — the on-device reset path.

Distribution-equivalent rewrite of the reference HexagonalTiling sampler
(gym_space/hexagonal_tiling.py:53-134) as pure functions of a PRNG key, fully
branchless so they jit and vmap over the env batch:

* tile choice without replacement -> argsort-of-uniforms permutation /
  top-k-of-uniform-scores (both induce the same uniform-subset distribution
  as RandomState.choice(replace=False))
* the 2-planet diagonal special case (hexagonal_tiling.py:75-89) -> masked
  select instead of a Python branch
* goal candidate scoring (farthest taxi distance of <= MAX_GOAL_CANDIDATES
  random free tiles, hexagonal_tiling.py:95-128) -> top-k over score-masked
  free tiles; ties break on random candidate order in both implementations

All randomness is consumed from a RandSource (utils.randvec) — one lane's
slice of the engine's single bulk per-step draw — instead of per-lane PRNG
key trees, which profiling showed dominate the step cost on TPU.

Bitwise RNG parity with the reference's MT19937 draws is NOT a goal here —
that is what the host twin (space_gym_tpu.tiling.host.HostTiling) provides for
the parity adapter.  This module is the performance path: everything stays on
device, thousands of lanes reset per microsecond.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.maths import onehot_take
from ..utils.randvec import RandSource
from .geometry import DIAGONAL_CASES, MAX_GOAL_CANDIDATES, TilingGeometry


# The reference keeps free tiles as a LIST that can hold duplicate entries:
# find_new_goal appends the old ship tile unconditionally
# (hexagonal_tiling.py:104), so after consecutive goal-on-ship-tile draws the
# same tile carries multiple entries and proportionally higher candidate
# weight.  The device twin therefore stores per-tile ENTRY COUNTS, capped at
# MAX_FREE_DUP (exceeding it needs 3+ consecutive p=0.25 same-tile draws —
# probability < 2%% per thousand goal transitions; beyond-cap entries would
# change candidate weights by at most 1 part in 4).
MAX_FREE_DUP = MAX_GOAL_CANDIDATES


class TilingState(NamedTuple):
    """Per-lane dynamic tiling state (mirrors the mutable fields of the
    reference HexagonalTiling instance)."""

    free: jax.Array       # (n_tiles,) int32 — free-list entry count per tile
    ship_tile: jax.Array  # int32
    goal_tile: jax.Array  # int32, -1 until the first goal is placed
    case_b: jax.Array     # bool  (hexagonal_tiling.py:69)
    flip_xy: jax.Array    # bool
    col_shift: jax.Array  # (cols,) cumulative random column shifts


def tile_center_pos(geom: TilingGeometry, ts: TilingState, tile_nr: jax.Array) -> jax.Array:
    """Centre of tile(s) `tile_nr` under the episode's case/flip/shift
    (hexagonal_tiling.py:136-158).  tile_nr: scalar or (N,) -> (..., 2)."""
    coords = jnp.asarray(geom.tiles_coord, jnp.int32)
    rc = onehot_take(coords, tile_nr)
    row = rc[..., 0].astype(ts.col_shift.dtype)
    col = rc[..., 1]
    colf = col.astype(ts.col_shift.dtype)

    zero_x = -geom.world_size / 2 + geom.hex_width / 2
    zero_y = geom.world_size / 2 - geom.hex_height / 2
    zero_y = jnp.where(ts.case_b, zero_y - geom.hex_height / 2, zero_y)

    x = zero_x + colf * 1.5 * geom.a + onehot_take(ts.col_shift, col)
    y_cols = -(col % 2).astype(colf.dtype) * geom.hex_height / 2
    y_cols = jnp.where(ts.case_b, -y_cols, y_cols)
    y = zero_y - row * geom.hex_height + y_cols
    pos = jnp.stack([x, y], axis=-1)
    return jnp.where(ts.flip_xy, pos[..., ::-1], pos)


def _disk_sample(geom, ts, rs: RandSource, tile_nr, radius, dtype):
    """Disc position inside a tile: centre + uniform-disk noise of radius
    hex_height/2 - obj_radius (hexagonal_tiling.py:130-134)."""
    center = tile_center_pos(geom, ts, tile_nr).astype(dtype)
    noise_radius = jnp.asarray(geom.hex_height / 2, dtype) - radius
    return center + rs.disk(noise_radius).astype(dtype)


def tiling_reset(geom: TilingGeometry, rs: RandSource, dtype=jnp.float32):
    """Sample the episode layout + ship/planet positions.

    Returns (TilingState, ship_pos (2,), planets_pos (n_planets, 2)).
    Reference flow: hexagonal_tiling.py:53-93.
    """
    n = geom.n_tiles
    n_obj = geom.n_planets + 1  # ship + planets; goal placed separately

    case_b, flip_xy = rs.take(2) < 0.5
    raw = rs.take(geom.cols).astype(dtype)
    cum = jnp.cumsum(raw)
    free_x_space = geom.world_size - geom.tiling_width
    col_shift = cum * (free_x_space / cum[-1])

    tiles = rs.permutation(n)[:n_obj]
    if geom.n_planets == 2:
        # 25% forced diagonal layouts (hexagonal_tiling.py:75-87).
        use_diag = rs.bernoulli(0.25)
        case = rs.randint(len(DIAGONAL_CASES))
        diag = onehot_take(jnp.asarray(DIAGONAL_CASES, jnp.int32), case)
        tiles = jnp.where(use_diag, diag, tiles)

    # Occupancy without scatter (TPU: masked compare beats scatter); each
    # unoccupied tile starts with exactly one free-list entry.
    iota = jnp.arange(n, dtype=jnp.int32)
    free = (~jnp.any(iota[:, None] == tiles[None, :], axis=1)).astype(jnp.int32)
    ts = TilingState(
        free=free,
        ship_tile=tiles[0],
        goal_tile=jnp.asarray(-1, jnp.int32),
        case_b=case_b,
        flip_xy=flip_xy,
        col_shift=col_shift,
    )
    radii = jnp.asarray(
        [geom.ship_radius] + geom.n_planets * [geom.planets_radius], dtype
    )
    positions = _disk_sample(geom, ts, rs, tiles, radii, dtype)
    return ts, positions[0], positions[1:]


def find_new_goal(geom: TilingGeometry, ts: TilingState, rs: RandSource, dtype=jnp.float32):
    """Place a (new) goal; returns (TilingState, goal_pos (2,)).

    Reference flow (hexagonal_tiling.py:95-128): on subsequent goals the ship
    logically moves into the old goal tile; with p=0.25 the goal shares the
    ship tile, otherwise it is the taxi-farthest of <= MAX_GOAL_CANDIDATES
    uniformly-drawn free tiles.
    """
    coords = jnp.asarray(geom.tiles_coord, jnp.int32)
    iota = jnp.arange(geom.n_tiles, dtype=jnp.int32)

    subsequent = ts.goal_tile >= 0
    free = jnp.where(
        subsequent,
        jnp.minimum(ts.free + (iota == ts.ship_tile), MAX_FREE_DUP),
        ts.free,
    )
    ship_tile = jnp.where(subsequent, ts.goal_tile, ts.ship_tile)

    # Top-k of iid scores over free-list ENTRIES = uniform candidate subset
    # of the reference's (possibly duplicated) free list, in random order
    # (so argmax tie-breaking is random, like the reference's scan over
    # randomly-ordered candidates).  Entry (i, j) exists iff j < free[i].
    same = rs.bernoulli(0.25)
    scores = rs.scores(geom.n_tiles * MAX_FREE_DUP).reshape(geom.n_tiles, MAX_FREE_DUP)
    entry_valid = jnp.arange(MAX_FREE_DUP)[None, :] < free[:, None]
    masked = jnp.where(entry_valid, scores, -1.0).reshape(-1)
    k_cand = min(MAX_GOAL_CANDIDATES, geom.n_tiles * MAX_FREE_DUP)
    # k_cand sequential masked max/argmax passes — identical selection law to
    # lax.top_k (descending values, ties to the lower index; ops/pallas_full.py
    # uses the same construction), but SPMD-clean: XLA's top_k sharding rule
    # all-gathers the vmapped batch axis, which planted a (lanes, 12)
    # all-gather inside EVERY rollout step of the multi-device fixed-physics
    # path (measured: 2-process fair efficiency 0.36 from that alone).
    # max/argmax are plain reduces and shard lane-parallel.
    entry_iota = jnp.arange(masked.shape[0], dtype=jnp.int32)
    work = masked
    tv, tf = [], []
    for _ in range(k_cand):
        tv.append(jnp.max(work))
        tf.append(jnp.argmax(work).astype(jnp.int32))
        work = jnp.where(entry_iota == tf[-1], -2.0, work)
    top_vals, top_flat = jnp.stack(tv), jnp.stack(tf)
    top_idx = (top_flat // MAX_FREE_DUP).astype(jnp.int32)  # entry -> tile
    valid = top_vals >= 0  # fewer than k_cand free entries -> masked out

    ship_rc = onehot_take(coords, ship_tile)
    cand_rc = onehot_take(coords, top_idx)
    taxi = jnp.sum(jnp.abs(cand_rc - ship_rc), axis=-1)
    taxi = jnp.where(valid, taxi, -1)
    best = onehot_take(top_idx, jnp.argmax(taxi).astype(jnp.int32))

    goal_tile = jnp.where(same, ship_tile, best)
    free = jnp.where(same, free, free - (iota == best))

    new_ts = TilingState(
        free=free,
        ship_tile=ship_tile,
        goal_tile=goal_tile,
        case_b=ts.case_b,
        flip_xy=ts.flip_xy,
        col_shift=ts.col_shift,
    )
    goal_pos = _disk_sample(
        geom, new_ts, rs, goal_tile, jnp.asarray(geom.goal_radius, dtype), dtype
    )
    return new_ts, goal_pos
