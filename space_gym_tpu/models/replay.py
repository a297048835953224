"""On-device circular replay buffer.

ONE packed HBM array with a scalar write cursor; inserts and uniform sampling
are pure jittable functions, so the whole rollout -> insert -> sample ->
update loop stays on device (SURVEY.md §2: "env-state and replay shards along
a data axis").  Under a device mesh the lanes axis is sharded along "data":
every host inserts its own lanes' transitions locally and samples locally —
no cross-device traffic in the replay path; only gradients are all-reduced.

Packed layout (round 2): `data` is a single (rows, W, lanes) array — LANES
MINOR — whose W rows are [obs | next_obs | action | reward | discount] at
8-aligned offsets (see `replay_cols`).  Two hardware facts force this shape:

* XLA's natural TPU layout for a (rows, lanes, d<128) array puts `lanes` in
  the minor (128-lane) tiled dimension; a Pallas kernel input instead demands
  minor = last dim.  Five separate (rows, lanes, d) leaves therefore caused a
  full-buffer relayout copy on every kernel call (~2 GB of traffic per
  train_iter at flagship sizes).  With lanes last, the XLA-natural and
  Pallas-natural layouts coincide — the fused learner kernel DMAs (W, block)
  tiles straight out of the ring with no relayout and no gather.
* The minor dim tiles to 128 lanes, so a d=13 trailing dim would pad ~10x;
  lanes (thousands) pad not at all, and W only rounds up to a multiple of 8
  sublanes.

The fused learner kernel (models/fused_sac.py) scalar-prefetches sampled row
indices and slices the W rows in-register; XLA-side consumers use the
pack/unpack helpers below.

Insertion layout: each add writes whole (T, W, lanes) slabs at row
`cursor % rows`, i.e. the buffer is a ring over time slices.  Writes are
contiguous dynamic-update-slices (no scatters).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array  # final_obs of the step (pre-reset; bootstrap target)
    discount: jax.Array  # 0.0 iff terminated (truncation still bootstraps)


def _ceil8(x: int) -> int:
    return -(-x // 8) * 8


def replay_cols(obs_dim: int, action_dim: int):
    """8-aligned W-row offsets (o0, n0, a0, r0, d0, W) of the packed buffer:
    obs at o0, next_obs at n0, action at a0, reward row r0, discount row d0.
    Alignment keeps every kernel-side sublane slice on an 8-granule."""
    o0 = 0
    n0 = _ceil8(obs_dim)
    a0 = _ceil8(n0 + obs_dim)
    r0 = a0 + action_dim
    d0 = r0 + 1
    # d0+2, not d0+1: the ones row at d0+1 (replay_ones_row) is RESERVED, so
    # it exists even when d0+1 lands on an 8-boundary (e.g. action_dim=6,
    # where _ceil8(d0+1) == d0+1 would leave no room and the clamped
    # dynamic_update_slice in pack_slab would overwrite the discount row).
    return o0, n0, a0, r0, d0, _ceil8(d0 + 2)


def replay_ones_row(obs_dim: int, action_dim: int) -> int:
    """Row of constant 1.0 at d0+1, explicitly reserved by replay_cols
    (W = ceil8(d0+2)).  The fused learner kernels fold
    the critics' first-layer bias into the f32 action matmul by contracting
    [action | ones] against [W1_action | b1] — the ones row makes both the
    forward bias add and the backward bias grad-reduce ride existing MXU
    matmuls instead of separate (batch, H) VPU ops."""
    d0 = replay_cols(obs_dim, action_dim)[4]
    return d0 + 1


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "cursor", "filled"),
    meta_fields=("obs_dim", "action_dim"),
)
@dataclass(frozen=True)
class ReplayState:
    data: jax.Array       # (rows, W, lanes) packed transitions, lanes minor
    cursor: jax.Array     # () int32 — next row to write
    filled: jax.Array     # () int32 — rows written so far (<= rows)
    obs_dim: int          # static row layout (see replay_cols)
    action_dim: int

    def _replace(self, **kw):
        from dataclasses import replace
        return replace(self, **kw)


def pack_slab(tr: Transition, obs_dim: int, action_dim: int) -> jax.Array:
    """(T, lanes, ·) Transition slab -> (T, W, lanes) packed, lanes minor."""
    o0, n0, a0, r0, d0, w = replay_cols(obs_dim, action_dim)
    t_len, lanes = tr.reward.shape
    fm = lambda x: jnp.swapaxes(x, 1, 2)          # (T, L, d) -> (T, d, L)
    out = jnp.zeros((t_len, w, lanes), tr.obs.dtype)
    out = jax.lax.dynamic_update_slice_in_dim(out, fm(tr.obs), o0, axis=1)
    out = jax.lax.dynamic_update_slice_in_dim(out, fm(tr.next_obs), n0, axis=1)
    out = jax.lax.dynamic_update_slice_in_dim(out, fm(tr.action), a0, axis=1)
    out = jax.lax.dynamic_update_slice_in_dim(out, tr.reward[:, None], r0, axis=1)
    out = jax.lax.dynamic_update_slice_in_dim(out, tr.discount[:, None], d0, axis=1)
    ones = jnp.ones((t_len, 1, lanes), tr.obs.dtype)
    out = jax.lax.dynamic_update_slice_in_dim(out, ones, d0 + 1, axis=1)
    return out


def unpack_flat(flat: jax.Array, obs_dim: int, action_dim: int) -> Transition:
    """(..., W) row-packed vectors -> Transition with (..., d) leaves."""
    o0, n0, a0, r0, d0, _ = replay_cols(obs_dim, action_dim)
    return Transition(
        obs=flat[..., o0:o0 + obs_dim],
        action=flat[..., a0:a0 + action_dim],
        reward=flat[..., r0],
        discount=flat[..., d0],
        next_obs=flat[..., n0:n0 + obs_dim],
    )


def replay_init(rows: int, lanes: int, obs_dim: int, action_dim: int, dtype=jnp.float32) -> ReplayState:
    w = replay_cols(obs_dim, action_dim)[-1]
    return ReplayState(
        data=jnp.zeros((rows, w, lanes), dtype),
        cursor=jnp.asarray(0, jnp.int32),
        filled=jnp.asarray(0, jnp.int32),
        obs_dim=obs_dim,
        action_dim=action_dim,
    )


def replay_add(state: ReplayState, tr: Transition) -> ReplayState:
    """Insert one time-slice of transitions, leaves shaped (lanes, ...)."""
    return replay_add_slab(state, jax.tree.map(lambda x: x[None], tr))


def replay_add_slab(state: ReplayState, slab: Transition) -> ReplayState:
    """Insert T time-slices at once, leaves shaped (T, lanes, ...) — the shape
    a `rollout` scan produces.

    Requires T | rows (checked): the learner always inserts fixed-T slabs, so
    the write offset stays T-aligned and the slab never straddles the ring
    boundary — one contiguous dynamic-update-slice, no O(capacity) shuffling.
    """
    rows = state.data.shape[0]
    t = slab.obs.shape[0]
    if rows % t != 0:
        raise ValueError(f"slab length {t} must divide replay rows {rows}")
    row = jnp.mod(state.cursor, rows)
    packed = pack_slab(slab, state.obs_dim, state.action_dim).astype(state.data.dtype)
    data = jax.lax.dynamic_update_slice_in_dim(state.data, packed, row, axis=0)
    return state._replace(
        data=data,
        cursor=state.cursor + t,
        filled=jnp.minimum(state.filled + t, rows),
    )


def nstep_slab(slab: Transition, dones: jax.Array, gamma: float, n: int) -> Transition:
    """Rewrite a (T, lanes) rollout slab in place as n-step transitions.

    For each start t the chain extends while the episode continues, up to
    min(n, T-t) steps (tail rows fall back to shorter chains so the slab keeps
    length T and the T | rows ring alignment):

      reward'   = sum_{k<m} gamma^k r_{t+k}         (m = chain length)
      next_obs' = next_obs_{t+m-1}                  (pre-reset obs at chain end)
      discount' = gamma^{m-1} * discount_{t+m-1}    (0 if the chain terminated)

    so the critic target `r' + gamma * discount' * V(next_obs')` equals the
    m-step TD target.  Chains stop at ANY done (termination or truncation —
    the next row belongs to a new episode after auto-reset); bootstrapping
    at the cut uses `discount`, which stays 1 on pure truncation.
    """
    if n <= 1:
        return slab
    t_len = slab.reward.shape[0]
    cont = 1.0 - dones.astype(slab.reward.dtype)  # (T, lanes)
    zeros_row = jnp.zeros_like(slab.reward[:1])

    reward = slab.reward
    next_obs = slab.next_obs
    discount = slab.discount
    alive = jnp.ones_like(slab.reward)  # chain from t reaches step t+k
    for k in range(1, n):
        # shift by k with zero padding: row t sees step t+k (or nothing).
        # reach row t = cont[t+k-1] AND t+k < T (step t+k must exist).
        reach = jnp.concatenate([cont[k - 1 : t_len - 1], jnp.tile(zeros_row, (k, 1))])
        alive = alive * reach
        r_k = jnp.concatenate([slab.reward[k:], jnp.tile(zeros_row, (k, 1))])
        obs_k = jnp.concatenate(
            [slab.next_obs[k:], jnp.zeros((k,) + slab.next_obs.shape[1:], slab.next_obs.dtype)]
        )
        d_k = jnp.concatenate([slab.discount[k:], jnp.tile(zeros_row, (k, 1))])
        reward = reward + alive * (gamma**k) * r_k
        next_obs = jnp.where(alive[..., None] > 0, obs_k, next_obs)
        discount = jnp.where(alive > 0, (gamma**k) * d_k, discount)
    return slab._replace(reward=reward, next_obs=next_obs, discount=discount)


def replay_sample(state: ReplayState, key: jax.Array, batch: int) -> Transition:
    """Uniform sample of `batch` transitions from the filled region."""
    rows, _, lanes = state.data.shape
    k1, k2 = jax.random.split(key)
    row_idx = jax.random.randint(k1, (batch,), 0, jnp.maximum(state.filled, 1))
    lane_idx = jax.random.randint(k2, (batch,), 0, lanes)
    flat = state.data[row_idx, :, lane_idx]          # (batch, W)
    return unpack_flat(flat, state.obs_dim, state.action_dim)


def replay_sample_rows(state: ReplayState, key: jax.Array, batch: int) -> Transition:
    """Row-granular uniform sample: draw batch//lanes random TIME ROWS and
    take every lane in them.

    Per-element random gathers from the HBM ring are the slowest op on TPU
    (profiled at ~20 ms for 262K elements — more than the entire fused
    K-update kernel); row gathers move whole contiguous slices.  Lanes are
    independent episodes marching in lockstep, so a whole row is `lanes` iid
    transitions sharing only the time index — row sampling keeps the marginal
    distribution uniform over the buffer while trading some within-batch time
    diversity (batch//lanes distinct timestamps per minibatch).  On TPU the
    fused learner goes one step further and skips even this gather
    (fused_sac.fused_update_k_from_replay DMAs the rows in-kernel from
    scalar-prefetched indices)."""
    rows, w, lanes = state.data.shape
    if batch % lanes:
        raise ValueError(f"batch {batch} not divisible by lanes {lanes}")
    n_rows = batch // lanes
    row_idx = jax.random.randint(key, (n_rows,), 0, jnp.maximum(state.filled, 1))
    flat = jnp.swapaxes(state.data[row_idx], 1, 2).reshape(batch, w)
    return unpack_flat(flat, state.obs_dim, state.action_dim)
