"""On-device circular replay buffer.

A PyTree of preallocated HBM arrays with a scalar write cursor; inserts and
uniform sampling are pure jittable functions, so the whole
rollout -> insert -> sample -> update loop stays on device (SURVEY.md §2:
"env-state and replay shards along a data axis").  Under a device mesh the
capacity axis is sharded along "data": every host inserts its own lanes'
transitions locally and samples locally — no cross-device traffic in the
replay path; only gradients are all-reduced.

Insertion layout: each `add` writes a whole (B, ...) slab of lanes at row
`cursor % rows`, i.e. the buffer is a (rows, B, ...) ring over time slices.
This keeps writes as contiguous dynamic-update-slices (no scatters) and
matches the lockstep rollout shape.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array  # final_obs of the step (pre-reset; bootstrap target)
    discount: jax.Array  # 0.0 iff terminated (truncation still bootstraps)


class ReplayState(NamedTuple):
    data: Transition      # each leaf (rows, lanes, ...)
    cursor: jax.Array     # () int32 — next row to write
    filled: jax.Array     # () int32 — rows written so far (<= rows)


def replay_init(rows: int, lanes: int, obs_dim: int, action_dim: int, dtype=jnp.float32) -> ReplayState:
    z = lambda *shape: jnp.zeros(shape, dtype)
    data = Transition(
        obs=z(rows, lanes, obs_dim),
        action=z(rows, lanes, action_dim),
        reward=z(rows, lanes),
        next_obs=z(rows, lanes, obs_dim),
        discount=z(rows, lanes),
    )
    return ReplayState(
        data=data, cursor=jnp.asarray(0, jnp.int32), filled=jnp.asarray(0, jnp.int32)
    )


def replay_add(state: ReplayState, tr: Transition) -> ReplayState:
    """Insert one time-slice of transitions, leaves shaped (lanes, ...)."""
    rows = state.data.obs.shape[0]
    row = jnp.mod(state.cursor, rows)

    def put(buf, x):
        return jax.lax.dynamic_update_slice_in_dim(buf, x[None], row, axis=0)

    data = jax.tree.map(put, state.data, tr)
    return ReplayState(
        data=data,
        cursor=state.cursor + 1,
        filled=jnp.minimum(state.filled + 1, rows),
    )


def replay_add_slab(state: ReplayState, slab: Transition) -> ReplayState:
    """Insert T time-slices at once, leaves shaped (T, lanes, ...) — the shape
    a `rollout` scan produces.

    Requires T | rows (checked): the learner always inserts fixed-T slabs, so
    the write offset stays T-aligned and the slab never straddles the ring
    boundary — one contiguous dynamic-update-slice, no O(capacity) shuffling.
    """
    rows = state.data.obs.shape[0]
    t = slab.obs.shape[0]
    if rows % t != 0:
        raise ValueError(f"slab length {t} must divide replay rows {rows}")
    row = jnp.mod(state.cursor, rows)

    def put(buf, x):
        return jax.lax.dynamic_update_slice_in_dim(buf, x, row, axis=0)

    data = jax.tree.map(put, state.data, slab)
    return ReplayState(
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
    rows, lanes = state.data.reward.shape
    k1, k2 = jax.random.split(key)
    row_idx = jax.random.randint(k1, (batch,), 0, jnp.maximum(state.filled, 1))
    lane_idx = jax.random.randint(k2, (batch,), 0, lanes)
    take = lambda buf: buf[row_idx, lane_idx]
    return jax.tree.map(take, state.data)


def replay_sample_rows(state: ReplayState, key: jax.Array, batch: int) -> Transition:
    """Row-granular uniform sample: draw batch//lanes random TIME ROWS and
    take every lane in them.

    Per-element random gathers from a (rows, lanes, ...) HBM buffer are the
    slowest op on TPU (profiled at ~20 ms for 262K elements — more than the
    entire fused K-update kernel); row gathers move the same bytes as a few
    contiguous DMA slices.  Lanes are independent episodes marching in
    lockstep, so a whole row is `lanes` iid transitions sharing only the time
    index — row sampling keeps the marginal distribution uniform over the
    buffer while trading some within-batch time diversity (batch//lanes
    distinct timestamps per minibatch)."""
    rows, lanes = state.data.reward.shape
    if batch % lanes:
        raise ValueError(f"batch {batch} not divisible by lanes {lanes}")
    n_rows = batch // lanes
    row_idx = jax.random.randint(key, (n_rows,), 0, jnp.maximum(state.filled, 1))
    take = lambda buf: jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(buf, row_idx[i], 1, axis=0) for i in range(n_rows)]
    ).reshape((batch,) + buf.shape[2:])
    return jax.tree.map(take, state.data)
