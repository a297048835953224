"""Scalar/vector math primitives (L0 of the layer map, SURVEY.md SS1).

Pure jnp functions; every function is shape-polymorphic so the same code runs
single-env (scalars) and batched (under vmap). Semantics mirror
gym_space/helpers.py (angle_to_unit_vector:4-5, vector_to_angle:8-9,
gravity:22-35, uniform_disk_distribution:48-53, get_max_dist_in_direction:38-46)
but are written TPU-first: branchless, no data-dependent Python control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import G


def angle_to_unit_vector(angle: jax.Array) -> jax.Array:
    """[cos a, sin a] stacked on a trailing axis (helpers.py:4-5)."""
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def vector_to_angle(vector: jax.Array) -> jax.Array:
    """atan2(y, x) over the trailing axis (helpers.py:8-9)."""
    return jnp.arctan2(vector[..., 1], vector[..., 0])


def orthogonal_proj(of_vector: jax.Array, onto_vector: jax.Array) -> jax.Array:
    """Projection of `of_vector` onto `onto_vector` (helpers.py:12-16; unused
    by the reference envs but part of its public helper surface)."""
    scale = jnp.sum(of_vector * onto_vector, axis=-1, keepdims=True) / jnp.sum(
        onto_vector * onto_vector, axis=-1, keepdims=True
    )
    return scale * onto_vector


def gravity_force(
    from_pos: jax.Array,
    toward_pos: jax.Array,
    from_mass: jax.Array,
    toward_mass: jax.Array,
) -> jax.Array:
    """Newtonian gravity force vector from `from_pos` toward `toward_pos`.

    Matches helpers.gravity (helpers.py:22-35) op-for-op: the direction vector
    is normalized first, then scaled by G*m1*m2/d^2 (NOT fused into d^3 — the
    operation order matters for bitwise parity in f64).
    """
    pos_diff = toward_pos - from_pos
    # helpers.gravity computes np.linalg.norm of the 2-vector (BLAS ddot in
    # numpy); the parity tier routes through the same kernel (ops.exact).
    # dist**2 upstream is a numpy SCALAR power — that's libm pow(x, 2.0),
    # which differs from x*x by 1 ulp on some inputs (numpy's array power
    # fast-path and XLA both square by multiplication) — hence exact.powf.
    from . import exact

    center_distance = exact.norm_last(pos_diff)[..., None]
    force_direction = pos_diff / center_distance
    scalar_force = G * from_mass * toward_mass / exact.powf(
        jnp.squeeze(center_distance, -1), 2
    )
    return force_direction * scalar_force[..., None]


def uniform_disk(key: jax.Array, radius: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Uniform sample inside a disk of `radius` (helpers.py:48-53).

    Draw order matches the reference (angle first, then radius) so that a
    parity harness feeding recorded uniforms can reuse the same layout, but
    this native path uses JAX PRNG keys.  `radius` may be scalar or (N,);
    output has shape radius.shape + (2,).
    """
    k_angle, k_r = jax.random.split(key)
    shape = jnp.shape(radius)
    angle = jax.random.uniform(k_angle, shape, dtype=dtype, maxval=2 * jnp.pi)
    r = jnp.sqrt(jax.random.uniform(k_r, shape, dtype=dtype) * radius**2)
    return r[..., None] * angle_to_unit_vector(angle)


def max_dist_in_direction(max_pos: jax.Array, obj_pos: jax.Array, unit_vec: jax.Array) -> jax.Array:
    """Distance from `obj_pos` along `unit_vec` to the [-max_pos, max_pos]^2 box.

    Branchless version of helpers.get_max_dist_in_direction (helpers.py:38-46):
    of the four boundary-crossing parameters, the smallest positive one.
    """
    cands = jnp.stack(
        [
            (max_pos - obj_pos[..., 0]) / unit_vec[..., 0],
            (-max_pos - obj_pos[..., 0]) / unit_vec[..., 0],
            (max_pos - obj_pos[..., 1]) / unit_vec[..., 1],
            (-max_pos - obj_pos[..., 1]) / unit_vec[..., 1],
        ],
        axis=-1,
    )
    cands = jnp.where(cands > 0, cands, jnp.inf)
    return jnp.min(cands, axis=-1)


def norm2(v: jax.Array) -> jax.Array:
    """Euclidean norm over the trailing axis."""
    return jnp.linalg.norm(v, axis=-1)


def onehot_take(table: jax.Array, idx: jax.Array) -> jax.Array:
    """`table[idx]` for a SMALL leading axis, computed as a one-hot reduction.

    TPU gathers/scatters with per-lane dynamic indices lower to slow
    scatter/gather HLOs; for the tiny lookup tables in this workload
    (<= ~16 tiles/planets/actions) a masked reduction is pure VPU work and
    fuses with its neighbors.  table: (n, ...); idx: scalar or (m,) ->
    table.shape[1:] or (m,) + table.shape[1:].
    """
    n = table.shape[0]
    oh = idx[..., None] == jnp.arange(n, dtype=idx.dtype)  # (..., n)
    extra = table.ndim - 1
    oh = oh.reshape(oh.shape + (1,) * extra)
    t = table.reshape((1,) * (oh.ndim - table.ndim) + table.shape)
    # dtype=table.dtype: numpy's sum promotes sub-default ints (int32 under
    # x64 -> int64), which would silently widen carried int32 state (e.g.
    # TilingState.ship_tile) and break lax.scan carry-type invariance.
    return jnp.sum(jnp.where(oh, t, 0), axis=-1 - extra, dtype=table.dtype)
