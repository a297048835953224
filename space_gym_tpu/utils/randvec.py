"""Bulk randomness plumbing for the vectorized engine.

The naive functional-RL pattern — a PRNG key per env lane, split at every
consumer — costs ~20 dependent threefry invocations per lane per step (resets
and goal resampling are RNG-heavy), which profiling shows dominates the whole
env step on TPU.  The TPU-first pattern is ONE bulk `jax.random.uniform(key,
(B, N))` draw per batch step: a single fused counter-based kernel, no
dependency chains, no per-lane key state.

`RandSource` wraps one lane's slice of that draw behind a cursor: consumers
(`uniform`, `normal`, `permutation`, ...) take statically-shaped slices at
trace time, so consumption order is fixed by program structure exactly like
the reference's RandomState call sequence (SURVEY.md §3.2).  `count_consumed`
traces a consumer abstractly (jax.eval_shape, nothing compiled or executed) to
size the bulk draw exactly per config.

Normals come from uniforms via the inverse normal CDF (ndtri) — a few
polynomial evaluations, amortized into the same fused kernel.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


class RandSource:
    """Cursor over a (N,) vector of iid U[0,1) draws (one env lane's budget).

    Not a pytree: it exists only during tracing; the cursor advances in
    Python, so all slices are static.
    """

    def __init__(self, u: jax.Array):
        self.u = u
        self.i = 0

    def take(self, n: int) -> jax.Array:
        """Next n uniforms, shape (n,).  Static slice — the cursor is Python."""
        if self.i + n > self.u.shape[0]:
            raise ValueError(
                f"RandSource exhausted: need {self.i + n} of {self.u.shape[0]}"
            )
        out = self.u[self.i : self.i + n]
        self.i += n
        return out

    # ------------------------------------------------------------ samplers --
    def uniform(self, n: int | None = None, minval=0.0, maxval=1.0) -> jax.Array:
        u = self.take(1 if n is None else n)
        if n is None:
            u = u[0]
        return minval + u * (maxval - minval)

    def normal(self, n: int | None = None) -> jax.Array:
        """Standard normal via inverse CDF.  The uniform is nudged into the
        open interval so ndtri never sees 0 or 1."""
        u = self.take(1 if n is None else n)
        if n is None:
            u = u[0]
        tiny = jnp.finfo(u.dtype).tiny
        return jax.scipy.special.ndtri(jnp.clip(u, tiny, 1 - jnp.finfo(u.dtype).epsneg))

    def bernoulli(self, p: float) -> jax.Array:
        return self.take(1)[0] < p

    def randint(self, maxval: int) -> jax.Array:
        """Uniform int in [0, maxval)."""
        return jnp.minimum(
            (self.take(1)[0] * maxval).astype(jnp.int32), maxval - 1
        )

    def permutation(self, n: int) -> jax.Array:
        """Uniform random permutation of range(n) (argsort of iid uniforms)."""
        return jnp.argsort(self.take(n)).astype(jnp.int32)

    def scores(self, n: int) -> jax.Array:
        """iid continuous scores for top-k subset selection (the Gumbel-top-k
        role; any iid continuous distribution induces the same uniform-subset
        law, so plain uniforms are used — no logs needed)."""
        return self.take(n)

    def disk(self, radius) -> jax.Array:
        """Uniform point(s) in disk(s) of `radius` (scalar or (M,)), matching
        helpers.uniform_disk_distribution's angle-then-radius draw order
        (helpers.py:48-53).  Returns radius.shape + (2,)."""
        shape = jnp.shape(radius)
        m = shape[0] if shape else 1
        angle = self.take(m) * (2 * jnp.pi)
        r = jnp.sqrt(self.take(m) * jnp.asarray(radius).reshape(-1) ** 2)
        out = r[:, None] * jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)
        return out if shape else out[0]


def count_consumed(
    fn: Callable[..., object],
    probe: int = 4096,
    dtype=jnp.float32,
    example_args: tuple = (),
) -> int:
    """Number of uniforms `fn(rs, *example_args)` consumes, determined by
    abstract tracing (jax.eval_shape — nothing compiled or executed).
    `example_args` are ShapeDtypeStruct pytrees for any extra inputs."""
    consumed = 0

    def wrapped(u, *args):
        nonlocal consumed
        rs = RandSource(u)
        fn(rs, *args)
        consumed = rs.i
        return jnp.zeros(())

    jax.eval_shape(wrapped, jax.ShapeDtypeStruct((probe,), dtype), *example_args)
    return consumed


def bulk_uniform(key: jax.Array, batch: int, n: int, dtype=jnp.float32) -> jax.Array:
    """The one-per-step bulk draw: (batch, n) iid U[0,1)."""
    return jax.random.uniform(key, (batch, n), dtype=dtype)
