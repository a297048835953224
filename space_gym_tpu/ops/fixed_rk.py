"""Fixed-substep Dormand-Prince integrator — the throughput physics path.

The reference's physics runtime is an *adaptive* scipy RK45 with event
root-finding (gym_space/dynamic_model.py:94-125); its TPU-exact twin lives in
space_gym_tpu.ops.rk45.  That twin is bit-faithful but its data-dependent
while-loops serialize badly under vmap (every lane waits for the slowest
accept/reject sequence).  This module is the TPU-first alternative used by the
vectorized engine: a *static* number of Dormand-Prince 5(4) substeps per
control interval, fully unrolled at trace time, so a whole env batch advances
in lockstep with zero divergence — pure fused VPU work under jit/vmap.

Event semantics match the reference's (SURVEY.md Q8): events are checked at
every substep endpoint; on a sign change the event time is refined by
safeguarded Illinois false position on the substep's quartic dense-output
polynomial (see _refine_scalar) and the returned state is the state AT the
(earliest) event time, not at t = step_size.
Events are supplied as a static tuple of *scalar* functions (one per event,
ops.events.make_event_component_fns) so that each root-find touches only the
state components its event reads — XLA dead-code-eliminates the rest of the
dense polynomial (planet/world events read x,y only; the spin event reads
omega only).  With `refine_iters=12` the Illinois iteration is essentially
converged (measured crash-state error ~6e-8; the bisection worst case
h/2^12 bounds pathological brackets) — far below the reference's own
rtol=1e-3 integration tolerance (the strict-parity path remains ops.rk45).

Accuracy: two DP5 substeps over a 0.07 s control interval carry a local error
O((h/2)^6) ~ 1e-9 on these dynamics — tighter than the reference's adaptive
tolerance (scipy defaults, dynamic_model.py:112-118).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .rk45 import N_STAGES, dense_eval, dense_q, rk_step


class FixedSolveResult(NamedTuple):
    y: jax.Array          # state at t_final (event time if terminated, else t_bound)
    t: jax.Array
    terminated: jax.Array  # bool: some terminal event fired this control step
    event_index: jax.Array  # int32 index of the earliest fired event (or -1)


def _refine_scalar(ev, sol, g_lo, g_hi, t_lo, t_hi, iters: int):
    """Refine the root of ev(sol(t)) on [t_lo, t_hi] given the endpoint values.

    Safeguarded Illinois false position (same iterate law as the Pallas
    kernel's joint refinement, ops/pallas_step.py, so single-active-event
    lanes produce identical iterates on both paths): work in the sign
    space normalized so f decreases through the root, take the secant
    point when it falls strictly inside the bracket (superlinear), fall
    back to the bisection midpoint otherwise (bisection worst case), and
    halve the retained endpoint's value when the same side is kept twice
    (the Illinois anti-stall rule).  Returns the high end of the final
    bracket (first point at/past the sign change — scipy's root placement
    up to tolerance).  Meaningless when there is no sign change; the
    caller masks.
    """
    one = jnp.ones_like(g_lo)
    s = jnp.where(g_lo < 0, -one, one)
    lo, hi, f_lo, f_hi = t_lo, t_hi, s * g_lo, s * g_hi
    side = jnp.zeros_like(f_lo)
    # Statically unrolled: a lax loop here would emit one sequential while-op
    # per event per substep, whose per-iteration sync overhead dwarfs the
    # (B,)-wide arithmetic.  Unrolled, the whole refinement fuses into the
    # step kernel as straight-line VPU code.
    for _ in range(iters):
        mid_fp = hi - f_hi * (hi - lo) / (f_hi - f_lo)
        good = jnp.isfinite(mid_fp) & (mid_fp > lo) & (mid_fp < hi)
        mid = jnp.where(good, mid_fp, 0.5 * (lo + hi))
        g_mid = s * ev(sol(mid))
        left = g_mid <= 0  # root in [lo, mid]
        f_lo = jnp.where(left, jnp.where(side > 0, 0.5 * f_lo, f_lo), g_mid)
        f_hi = jnp.where(left, g_mid, jnp.where(side < 0, 0.5 * f_hi, f_hi))
        lo = jnp.where(left, lo, mid)
        hi = jnp.where(left, mid, hi)
        side = jnp.where(left, one, -one)
    return hi


def fixed_solve_step(
    rhs: Callable[[jax.Array, jax.Array], jax.Array],
    event_fns: Sequence[Callable[[jax.Array], jax.Array]],
    y0: jax.Array,
    t_bound,
    n_substeps: int = 2,
    refine_iters: int = 12,
) -> FixedSolveResult:
    """Integrate one control interval [0, t_bound] with `n_substeps` equal
    Dormand-Prince 5(4) steps, stopping at the first terminal-event root.

    Single-env signature (y0: (n,), each event_fns[e]: (n,) -> scalar); batch
    via vmap.  The substep loop is a Python loop — it unrolls at trace time
    into straight XLA code with no control flow, which is what lets the whole
    env batch fuse.
    """
    dtype = y0.dtype
    t_bound = jnp.asarray(t_bound, dtype)
    h = t_bound / n_substeps
    n_events = len(event_fns)

    def eval_events(y):
        return jnp.stack([f(y) for f in event_fns])

    t = jnp.zeros((), dtype)
    y = y0
    f = rhs(t, y0)
    g = eval_events(y0)

    terminated = jnp.asarray(False)
    y_final = y0
    t_final = t
    event_index = jnp.asarray(-1, jnp.int32)

    for _ in range(n_substeps):
        y_new, f_new, K = rk_step(rhs, t, y, f, h)
        t_new = t + h
        g_new = eval_events(y_new)

        # scipy find_active_events with direction=0 (dynamic_model events are
        # all direction-agnostic terminal events).
        up = (g <= 0) & (g_new >= 0)
        down = (g >= 0) & (g_new <= 0)
        active = up | down
        any_event = jnp.any(active) & ~terminated

        Q = dense_q([K[j] for j in range(N_STAGES + 1)])
        t_cap, y_cap, h_cap = t, y, h  # capture loop-carried values for sol

        def sol(tq, t_=t_cap, y_=y_cap, h_=h_cap, Q_=Q):
            return dense_eval(t_, h_, y_, Q_, tq)

        roots = []
        for e in range(n_events):
            root_e = _refine_scalar(
                event_fns[e], sol, g[e], g_new[e], t, t_new, refine_iters
            )
            roots.append(jnp.where(active[e], root_e, jnp.asarray(jnp.inf, dtype)))
        roots = jnp.stack(roots)
        e_idx = jnp.argmin(roots).astype(jnp.int32)
        t_root = jnp.min(roots)
        y_root = sol(t_root)

        y_final = jnp.where(any_event, y_root, jnp.where(terminated, y_final, y_new))
        t_final = jnp.where(any_event, t_root, jnp.where(terminated, t_final, t_new))
        event_index = jnp.where(any_event, e_idx, event_index)
        terminated = terminated | any_event

        # Freeze terminated lanes (avoids integrating through a planet where
        # gravity blows up); non-terminated lanes carry the FSAL derivative.
        y = jnp.where(terminated, y_final, y_new)
        f = jnp.where(terminated, jnp.zeros_like(f_new), f_new)
        g = jnp.where(terminated, g, g_new)
        t = t_new

    return FixedSolveResult(
        y=y_final, t=t_final, terminated=terminated, event_index=event_index
    )
