"""Adaptive Dormand-Prince RK5(4) integrator with terminal-event root-finding.

This is the TPU-native replacement for the reference's physics runtime,
`scipy.integrate.solve_ivp(method="RK45", events=...)` as invoked from
gym_space/dynamic_model.py:112-118.  The reference calls solve_ivp afresh for
every control step (t: 0 -> step_size) and takes the state at the first
terminal-event time if one occurs (dynamic_model.py:121-124, quirk Q8 in
SURVEY.md).

For trajectory parity we replicate the published algorithms exactly, in f64:

* Hairer/Norsett/Wanner initial-step heuristic (scipy common.select_initial_step)
* Dormand-Prince 5(4) tableau with local extrapolation (scipy rk.RK45)
* RMS-scaled error norm, SAFETY=0.9, MIN_FACTOR=0.2, MAX_FACTOR=10 PI-less
  step controller with the rejected-step factor<=1 rule (scipy rk.RungeKutta._step_impl)
* quartic dense-output polynomial (scipy rk.RkDenseOutput, RK45.P)
* event sign-change detection at accepted-step endpoints with direction=0
  semantics and Brent root refinement at xtol=rtol=4*eps
  (scipy ivp.find_active_events / solve_event_equation); on simultaneous
  events the earliest root wins, matching ivp.handle_events truncation.

Everything is expressed with lax.while_loop / static unrolling so it jits and
vmaps over an env batch.  Written from the published algorithm descriptions —
this module is new code, not a copy of scipy or of the reference.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import exact

SAFETY = 0.9
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0
ERROR_ESTIMATOR_ORDER = 4
ERROR_EXPONENT = -1.0 / (ERROR_ESTIMATOR_ORDER + 1)

# Dormand-Prince 5(4) Butcher tableau (published in Dormand & Prince 1980;
# identical to scipy rk.RK45.{C,A,B,E,P}).
DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)
DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
)
DP_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84)
DP_E = (-71 / 57600, 0.0, 71 / 16695, -71 / 1920, 17253 / 339200, -22 / 525, 1 / 40)
# Quartic interpolant coefficients (rows = stages 0..6, cols = powers x^1..x^4).
DP_P = (
    (1.0, -8048581381 / 2820520608, 8663915743 / 2820520608, -12715105075 / 11282082432),
    (0.0, 0.0, 0.0, 0.0),
    (0.0, 131558114200 / 32700410799, -68118460800 / 10900136933, 87487479700 / 32700410799),
    (0.0, -1754552775 / 470086768, 14199869525 / 1410260304, -10690763975 / 1880347072),
    (0.0, 127303824393 / 49829197408, -318862633887 / 49829197408, 701980252875 / 199316789632),
    (0.0, -282668133 / 205662961, 2019193451 / 616988883, -1453857185 / 822651844),
    (0.0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423),
)
N_STAGES = 6

# Bogacki-Shampine 3(2) (scipy RK23): 3 stages + FSAL.  Used only by the
# fixed-substep Pallas path as an opt-in shorter-dependency-chain tableau
# (ops/pallas_step.py tableau="bs3"); local error O(h^4) ~ 1.5e-6 at
# h = 0.035 - far below the reference's own rtol=1e-3 and the golden
# tier's 2e-4, but above the DP5 default's ~1e-9.  The adaptive parity
# integrator in this module remains DP5-only (scipy twin).
BS3_A = (
    (),
    (1 / 2,),
    (0.0, 3 / 4),
)
BS3_B = (2 / 9, 1 / 3, 4 / 9)
# Cubic interpolant (scipy RK23.P): rows = stages 0..3, cols = powers x^1..x^3.
BS3_P = (
    (1.0, -4 / 3, 5 / 9),
    (0.0, 1.0, -2 / 3),
    (0.0, 4 / 3, -8 / 9),
    (0.0, -1.0, 1.0),
)
BS3_N_STAGES = 3

STATUS_RUNNING = 0
STATUS_EVENT = 1
STATUS_FINISHED = 2
STATUS_FAILED = -1


def _rms_norm(x: jax.Array) -> jax.Array:
    """scipy common.norm: ||x||_2 / sqrt(n).  In parity mode the norm routes
    through numpy's own BLAS ddot (ops.exact) — numpy's 1-D norm is NOT a
    sequential sum of squares."""
    if exact.enabled():
        return exact.divc(exact.norm_last(x), x.size ** 0.5)
    return jnp.linalg.norm(x) / (x.size ** 0.5)


def _wsum(vectors, coeffs) -> jax.Array:
    """Sequential weighted sum sum_j vectors[j]*coeffs[j] in ascending j.

    Explicit left-to-right accumulation pins the f64 rounding order; close to
    (but not exactly) numpy's BLAS gemv order — the parity path uses
    _stage_dot instead.
    """
    acc = vectors[0] * coeffs[0]
    for v, c in zip(vectors[1:], coeffs[1:]):
        acc = acc + v * c
    return acc


def _stage_dot(vectors, coeffs, which: int) -> jax.Array:
    """np.dot(K[:s].T, coeffs) as scipy computes it.  Parity mode issues the
    same OpenBLAS gemv numpy would (ops.exact); otherwise the sequential
    accumulation (bit-identical coefficient values either way)."""
    if exact.enabled():
        return exact.kt_dot(jnp.stack(vectors), which)
    return _wsum(vectors, coeffs)


def _powf(x, e: float):
    """Static-exponent pow; libm-exact in parity mode (scipy's controller
    pow is numpy-scalar pow == libm pow)."""
    if exact.enabled():
        return exact.powf(x, e)
    return x**e


def select_initial_step(rhs, t0, y0, f0, t_bound, rtol, atol):
    """Hairer/Norsett/Wanner empirical initial step (scipy common.select_initial_step),
    specialized to direction=+1 and max_step=inf."""
    interval_length = jnp.abs(t_bound - t0)
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, interval_length)
    y1 = y0 + h0 * f0
    f1 = rhs(t0 + h0, y1)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        _powf(0.01 / jnp.maximum(d1, d2), 1.0 / (ERROR_ESTIMATOR_ORDER + 1)),
    )
    return jnp.minimum(jnp.minimum(100 * h0, h1), interval_length)


def rk_step(rhs, t, y, f, h):
    """One Dormand-Prince step; returns (y_new, f_new, K list of 7 stage derivatives)."""
    K = [f]
    for s in range(1, N_STAGES):
        dy = _stage_dot(K, DP_A[s], s) * h
        K.append(rhs(t + DP_C[s] * h, y + dy))
    y_new = y + h * _stage_dot(K, DP_B, 6)
    f_new = rhs(t + h, y_new)
    K.append(f_new)
    return y_new, f_new, K


def dense_q(K) -> jax.Array:
    """Dense-output coefficient matrix Q = K^T P, shape (n, 4).  Parity mode
    issues numpy's dgemm for K.T.dot(P) (scipy RkDenseOutput construction)."""
    if exact.enabled():
        return exact.ktp(jnp.stack(K))
    cols = []
    for m in range(4):
        cols.append(_wsum(K, tuple(DP_P[j][m] for j in range(7))))
    return jnp.stack(cols, axis=-1)


def dense_eval(t_old: jax.Array, h: jax.Array, y_old: jax.Array, Q: jax.Array, t: jax.Array) -> jax.Array:
    """Evaluate the quartic interpolant at scalar t (scipy RkDenseOutput._call_impl)."""
    x = (t - t_old) / h
    # p = cumprod([x, x, x, x]) = [x, x^2, x^3, x^4], built sequentially.
    p1 = x
    p2 = p1 * x
    p3 = p2 * x
    p4 = p3 * x
    if exact.enabled():
        # scipy: y = h * np.dot(Q, p) + y_old (numpy RowMajor gemv).
        y = h * exact.dot_mv(Q, jnp.stack([p1, p2, p3, p4]))
    else:
        y = h * (Q[:, 0] * p1 + Q[:, 1] * p2 + Q[:, 2] * p3 + Q[:, 3] * p4)
    return y + y_old


class _BrentCarry(NamedTuple):
    xpre: jax.Array
    xcur: jax.Array
    xblk: jax.Array
    fpre: jax.Array
    fcur: jax.Array
    fblk: jax.Array
    spre: jax.Array
    scur: jax.Array
    done: jax.Array
    i: jax.Array


def brentq(f: Callable[[jax.Array], jax.Array], xa, xb, xtol, rtol, maxiter: int = 100):
    """Brent's method exactly as in scipy.optimize.brentq (zeros.c brentq logic).

    Assumes a sign change on [xa, xb]; if there is none the iteration is still
    bounded by `maxiter` and the (meaningless) result must be masked by the
    caller.  All ops in the operand dtype (f64 for parity).
    """
    xa = jnp.asarray(xa)
    xb = jnp.asarray(xb)
    fa = f(xa)
    fb = f(xb)
    zero = jnp.zeros_like(xa)

    def cond(c: _BrentCarry):
        return (~c.done) & (c.i < maxiter)

    def body(c: _BrentCarry):
        xpre, xcur, xblk = c.xpre, c.xcur, c.xblk
        fpre, fcur, fblk = c.fpre, c.fcur, c.fblk
        spre, scur = c.spre, c.scur

        bracket = (fpre != 0) & (fcur != 0) & (jnp.signbit(fpre) != jnp.signbit(fcur))
        xblk = jnp.where(bracket, xpre, xblk)
        fblk = jnp.where(bracket, fpre, fblk)
        s_new = xcur - xpre
        spre = jnp.where(bracket, s_new, spre)
        scur = jnp.where(bracket, s_new, scur)

        swap = jnp.abs(fblk) < jnp.abs(fcur)
        xpre, xcur, xblk = (
            jnp.where(swap, xcur, xpre),
            jnp.where(swap, xblk, xcur),
            jnp.where(swap, xcur, xblk),
        )
        fpre, fcur, fblk = (
            jnp.where(swap, fcur, fpre),
            jnp.where(swap, fblk, fcur),
            jnp.where(swap, fcur, fblk),
        )

        delta = (xtol + rtol * jnp.abs(xcur)) / 2
        sbis = (xblk - xcur) / 2
        converged = (fcur == 0) | (jnp.abs(sbis) < delta)

        # Interpolation / extrapolation try.
        use_interp = (jnp.abs(spre) > delta) & (jnp.abs(fcur) < jnp.abs(fpre))
        # Secant (xpre == xblk) vs inverse-quadratic.
        secant = xpre == xblk
        stry_secant = -fcur * (xcur - xpre) / (fcur - fpre)
        dpre = (fpre - fcur) / (xpre - xcur)
        dblk = (fblk - fcur) / (xblk - xcur)
        stry_iq = -fcur * (fblk * dblk - fpre * dpre) / (dblk * dpre * (fblk - fpre))
        stry = jnp.where(secant, stry_secant, stry_iq)
        good = 2 * jnp.abs(stry) < jnp.minimum(jnp.abs(spre), 3 * jnp.abs(sbis) - delta)
        spre_n = jnp.where(use_interp & good, scur, sbis)
        scur_n = jnp.where(use_interp & good, stry, sbis)

        xpre_n, fpre_n = xcur, fcur
        step = jnp.where(jnp.abs(scur_n) > delta, scur_n, jnp.where(sbis > 0, delta, -delta))
        xcur_n = xcur + step
        fcur_n = f(xcur_n)

        new = _BrentCarry(
            xpre=jnp.where(converged, xpre, xpre_n),
            xcur=jnp.where(converged, xcur, xcur_n),
            xblk=xblk,
            fpre=jnp.where(converged, fpre, fpre_n),
            fcur=jnp.where(converged, fcur, fcur_n),
            fblk=fblk,
            spre=jnp.where(converged, spre, spre_n),
            scur=jnp.where(converged, scur, scur_n),
            done=c.done | converged,
            i=c.i + 1,
        )
        return new

    init = _BrentCarry(
        xpre=xa, xcur=xb, xblk=zero, fpre=fa, fcur=fb, fblk=zero,
        spre=zero, scur=zero,
        done=jnp.asarray(False), i=jnp.asarray(0),
    )
    # Endpoint exact zeros short-circuit like scipy.
    endpoint_root = jnp.where(fa == 0, xa, xb)
    endpoint_hit = (fa == 0) | (fb == 0)
    out = lax.while_loop(cond, body, init)
    return jnp.where(endpoint_hit, endpoint_root, out.xcur)


class SolveResult(NamedTuple):
    y: jax.Array  # state at t_final (event time if terminated, else t_bound)
    t: jax.Array
    terminated: jax.Array  # bool: a terminal event fired (solve_ivp status == 1)
    failed: jax.Array  # bool: step size underflow (never expected here)
    n_steps: jax.Array  # accepted RK steps taken


class _OuterCarry(NamedTuple):
    t: jax.Array
    y: jax.Array
    f: jax.Array
    h_abs: jax.Array
    g: jax.Array
    status: jax.Array
    y_final: jax.Array
    t_final: jax.Array
    n_steps: jax.Array


def solve_step(
    rhs: Callable[[jax.Array, jax.Array], jax.Array],
    event_fn: Callable[[jax.Array], jax.Array],
    y0: jax.Array,
    t_bound,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 1000,
) -> SolveResult:
    """Integrate y' = rhs(t, y) from t=0 to t_bound, stopping at the first
    terminal-event root — the full solve_ivp(..., events=...) semantics used by
    the reference's make_step (dynamic_model.py:94-125) in one jittable call.

    `event_fn(y) -> (E,)` (the reference events are time-independent).
    """
    dtype = y0.dtype
    t_bound = jnp.asarray(t_bound, dtype)
    eps = jnp.finfo(dtype).eps
    tol4 = 4 * eps  # brentq xtol/rtol used by scipy solve_event_equation

    t0 = jnp.zeros((), dtype)
    f0 = rhs(t0, y0)
    h_abs0 = select_initial_step(rhs, t0, y0, f0, t_bound, rtol, atol)
    g0 = event_fn(y0)
    n_events = g0.shape[0]

    def attempt_steps(t, y, f, h_abs):
        """scipy RungeKutta._step_impl: inner accept/reject loop."""
        min_step = 10 * jnp.abs(jnp.nextafter(t, jnp.asarray(jnp.inf, dtype)) - t)
        h_abs = jnp.maximum(h_abs, min_step)  # max_step is inf

        def cond(carry):
            accepted, failed = carry[0], carry[1]
            return ~(accepted | failed)

        def body(carry):
            _, _, h_abs, step_rejected, *_ = carry
            # ~(>=) instead of (<): a NaN h_abs (non-finite RHS poisoning the
            # controller) must fail the solve, not spin the loop forever.
            failed = ~(h_abs >= min_step)
            t_new = jnp.minimum(t + h_abs, t_bound)
            h = t_new - t
            h_abs_cur = jnp.abs(h)
            y_new, f_new, K = rk_step(rhs, t, y, f, h)
            scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
            error = _stage_dot(K, DP_E, 7) * h
            error_norm = _rms_norm(error / scale)
            ok = error_norm < 1
            pow_err = _powf(error_norm, ERROR_EXPONENT)
            factor_ok = jnp.where(
                error_norm == 0,
                MAX_FACTOR,
                jnp.minimum(MAX_FACTOR, SAFETY * pow_err),
            )
            factor_ok = jnp.where(step_rejected, jnp.minimum(1.0, factor_ok), factor_ok)
            # Non-finite error (singular/NaN RHS): max(MIN_FACTOR, nan) is nan
            # and would turn h_abs into nan — force the geometric shrink so
            # the step-size-underflow failure path fires instead of hanging.
            # Finite-path arithmetic is untouched (bitwise parity preserved).
            factor_bad = jnp.where(
                jnp.isfinite(error_norm),
                jnp.maximum(MIN_FACTOR, SAFETY * pow_err),
                jnp.asarray(MIN_FACTOR, dtype),
            )
            h_abs_next = jnp.where(ok, h_abs_cur * factor_ok, h_abs_cur * factor_bad)
            accepted = ok & ~failed
            Kst = jnp.stack(K)
            return (accepted, failed, h_abs_next, step_rejected | ~ok, t_new, h, y_new, f_new, Kst)

        Kz = jnp.zeros((N_STAGES + 1,) + y.shape, dtype)
        init = (
            jnp.asarray(False),
            jnp.asarray(False),
            h_abs,
            jnp.asarray(False),
            t,
            jnp.zeros((), dtype),
            y,
            f,
            Kz,
        )
        accepted, failed, h_abs_next, _, t_new, h, y_new, f_new, K = lax.while_loop(
            cond, body, init
        )
        return accepted & ~failed, failed, t_new, h, y_new, f_new, K, h_abs_next

    def outer_cond(c: _OuterCarry):
        return (c.status == STATUS_RUNNING) & (c.n_steps < max_steps)

    def outer_body(c: _OuterCarry):
        ok, failed, t_new, h, y_new, f_new, K, h_abs_next = attempt_steps(
            c.t, c.y, c.f, c.h_abs
        )
        Q = dense_q([K[j] for j in range(N_STAGES + 1)])

        g_new = event_fn(y_new)
        up = (c.g <= 0) & (g_new >= 0)
        down = (c.g >= 0) & (g_new <= 0)
        active = up | down
        any_event = jnp.any(active)

        def sol(tq):
            return dense_eval(c.t, h, c.y, Q, tq)

        def find_roots(_):
            roots = []
            for e in range(n_events):
                def ge(tq, e=e):
                    return event_fn(sol(tq))[e]

                root_e = brentq(ge, c.t, t_new, xtol=tol4, rtol=tol4)
                roots.append(jnp.where(active[e], root_e, jnp.asarray(jnp.inf, dtype)))
            t_root = jnp.min(jnp.stack(roots))
            return t_root, sol(t_root)

        def no_roots(_):
            return t_new, y_new

        t_root, y_root = lax.cond(any_event, find_roots, no_roots, None)

        finished = t_new >= t_bound
        status = jnp.where(
            failed,
            STATUS_FAILED,
            jnp.where(any_event, STATUS_EVENT, jnp.where(finished, STATUS_FINISHED, STATUS_RUNNING)),
        )
        y_final = jnp.where(any_event, y_root, y_new)
        t_final = jnp.where(any_event, t_root, t_new)
        return _OuterCarry(
            t=t_new,
            y=y_new,
            f=f_new,
            h_abs=h_abs_next,
            g=g_new,
            status=status.astype(jnp.int32),
            y_final=y_final,
            t_final=t_final,
            n_steps=c.n_steps + 1,
        )

    init = _OuterCarry(
        t=t0,
        y=y0,
        f=f0,
        h_abs=h_abs0,
        g=g0,
        status=jnp.asarray(STATUS_RUNNING, jnp.int32),
        y_final=y0,
        t_final=t0,
        n_steps=jnp.asarray(0, jnp.int32),
    )
    out = lax.while_loop(outer_cond, outer_body, init)
    return SolveResult(
        y=out.y_final,
        t=out.t_final,
        terminated=out.status == STATUS_EVENT,
        failed=out.status == STATUS_FAILED,
        n_steps=out.n_steps,
    )
