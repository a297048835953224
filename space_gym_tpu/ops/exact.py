"""Switchable numpy-exact math for the DEVICE parity tier.

Default (disabled): every function is the plain jnp expression the engine has
always used — zero behavior change on TPU or in the normal test suite.

Parity mode (env SGT_EXACT_MATH=1, CPU backend): the functions lower to XLA
FFI custom calls into parity/native/sgt_exactmath.cpp, which reproduces
numpy's arithmetic exactly — np.linalg.norm / np.dot through the SAME
OpenBLAS numpy bundles (dlopen), pow/atan2 through libm.  Combined with
XLA_FLAGS=--xla_disable_hlo_passes=fusion (which stops LLVM from contracting
mul+add chains into FMAs; see ARCHITECTURE.md "device bitwise parity"), the
engine's f64 adaptive path replays reference trajectories bit-for-bit.

The mode is process-global by design: it exists for the parity replay
subprocess (space_gym_tpu.parity.device_replay), never for training.
"""
from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading

import jax
import jax.numpy as jnp

from ..utils.native_build import lib_is_fresh, write_stamp

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "parity", "native")
_SRC = os.path.join(_SRC_DIR, "sgt_exactmath.cpp")
_LIB = os.path.join(_SRC_DIR, "libsgt_exactmath.so")

_lock = threading.Lock()
_registered = False
_build_error = None

_TARGETS = {
    "sgt_exact_pow": "SgtExactPow",
    "sgt_exact_atan2": "SgtExactAtan2",
    "sgt_exact_norm_last": "SgtExactNormLast",
    "sgt_exact_norm_last_f32": "SgtExactNormLastF32",
    "sgt_exact_kt_dot": "SgtExactKtDot",
    "sgt_exact_ktp": "SgtExactKtP",
    "sgt_exact_dot_mv": "SgtExactDotMv",
}

# Coefficient-vector selectors for kt_dot (mirrors dp_coeffs in the .cpp).
WHICH_A = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
WHICH_B = 6
WHICH_E = 7


def enabled() -> bool:
    return os.environ.get("SGT_EXACT_MATH") == "1"


def _build():
    include = None
    try:
        include = jax.ffi.include_dir()
    except Exception as e:  # pragma: no cover
        return f"jax.ffi.include_dir failed: {e}"
    cmd = [
        "g++", "-std=c++17", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
        f"-I{include}", "-o", _LIB, _SRC, "-ldl",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    write_stamp(_SRC, _LIB)
    return None


def _ensure_registered():
    """Build + dlopen + register the FFI targets (CPU platform).  Returns
    True on success; failures are remembered and surfaced on first use."""
    global _registered, _build_error
    with _lock:
        if _registered:
            return True
        if _build_error is not None:
            raise RuntimeError(f"sgt_exactmath unavailable: {_build_error}")
        # Source-hash stamp, not mtime (utils/native_build.py): a fresh
        # checkout must never dlopen a stale binary as the parity oracle.
        if not lib_is_fresh(_SRC, _LIB):
            _build_error = _build()
            if _build_error is not None:
                raise RuntimeError(f"sgt_exactmath build failed: {_build_error}")
        lib = ctypes.CDLL(_LIB)
        # Same-OpenBLAS trick as parity/native.py: numpy's own kernels are the
        # only bit-exact implementation of numpy's dot/norm.
        import numpy as _np

        base = os.path.dirname(os.path.dirname(os.path.abspath(_np.__file__)))
        cands = glob.glob(os.path.join(base, "numpy.libs", "libscipy_openblas*.so"))
        if cands:
            lib.sgt_exact_init(cands[0].encode())
        for name, symbol in _TARGETS.items():
            jax.ffi.register_ffi_target(
                name, jax.ffi.pycapsule(getattr(lib, symbol)), platform="cpu"
            )
        _registered = True
        return True


def _call(target, out_sds, *args, **attrs):
    _ensure_registered()
    return jax.ffi.ffi_call(target, out_sds, vmap_method="broadcast_all")(*args, **attrs)


def _sds(shape, dtype=jnp.float64):
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------- functions --

def divc(x, c):
    """x / c with a compile-time-constant divisor.

    XLA strength-reduces division by a constant into multiplication by its
    reciprocal (1 ulp off whenever 1/c is inexact); numpy emits a true
    division.  Parity mode hides the constant behind an optimization barrier
    so XLA must emit the division.  No-op change when parity is off."""
    if not enabled():
        return x / c
    x = jnp.asarray(x)
    return x / jax.lax.optimization_barrier(jnp.asarray(c, x.dtype))


def powf(x, e: float):
    """x ** e with a static exponent (scipy controller / init-step pow)."""
    if not enabled():
        return x**e
    x = jnp.asarray(x, jnp.float64)
    return _call("sgt_exact_pow", _sds(x.shape), x, e=float(e))


def atan2(y, x):
    """np.arctan2 twin (lidar obs, Kepler orbit angles).

    numpy >= 2 ships its own f64 atan2 (scalar and array paths agree with
    each other but differ from libm by 1 ulp on ~8% of inputs), so the only
    bit-exact oracle is numpy itself: parity mode calls back into
    np.arctan2.  Off the integrator hot loop (once per step), so the
    callback cost is irrelevant for the parity tier."""
    if not enabled():
        return jnp.arctan2(y, x)
    import numpy as np

    y = jnp.asarray(y, jnp.float64)
    x = jnp.asarray(x, jnp.float64)
    return jax.pure_callback(
        lambda a, b: np.arctan2(np.asarray(a), np.asarray(b)),
        _sds(jnp.broadcast_shapes(y.shape, x.shape)),
        y, x, vmap_method="broadcast_all",
    )


def norm_last(v):
    """np.linalg.norm over the trailing axis — numpy's 1-D norm is
    sqrt(BLAS-ddot(x, x)), NOT a sequential sum of squares."""
    if not enabled():
        return jnp.linalg.norm(v, axis=-1)
    v = jnp.asarray(v)
    if v.dtype == jnp.float32:
        return _call("sgt_exact_norm_last_f32", _sds(v.shape[:-1], jnp.float32), v)
    return _call("sgt_exact_norm_last", _sds(jnp.asarray(v, jnp.float64).shape[:-1]),
                 jnp.asarray(v, jnp.float64))


def kt_dot(k_stacked, which: int):
    """np.dot(K[:s].T, coeffs) for the RK45 stage combinations; `which`
    selects the baked Dormand-Prince coefficient vector (1..5 = A row,
    6 = B, 7 = E).  k_stacked: (..., s, 6) -> (..., 6)."""
    if not enabled():
        raise RuntimeError("kt_dot is parity-mode only; use _wsum otherwise")
    k_stacked = jnp.asarray(k_stacked, jnp.float64)
    return _call(
        "sgt_exact_kt_dot", _sds(k_stacked.shape[:-2] + k_stacked.shape[-1:]),
        k_stacked, which=int(which),
    )


def ktp(k_stacked):
    """Q = np.dot(K.T, P): (..., 7, 6) -> (..., 6, 4)."""
    if not enabled():
        raise RuntimeError("ktp is parity-mode only; use dense_q otherwise")
    k_stacked = jnp.asarray(k_stacked, jnp.float64)
    return _call(
        "sgt_exact_ktp", _sds(k_stacked.shape[:-2] + (k_stacked.shape[-1], 4)),
        k_stacked,
    )


def dot_mv(a, x):
    """np.dot(A, x) for small row-major matrices (dense-output Q @ p, the
    Kepler 2x2 rotation)."""
    if not enabled():
        return a @ x
    a = jnp.asarray(a, jnp.float64)
    x = jnp.asarray(x, jnp.float64)
    return _call("sgt_exact_dot_mv", _sds(a.shape[:-1]), a, x)


class ExactNamespace:
    """jnp proxy whose arctan2/linalg.norm/dot route through the exact kernels
    — handed to envs.kepler_math as its `xp` in parity mode."""

    class _Linalg:
        @staticmethod
        def norm(v, axis=None, keepdims=False):
            if axis in (None, -1) and not keepdims:
                return norm_last(jnp.asarray(v))
            if keepdims and axis == -1:
                return norm_last(jnp.asarray(v))[..., None]
            return jnp.linalg.norm(v, axis=axis, keepdims=keepdims)

    linalg = _Linalg()

    @staticmethod
    def arctan2(y, x):
        return atan2(y, x)

    @staticmethod
    def pow2(v):
        """v ** 2 via libm pow — numpy SCALAR ** 2 semantics (see
        envs.kepler_math._sq)."""
        return powf(v, 2)

    @staticmethod
    def dot(a, b):
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        if a.ndim >= 2 and b.ndim == a.ndim - 1:
            return dot_mv(a, b)
        return jnp.dot(a, b)

    def __getattr__(self, name):
        return getattr(jnp, name)


exact_xp = ExactNamespace()
