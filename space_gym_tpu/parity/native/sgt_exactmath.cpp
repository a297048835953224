// Exact-math XLA FFI custom calls for the DEVICE parity tier.
//
// Role: the device engine's parity mode (SGT_EXACT_MATH=1, CPU backend,
// XLA fusion pass disabled) must reproduce the reference's numpy arithmetic
// bit-for-bit.  Three op families cannot be matched from XLA-generated code:
//
//  * np.dot / np.linalg.norm bottom out in the OpenBLAS bundled with numpy,
//    whose FMA kernels have implementation-specific accumulation orders.
//    Like ../native/sgt_native.cpp, we dlopen THE SAME shared object
//    (numpy.libs/libscipy_openblas64_*.so) and issue the cblas calls with the
//    strides numpy's dispatch would use.  Fallbacks (sequential FMA) agree to
//    <= 1 ulp when the library is absent.
//  * pow: scipy's step controller computes error_norm ** -0.2 through libm
//    pow (numpy npy_pow has no shortcut for non-integer exponents); XLA's
//    pow lowering differs by 1 ulp on ~6% of inputs.
//  * atan2: glibc atan2 (numpy) vs XLA's atan2 differ by 1 ulp on ~8%.
//
// Each handler is shape-polymorphic over leading batch dimensions so the
// same target works under vmap (jax vmap_method="broadcast_all").
//
// Reference use sites: scipy RK45 controller/stage math as invoked by
// gym_space/dynamic_model.py:94-125; obs lidar atan2/norm
// (gym_space/envs/spaceship_env.py:133-140); Kepler orbit math norms/rotate
// (gym_space/envs/kepler.py:43-109).

#include <cmath>
#include <cstdint>
#include <dlfcn.h>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

typedef long long bint;  // ILP64 BLAS integer
typedef void (*dgemv_t)(int, int, bint, bint, double, const double*, bint,
                        const double*, bint, double, double*, bint);
typedef double (*ddot_t)(bint, const double*, bint, const double*, bint);
typedef float (*sdot_t)(bint, const float*, bint, const float*, bint);
typedef void (*dgemm_t)(int, int, int, bint, bint, bint, double, const double*,
                        bint, const double*, bint, double, double*, bint);

dgemv_t cblas_gemv = nullptr;
ddot_t cblas_dot = nullptr;
sdot_t cblas_sdot = nullptr;
dgemm_t cblas_gemm = nullptr;

constexpr int ColMajor = 102, RowMajor = 101, NoTrans = 111, Trans = 112;

// Dormand-Prince coefficient vectors for the staged combinations
// (published constants, identical to scipy rk.RK45.{A,B,E,P}).
const double DP_A1[1] = {1.0 / 5};
const double DP_A2[2] = {3.0 / 40, 9.0 / 40};
const double DP_A3[3] = {44.0 / 45, -56.0 / 15, 32.0 / 9};
const double DP_A4[4] = {19372.0 / 6561, -25360.0 / 2187, 64448.0 / 6561, -212.0 / 729};
const double DP_A5[5] = {9017.0 / 3168, -355.0 / 33, 46732.0 / 5247, 49.0 / 176,
                         -5103.0 / 18656};
const double DP_B[6] = {35.0 / 384, 0, 500.0 / 1113, 125.0 / 192, -2187.0 / 6784,
                        11.0 / 84};
const double DP_E[7] = {-71.0 / 57600, 0, 71.0 / 16695, -71.0 / 1920,
                        17253.0 / 339200, -22.0 / 525, 1.0 / 40};
const double DP_P[7][4] = {
    {1, -8048581381.0 / 2820520608, 8663915743.0 / 2820520608, -12715105075.0 / 11282082432},
    {0, 0, 0, 0},
    {0, 131558114200.0 / 32700410799, -68118460800.0 / 10900136933, 87487479700.0 / 32700410799},
    {0, -1754552775.0 / 470086768, 14199869525.0 / 1410260304, -10690763975.0 / 1880347072},
    {0, 127303824393.0 / 49829197408, -318862633887.0 / 49829197408, 701980252875.0 / 199316789632},
    {0, -282668133.0 / 205662961, 2019193451.0 / 616988883, -1453857185.0 / 822651844},
    {0, 40617522.0 / 29380423, -110615467.0 / 29380423, 69997945.0 / 29380423},
};

const double* dp_coeffs(std::int64_t which, int* len) {
  switch (which) {
    case 1: *len = 1; return DP_A1;
    case 2: *len = 2; return DP_A2;
    case 3: *len = 3; return DP_A3;
    case 4: *len = 4; return DP_A4;
    case 5: *len = 5; return DP_A5;
    case 6: *len = 6; return DP_B;
    default: *len = 7; return DP_E;
  }
}

inline double dotv(const double* x, const double* y, bint n) {
  if (cblas_dot) return cblas_dot(n, x, 1, y, 1);
  double a = 0.0;
  for (bint j = 0; j < n; ++j) a = std::fma(x[j], y[j], a);
  return a;
}

inline float dotv_f32(const float* x, const float* y, bint n) {
  if (cblas_sdot) return cblas_sdot(n, x, 1, y, 1);
  float a = 0.0f;
  for (bint j = 0; j < n; ++j) a = std::fma(x[j], y[j], a);
  return a;
}

using F64Buf = ffi::Buffer<ffi::DataType::F64>;
using F32Buf = ffi::Buffer<ffi::DataType::F32>;
using F64Ret = ffi::ResultBuffer<ffi::DataType::F64>;
using F32Ret = ffi::ResultBuffer<ffi::DataType::F32>;

// ---- elementwise libm ----

ffi::Error PowImpl(F64Buf x, double e, F64Ret out) {
  const double* xd = x.typed_data();
  double* od = out->typed_data();
  for (std::int64_t i = 0; i < x.element_count(); ++i) od[i] = std::pow(xd[i], e);
  return ffi::Error::Success();
}

ffi::Error Atan2Impl(F64Buf y, F64Buf x, F64Ret out) {
  const double* yd = y.typed_data();
  const double* xd = x.typed_data();
  double* od = out->typed_data();
  for (std::int64_t i = 0; i < y.element_count(); ++i) od[i] = std::atan2(yd[i], xd[i]);
  return ffi::Error::Success();
}

// ---- np.linalg.norm over the trailing axis: sqrt(ddot(x, x)) ----

ffi::Error NormLastImpl(F64Buf x, F64Ret out) {
  auto dims = x.dimensions();
  bint n = dims.size() ? dims.back() : 1;
  std::int64_t count = n ? x.element_count() / n : 0;
  const double* xd = x.typed_data();
  double* od = out->typed_data();
  for (std::int64_t i = 0; i < count; ++i)
    od[i] = std::sqrt(dotv(xd + i * n, xd + i * n, n));
  return ffi::Error::Success();
}

ffi::Error NormLastF32Impl(F32Buf x, F32Ret out) {
  auto dims = x.dimensions();
  bint n = dims.size() ? dims.back() : 1;
  std::int64_t count = n ? x.element_count() / n : 0;
  const float* xd = x.typed_data();
  float* od = out->typed_data();
  for (std::int64_t i = 0; i < count; ++i)
    od[i] = std::sqrt(dotv_f32(xd + i * n, xd + i * n, n));
  return ffi::Error::Success();
}

// ---- np.dot(K[:s].T, coeffs): K (..., s, 6) row-major, coeffs baked by
// `which` (1..5 = DP_A row, 6 = DP_B, 7 = DP_E).  Matches the cblas call
// numpy dispatches for a (6, s) F-contiguous view: ColMajor NoTrans. ----

ffi::Error KtDotImpl(F64Buf k, std::int64_t which, F64Ret out) {
  int s;
  const double* c = dp_coeffs(which, &s);
  auto dims = k.dimensions();
  bint ncols = dims.back();  // 6 state components
  std::int64_t rows = dims[dims.size() - 2];
  std::int64_t per = rows * ncols;
  std::int64_t count = k.element_count() / per;
  const double* kd = k.typed_data();
  double* od = out->typed_data();
  for (std::int64_t i = 0; i < count; ++i) {
    const double* K = kd + i * per;
    double* o = od + i * ncols;
    if (cblas_gemv) {
      cblas_gemv(ColMajor, NoTrans, ncols, s, 1.0, K, ncols, c, 1, 0.0, o, 1);
    } else {
      for (bint r = 0; r < ncols; ++r) {
        double a = 0.0;
        for (int j = 0; j < s; ++j) a = std::fma(K[j * ncols + r], c[j], a);
        o[r] = a;
      }
    }
  }
  return ffi::Error::Success();
}

// ---- Q = np.dot(K.T, P): K (..., 7, 6) -> Q (..., 6, 4).  Matches numpy's
// dgemm for the (6,7) F-contiguous K.T times C-contiguous P (RowMajor
// Trans x NoTrans, as probed bitwise in sgt_native.cpp). ----

ffi::Error KtPImpl(F64Buf k, F64Ret out) {
  auto dims = k.dimensions();
  bint ncols = dims.back();
  std::int64_t per = 7 * ncols;
  std::int64_t count = k.element_count() / per;
  const double* kd = k.typed_data();
  double* od = out->typed_data();
  for (std::int64_t i = 0; i < count; ++i) {
    const double* K = kd + i * per;
    double* Q = od + i * ncols * 4;
    if (cblas_gemm) {
      cblas_gemm(RowMajor, Trans, NoTrans, ncols, 4, 7, 1.0, K, ncols,
                 &DP_P[0][0], 4, 0.0, Q, 4);
    } else {
      for (bint r = 0; r < ncols; ++r)
        for (int m = 0; m < 4; ++m) {
          double a = 0.0;
          for (int j = 0; j < 7; ++j) a = std::fma(K[j * ncols + r], DP_P[j][m], a);
          Q[r * 4 + m] = a;
        }
    }
  }
  return ffi::Error::Success();
}

// ---- np.dot(A, x) for small row-major A (..., m, n) and x (..., n):
// numpy dispatches RowMajor NoTrans dgemv (dense-output Q @ p, Kepler's 2x2
// rotation matrix times position). ----

ffi::Error DotMvImpl(F64Buf a, F64Buf x, F64Ret out) {
  auto dims = a.dimensions();
  bint n = dims.back();
  bint m = dims[dims.size() - 2];
  std::int64_t per = m * n;
  std::int64_t count = a.element_count() / per;
  const double* ad = a.typed_data();
  const double* xd = x.typed_data();
  double* od = out->typed_data();
  for (std::int64_t i = 0; i < count; ++i) {
    const double* A = ad + i * per;
    const double* xv = xd + i * n;
    double* o = od + i * m;
    if (cblas_gemv) {
      cblas_gemv(RowMajor, NoTrans, m, n, 1.0, A, n, xv, 1, 0.0, o, 1);
    } else {
      for (bint r = 0; r < m; ++r) {
        double acc = 0.0;
        for (bint j = 0; j < n; ++j) acc = std::fma(A[r * n + j], xv[j], acc);
        o[r] = acc;
      }
    }
  }
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactPow, PowImpl,
                              ffi::Ffi::Bind()
                                  .Arg<F64Buf>()
                                  .Attr<double>("e")
                                  .Ret<F64Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactAtan2, Atan2Impl,
                              ffi::Ffi::Bind().Arg<F64Buf>().Arg<F64Buf>().Ret<F64Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactNormLast, NormLastImpl,
                              ffi::Ffi::Bind().Arg<F64Buf>().Ret<F64Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactNormLastF32, NormLastF32Impl,
                              ffi::Ffi::Bind().Arg<F32Buf>().Ret<F32Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactKtDot, KtDotImpl,
                              ffi::Ffi::Bind()
                                  .Arg<F64Buf>()
                                  .Attr<std::int64_t>("which")
                                  .Ret<F64Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactKtP, KtPImpl,
                              ffi::Ffi::Bind().Arg<F64Buf>().Ret<F64Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(SgtExactDotMv, DotMvImpl,
                              ffi::Ffi::Bind().Arg<F64Buf>().Arg<F64Buf>().Ret<F64Buf>());

extern "C" {

// Load numpy's bundled OpenBLAS for bit-exact dot/gemv/gemm; 0 on success.
int sgt_exact_init(const char* openblas_path) {
  void* h = dlopen(openblas_path, RTLD_NOW | RTLD_LOCAL);
  if (!h) return -1;
  cblas_gemv = reinterpret_cast<dgemv_t>(dlsym(h, "scipy_cblas_dgemv64_"));
  cblas_dot = reinterpret_cast<ddot_t>(dlsym(h, "scipy_cblas_ddot64_"));
  cblas_sdot = reinterpret_cast<sdot_t>(dlsym(h, "scipy_cblas_sdot64_"));
  cblas_gemm = reinterpret_cast<dgemm_t>(dlsym(h, "scipy_cblas_dgemm64_"));
  return (cblas_gemv && cblas_dot && cblas_gemm) ? 0 : -2;
}

int sgt_exact_has_blas(void) { return cblas_dot != nullptr; }

}  // extern "C"
