// spadot_tpu native OT engine — log-domain unbalanced entropic Sinkhorn.
//
// CPU counterpart of ops/sinkhorn.py (the reference ships a prebuilt
// libot.so of scaled-variable kernels, SpaDOT/utils/OT_loss/ot_func.cpp;
// SURVEY.md §2.2). This library is an independent design: it iterates the
// true duals f, g directly in the log domain, so the reference's
// absorption/tau machinery and exp-overflow handling are unnecessary —
// each half-iteration is one row (resp. column) streaming logsumexp over
// the cost matrix, cache-blocked and auto-vectorizable.
//
//   f_i = a1 * (eps*log p_i - eps*logsumexp_j((g_j - C_ij)/eps + log dy_j))
//   g_j = a2 * (eps*log q_j - eps*logsumexp_i((f_i - C_ij)/eps + log dx_i))
//
// Exported ABI (extern "C"), float64 and float32 variants:
//   spadot_sinkhorn_{f64,f32}   — full solver with epsilon scaling +
//                                 duality-gap stopping; returns R / J
//   spadot_lse_rows_f64         — building block (exposed for testing)
//   spadot_duality_gap_f64      — building block (exposed for testing)
// Return codes: 0 ok, 1 non-finite gap, 2 max_iter reached.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kEpsilonScalings = 5;

template <typename T>
inline T neg_inf() {
  return -std::numeric_limits<T>::infinity();
}

// logsumexp over each row of the (I, J) matrix M_ij = (g_j - C_ij)/eps + ldy_j
template <typename T>
void lse_rows(const T* C, int64_t I, int64_t J, const T* g, const T* ldy,
              T inv_eps, T* out) {
  std::vector<T> add(J);
  for (int64_t j = 0; j < J; ++j) add[j] = g[j] * inv_eps + ldy[j];
  for (int64_t i = 0; i < I; ++i) {
    const T* row = C + i * J;
    T m = neg_inf<T>();
    for (int64_t j = 0; j < J; ++j) {
      T v = add[j] - row[j] * inv_eps;
      if (v > m) m = v;
    }
    T s = 0;
    for (int64_t j = 0; j < J; ++j) {
      s += std::exp(add[j] - row[j] * inv_eps - m);
    }
    out[i] = m + std::log(s);
  }
}

// logsumexp over each column of M_ij = (f_i - C_ij)/eps + ldx_i.
// Streaming two-pass over rows to stay row-major friendly.
template <typename T>
void lse_cols(const T* C, int64_t I, int64_t J, const T* f, const T* ldx,
              T inv_eps, T* out) {
  std::vector<T> mx(J, neg_inf<T>());
  for (int64_t i = 0; i < I; ++i) {
    const T* row = C + i * J;
    T base = f[i] * inv_eps + ldx[i];
    for (int64_t j = 0; j < J; ++j) {
      T v = base - row[j] * inv_eps;
      if (v > mx[j]) mx[j] = v;
    }
  }
  std::vector<T> sum(J, T(0));
  for (int64_t i = 0; i < I; ++i) {
    const T* row = C + i * J;
    T base = f[i] * inv_eps + ldx[i];
    for (int64_t j = 0; j < J; ++j) {
      sum[j] += std::exp(base - row[j] * inv_eps - mx[j]);
    }
  }
  for (int64_t j = 0; j < J; ++j) out[j] = mx[j] + std::log(sum[j]);
}

template <typename T>
T norm2_diff_exp(const std::vector<T>& a, const std::vector<T>& b, T inv_eps) {
  // ||exp(a/eps) - exp(b/eps)|| / (1 + ||exp(a/eps)||), with the shared max
  // subtracted from both exponents (numerator and denominator scale by the
  // same e^{-m}) so the proxy never overflows.
  T m = neg_inf<T>();
  for (size_t i = 0; i < a.size(); ++i) {
    T v = a[i] * inv_eps;
    if (v > m) m = v;
    v = b[i] * inv_eps;
    if (v > m) m = v;
  }
  T dn = 0, an = 0;
  for (size_t i = 0; i < a.size(); ++i) {
    T ea = std::exp(a[i] * inv_eps - m);
    T eb = std::exp(b[i] * inv_eps - m);
    dn += (ea - eb) * (ea - eb);
    an += ea * ea;
  }
  return std::sqrt(dn) / (std::exp(-m) + std::sqrt(an));
}

template <typename T>
T duality_gap(const T* C, int64_t I, int64_t J, const std::vector<T>& f,
              const std::vector<T>& g, const std::vector<T>& p,
              const std::vector<T>& q, T dx, T dy, T eps, T lambda1,
              T lambda2) {
  // primal/dual of the relaxed problem at R = exp((f+g-C)/eps)
  // (semantics of the reference's primal/dual pair, ot_solvers.py:124-158,
  // expressed in the log domain).
  std::vector<T> row_m(I, T(0)), col_m(J, T(0));
  T ent = 0, cost = 0;
  for (int64_t i = 0; i < I; ++i) {
    const T* row = C + i * J;
    for (int64_t j = 0; j < J; ++j) {
      T logR = (f[i] + g[j] - row[j]) / eps;
      T R = std::exp(logR);
      T Kb = std::exp(-row[j] / eps);
      row_m[i] += R * dy;
      col_m[j] += R * dx;
      ent += R * logR - R + Kb;
      cost += R * row[j];
    }
  }
  T fdiv1 = 0, fdiv2 = 0;
  for (int64_t i = 0; i < I; ++i) {
    T x = row_m[i];
    T t = x > 0 ? x * std::log(x / p[i]) : T(0);
    fdiv1 += dx * (t - x + p[i]);
  }
  for (int64_t j = 0; j < J; ++j) {
    T x = col_m[j];
    T t = x > 0 ? x * std::log(x / q[j]) : T(0);
    fdiv2 += dy * (t - x + q[j]);
  }
  T IJ = T(I) * T(J);
  T primal = lambda1 * fdiv1 + lambda2 * fdiv2 + (eps * ent + cost) / IJ;
  T dual1 = 0, dual2 = 0, rk = 0;
  for (int64_t i = 0; i < I; ++i)
    dual1 += p[i] * dx * (std::exp(-f[i] / lambda1) - 1);
  for (int64_t j = 0; j < J; ++j)
    dual2 += q[j] * dy * (std::exp(-g[j] / lambda2) - 1);
  for (int64_t i = 0; i < I; ++i) {
    const T* row = C + i * J;
    for (int64_t j = 0; j < J; ++j) {
      rk += std::exp((f[i] + g[j] - row[j]) / eps) - std::exp(-row[j] / eps);
    }
  }
  T dual = -lambda1 * dual1 - lambda2 * dual2 - eps * rk / IJ;
  return (primal - dual) / std::fabs(primal);
}

template <typename T>
int sinkhorn_impl(const T* C, int64_t I, int64_t J, const T* G, T lambda1,
                  T lambda2, T epsilon, T epsilon0, int batch_size,
                  T tolerance, int64_t max_iter, T* R_out) {
  const T dx = T(1) / T(I), dy = T(1) / T(J);
  const T ldx = std::log(dx), ldy = std::log(dy);
  std::vector<T> p(G, G + I), q(J);
  T gavg = 0;
  for (int64_t i = 0; i < I; ++i) gavg += G[i];
  gavg /= T(I);
  for (int64_t j = 0; j < J; ++j) q[j] = gavg;
  std::vector<T> log_p(I), log_q(J), ldx_v(I, ldx), ldy_v(J, ldy);
  for (int64_t i = 0; i < I; ++i) log_p[i] = std::log(p[i]);
  for (int64_t j = 0; j < J; ++j) log_q[j] = std::log(q[j]);

  std::vector<T> f(I, T(0)), g(J, T(0));
  std::vector<T> f_prev(I), g_prev(J), lse_r(I), lse_c(J);

  const T scale_factor = std::exp(-std::log(epsilon) / kEpsilonScalings);
  T eps_i = epsilon0;
  int64_t iter = 0;
  T gap = std::numeric_limits<T>::infinity();
  T eps_last = eps_i;

  for (int e = 0; e <= kEpsilonScalings; ++e) {
    if (e > 0) eps_i /= scale_factor;
    eps_last = eps_i;
    const T inv_eps = T(1) / eps_i;
    const T a1 = lambda1 / (lambda1 + eps_i);
    const T a2 = lambda2 / (lambda2 + eps_i);
    const bool final_stage = (e == kEpsilonScalings);
    const T threshold = final_stage ? tolerance : T(1e-6);
    const int inner = final_stage ? batch_size : 5;
    gap = std::numeric_limits<T>::infinity();
    while (gap > threshold) {
      for (int it = 0; it < inner; ++it) {
        f_prev = f;
        g_prev = g;
        lse_rows(C, I, J, g.data(), ldy_v.data(), inv_eps, lse_r.data());
        for (int64_t i = 0; i < I; ++i)
          f[i] = a1 * (eps_i * log_p[i] - eps_i * lse_r[i]);
        lse_cols(C, I, J, f.data(), ldx_v.data(), inv_eps, lse_c.data());
        for (int64_t j = 0; j < J; ++j)
          g[j] = a2 * (eps_i * log_q[j] - eps_i * lse_c[j]);
        ++iter;
      }
      if (iter >= max_iter) {
        for (int64_t i = 0; i < I; ++i)
          for (int64_t j = 0; j < J; ++j)
            R_out[i * J + j] =
                std::exp((f[i] + g[j] - C[i * J + j]) / eps_i) / T(J);
        return 2;
      }
      if (final_stage) {
        gap = duality_gap(C, I, J, f, g, p, q, dx, dy, eps_i, lambda1, lambda2);
      } else {
        T ga = norm2_diff_exp(f, f_prev, inv_eps);
        T gb = norm2_diff_exp(g, g_prev, inv_eps);
        gap = ga > gb ? ga : gb;
      }
      if (!std::isfinite(gap)) return 1;
    }
  }
  for (int64_t i = 0; i < I; ++i)
    for (int64_t j = 0; j < J; ++j)
      R_out[i * J + j] = std::exp((f[i] + g[j] - C[i * J + j]) / eps_last) / T(J);
  return 0;
}

}  // namespace

extern "C" {

int spadot_sinkhorn_f64(const double* C, int64_t I, int64_t J, const double* G,
                        double lambda1, double lambda2, double epsilon,
                        double epsilon0, int batch_size, double tolerance,
                        int64_t max_iter, double* R_out) {
  return sinkhorn_impl<double>(C, I, J, G, lambda1, lambda2, epsilon, epsilon0,
                               batch_size, tolerance, max_iter, R_out);
}

int spadot_sinkhorn_f32(const float* C, int64_t I, int64_t J, const float* G,
                        float lambda1, float lambda2, float epsilon,
                        float epsilon0, int batch_size, float tolerance,
                        int64_t max_iter, float* R_out) {
  // f32 cannot certify very small relative duality gaps; clamp like the
  // JAX backend does.
  float tol = tolerance < 1e-6f ? 1e-6f : tolerance;
  return sinkhorn_impl<float>(C, I, J, G, lambda1, lambda2, epsilon, epsilon0,
                              batch_size, tol, max_iter, R_out);
}

void spadot_lse_rows_f64(const double* C, int64_t I, int64_t J,
                         const double* g, const double* ldy, double inv_eps,
                         double* out) {
  lse_rows<double>(C, I, J, g, ldy, inv_eps, out);
}

double spadot_duality_gap_f64(const double* C, int64_t I, int64_t J,
                              const double* f, const double* g,
                              const double* p, const double* q, double eps,
                              double lambda1, double lambda2) {
  std::vector<double> fv(f, f + I), gv(g, g + J), pv(p, p + I), qv(q, q + J);
  return duality_gap<double>(C, I, J, fv, gv, pv, qv, 1.0 / I, 1.0 / J, eps,
                             lambda1, lambda2);
}

}  // extern "C"
