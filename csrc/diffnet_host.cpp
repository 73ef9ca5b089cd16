// diffnet_tpu native host-side preprocessing kernels.
//
// The TPU compute path is JAX/XLA (see diffnet_tpu/core, diffnet_tpu/ops);
// this library accelerates the HOST side of the data pipeline — the work the
// reference does in Python loops at dataset-construction time:
//
//   * Karhunen-Loeve diffusivity-field synthesis (reference
//     DiffNet/gen_input_calc.py:74-181; consumed by
//     DiffNet/datasets/parametric/klsum.py:11-45, which tqdm-loops over up
//     to 65536 Sobol samples at load time),
//   * generalized winding numbers of grid nodes vs oriented point clouds
//     (reference examples/poisson/parametric/IBN_2D.py:89-104) for dataset
//     precomputation / host-side occupancy queries.
//
// Exact same math as the Python implementations in
// diffnet_tpu/data/gen_input.py and diffnet_tpu/core/geometry.py — pinned
// by tests/test_native.py. Eigenfrequency solves (scipy brentq) stay in
// Python; omegas are passed in.
//
// Build: g++ -O3 -fopenmp -shared -fPIC (driven by diffnet_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// nu[b, i, j] = exp( sum_t coeffs[b, t] * fy_t(y_i) * fx_t(x_j) )
// with f_t(c) = sqrt(lam_t) * (eta * w_t * cos(w_t c) + sin(w_t c)),
// lam_t = 2 * eta / (1 + (eta * w_t)^2), x/y = linspace(0, 1, n).
// Mirrors gen_input.construct_KL_sum_2D / generate_diffusivity_tensor.
void dn_kl_diffusivity_2d(const double* omega,   // [n_terms]
                          double eta,
                          const double* coeffs,  // [B, n_terms]
                          int64_t B, int64_t n, int64_t n_terms,
                          float* out /* [B, n, n] */) {
  if (n_terms > 16) {
    // row buffer bound below; callers pass <= 6. NaN-fill so a direct
    // ctypes caller sees a loud failure, not uninitialized garbage
    // (ADVICE r2); utils/native.py also asserts before the call.
    const float nan = std::numeric_limits<float>::quiet_NaN();
    std::fill(out, out + (size_t)B * n * n, nan);
    return;
  }
  std::vector<double> fx((size_t)n_terms * n);
  for (int64_t t = 0; t < n_terms; ++t) {
    const double w = omega[t];
    const double lam = 2.0 * eta / (1.0 + (eta * w) * (eta * w));
    const double s = std::sqrt(lam);
    for (int64_t j = 0; j < n; ++j) {
      const double c = (n > 1) ? (double)j / (double)(n - 1) : 0.0;
      fx[(size_t)t * n + j] =
          s * (eta * w * std::cos(w * c) + std::sin(w * c));
    }
  }
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t i = 0; i < n; ++i) {
      // row factor per term: coeffs[b,t] * f_t(y_i)  (x and y share the grid)
      double row[16];
      for (int64_t t = 0; t < n_terms; ++t)
        row[t] = coeffs[b * n_terms + t] * fx[(size_t)t * n + i];
      float* o = out + ((size_t)b * n + i) * n;
      for (int64_t j = 0; j < n; ++j) {
        double acc = 0.0;
        for (int64_t t = 0; t < n_terms; ++t)
          acc += row[t] * fx[(size_t)t * n + j];
        o[j] = (float)std::exp(acc);
      }
    }
  }
}

// w[b, q] = sum_p area[b,p] * dot(p_bp - q, n_bp) / (2 pi (|p_bp - q|^2 + eps))
// Mirrors core/geometry.winding_number_2d (float32, eps = 1e-8).
void dn_winding_2d(const float* pts,   // [B, P, 2]
                   const float* nrm,   // [B, P, 2]
                   const float* area,  // [B, P]
                   int64_t B, int64_t P,
                   const float* q,     // [Q, 2]
                   int64_t Q,
                   float* out /* [B, Q] */) {
  const float inv2pi = (float)(1.0 / (2.0 * M_PI));
  const float eps = 1e-8f;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t iq = 0; iq < Q; ++iq) {
      const float qx = q[iq * 2], qy = q[iq * 2 + 1];
      const float* p = pts + (size_t)b * P * 2;
      const float* nn = nrm + (size_t)b * P * 2;
      const float* a = area + (size_t)b * P;
      float acc = 0.0f;
      for (int64_t ip = 0; ip < P; ++ip) {
        const float dx = p[ip * 2] - qx, dy = p[ip * 2 + 1] - qy;
        const float dot = dx * nn[ip * 2] + dy * nn[ip * 2 + 1];
        const float r2 = dx * dx + dy * dy;
        acc += a[ip] * dot / (r2 + eps);
      }
      out[(size_t)b * Q + iq] = acc * inv2pi;
    }
  }
}

// 3D: w = sum_p area * dot / (4 pi (|d|^2 + eps)^{3/2})
// Mirrors core/geometry.winding_number_3d.
void dn_winding_3d(const float* pts, const float* nrm, const float* area,
                   int64_t B, int64_t P, const float* q, int64_t Q,
                   float* out) {
  const float inv4pi = (float)(1.0 / (4.0 * M_PI));
  const float eps = 1e-8f;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t iq = 0; iq < Q; ++iq) {
      const float qx = q[iq * 3], qy = q[iq * 3 + 1], qz = q[iq * 3 + 2];
      const float* p = pts + (size_t)b * P * 3;
      const float* nn = nrm + (size_t)b * P * 3;
      const float* a = area + (size_t)b * P;
      float acc = 0.0f;
      for (int64_t ip = 0; ip < P; ++ip) {
        const float dx = p[ip * 3] - qx;
        const float dy = p[ip * 3 + 1] - qy;
        const float dz = p[ip * 3 + 2] - qz;
        const float dot =
            dx * nn[ip * 3] + dy * nn[ip * 3 + 1] + dz * nn[ip * 3 + 2];
        const float r2 = dx * dx + dy * dy + dz * dz + eps;
        acc += a[ip] * dot / (r2 * std::sqrt(r2));
      }
      out[(size_t)b * Q + iq] = acc * inv4pi;
    }
  }
}

// Batched sample gather: out[i, :] = src[idx[i], :] for row-major
// contiguous sample stores (the loader's batch-assembly hot path —
// replaces a Python per-item __getitem__ loop + np.stack; the reference
// delegates this to torch DataLoader worker processes, base.py:18).
// Rows are raw bytes (row_bytes = per-sample nbytes), so every dtype and
// trailing shape is one memcpy per sample, OpenMP-parallel over the batch.
void dn_gather_rows(const char* src, const int64_t* idx, int64_t n_idx,
                    int64_t row_bytes, char* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(out + (size_t)i * row_bytes,
                src + (size_t)idx[i] * row_bytes, (size_t)row_bytes);
  }
}

int dn_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
