// Native point-generation kernels for the collocation data layer.
//
// The reference's data layer is pure numpy + pyDOE on the host
// (/root/reference/PlateHoleQuarter/train/train.py:614-641,857-869); at the
// 1M+ point scale targeted by BASELINE.json config #3 the Python samplers
// become a startup bottleneck.  This library provides OpenMP-parallel
// equivalents consumed through ctypes (pinn_elastodynamics_tpu/geometry/
// native.py); the numpy implementations remain the reference semantics and
// the default fallback.
//
// RNG: splitmix64 + xoshiro256** (public-domain algorithms by Blackman &
// Vigna), seeded deterministically per (seed, dimension) so results are
// reproducible and independent across threads.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Xoshiro256ss {
  uint64_t s[4];

  explicit Xoshiro256ss(uint64_t seed) {
    // splitmix64 expansion of the seed.
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }

  static uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }

  uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }

  // Uniform double in [0, 1).
  double uniform() { return (next() >> 11) * 0x1.0p-53; }

  // Uniform integer in [0, bound) without modulo bias (Lemire).
  uint64_t bounded(uint64_t bound) {
    __uint128_t m = (__uint128_t)next() * bound;
    return (uint64_t)(m >> 64);
  }
};

}  // namespace

extern "C" {

// Latin hypercube sample on [0,1)^d: out is (n, d) row-major.  Each dimension
// gets an independent stratified permutation (same contract as
// geometry/sampling.py::lhs).
void pg_lhs(int64_t n, int32_t d, uint64_t seed, double* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int32_t j = 0; j < d; ++j) {
    Xoshiro256ss rng(seed * 0x9e3779b97f4a7c15ULL + (uint64_t)j + 1);
    // Fisher-Yates permutation of strata.
    std::int64_t* perm = new std::int64_t[n];
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    for (int64_t i = n - 1; i > 0; --i) {
      int64_t k = (int64_t)rng.bounded((uint64_t)(i + 1));
      std::swap(perm[i], perm[k]);
    }
    for (int64_t i = 0; i < n; ++i) {
      out[i * d + j] = (perm[i] + rng.uniform()) / (double)n;
    }
    delete[] perm;
  }
}

// Affine map u in [0,1)^d -> lb + (ub-lb)*u, in place on (n, d).
void pg_scale_box(int64_t n, int32_t d, const double* lb, const double* ub,
                  double* pts) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t j = 0; j < d; ++j) {
      pts[i * d + j] = lb[j] + (ub[j] - lb[j]) * pts[i * d + j];
    }
  }
}

// Mark points outside a disk: keep[i] = 1 if dist((x,y),(xc,yc)) {>|>=} r.
// Returns the number kept.  Matches sampling.py::exclude_disk.
int64_t pg_disk_keep_mask(int64_t n, int32_t d, const double* pts, double xc,
                          double yc, double r, int32_t strict, uint8_t* keep) {
  int64_t count = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static) reduction(+ : count)
#endif
  for (int64_t i = 0; i < n; ++i) {
    double dx = pts[i * d + 0] - xc;
    double dy = pts[i * d + 1] - yc;
    double dist = std::sqrt(dx * dx + dy * dy);
    uint8_t k = strict ? (dist > r) : (dist >= r);
    keep[i] = k;
    count += k;
  }
  return count;
}

// Plate-hole analytic distance targets (geometry/distance.py::
// plate_hole_distance; reference train.py:643-656): in (n,3) xyt ->
// out (n,5) [d_u, d_v, d_s11, d_s22, d_s12].
void pg_plate_hole_distance(int64_t n, const double* xyt, double* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    double x = xyt[i * 3 + 0], y = xyt[i * 3 + 1], t = xyt[i * 3 + 2];
    out[i * 5 + 0] = std::min(t, x);
    out[i * 5 + 1] = std::min(t, y);
    out[i * 5 + 2] = std::min(t, 0.5 - x);
    out[i * 5 + 3] = std::min(t, 0.5 - y);
    out[i * 5 + 4] =
        std::min({t, y, 0.5 - y, x, 0.5 - x});
  }
}

// Cartesian product of (n_xy, d_xy) spatial points with n_t time stations,
// time-major ordering (sampling.py::cross_time): out is (n_xy*n_t, d_xy+1).
void pg_cross_time(int64_t n_xy, int32_t d_xy, const double* xy, int64_t n_t,
                   const double* t, double* out) {
  const int32_t d = d_xy + 1;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static) collapse(2)
#endif
  for (int64_t k = 0; k < n_t; ++k) {
    for (int64_t i = 0; i < n_xy; ++i) {
      double* row = out + (k * n_xy + i) * d;
      std::memcpy(row, xy + i * d_xy, sizeof(double) * d_xy);
      row[d_xy] = t[k];
    }
  }
}

int32_t pg_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
