// Exponential-of-semicircle kernel spreading onto the torus grid.
//
// Host-native hot loop of the gridded adjoint synthesis (ops/nufft.py):
// each point scatters onto a w x w stencil with separable ES kernel
// weights.  This is the TPU-native framework's equivalent of the
// spreading stage inside ducc0's adjoint_synthesis_general
// (/root/reference/heracles/ducc.py:108-128) — pure C++ on the host,
// since a TPU elementwise scatter runs at ~0.3 GB/s.
//
// Layout contract (see nufft.spread_torus):
//  * theta/phi: npts f64 angles;
//  * values: (nrows, npts, ncomp) f64, ncomp = 1 (real) or 2 (complex
//    interleaved — a complex128 array viewed as f64);
//  * grid: (nrows, ntheta + w, nphi + w, ncomp) f64, wrap-PADDED — the
//    caller folds rows/cols >= ntheta/nphi back onto the start, which
//    is the torus wrap (no modulo in the inner loop);
//  * points are bucket-sorted by theta row first so the stencil's w
//    grid rows stay cache-resident across a bucket.
//
// Build: g++ -O3 -shared -fPIC (loaded via ctypes, ops/nufft.py).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline void es_weights(double u, int64_t j0, int w, double inv_halfw,
                       double beta, double *out) {
  // kappa(z) = exp(beta (sqrt(1-z^2) - 1)), z = (j0 + a - u) / (w/2)
  for (int a = 0; a < w; ++a) {
    double z = (static_cast<double>(j0 + a) - u) * inv_halfw;
    double t = 1.0 - z * z;
    out[a] = t > 0.0 ? std::exp(beta * (std::sqrt(t) - 1.0)) : 0.0;
  }
}

} // namespace

extern "C" {

void spread_es(int64_t npts, const double *theta, const double *phi,
               int64_t nrows, int64_t ncomp, const double *values,
               double *grid, int64_t ntheta, int64_t nphi, int32_t w,
               double beta) {
  const double ht = 2.0 * M_PI / static_cast<double>(ntheta);
  const double hp = 2.0 * M_PI / static_cast<double>(nphi);
  const double inv_ht = 1.0 / ht, inv_hp = 1.0 / hp;
  const double half_w = 0.5 * w, inv_halfw = 1.0 / half_w;
  const int64_t gphi = nphi + w;           // padded row length
  const int64_t grow = gphi * ncomp;       // f64 per padded grid row
  const int64_t gplane = (ntheta + w) * grow;

  // subgrid offsets and fractional positions, then a counting sort by
  // theta row: the stencil touches rows [jt0, jt0+w), and sorted
  // processing keeps those w rows (w * gphi * ncomp * 8 bytes) hot
  std::vector<double> ut(npts), up(npts);
  std::vector<int64_t> jt0(npts), jp0(npts);
  for (int64_t p = 0; p < npts; ++p) {
    double utp = theta[p] * inv_ht - 0.5; // grid nodes at (j + 1/2) ht
    double upp = phi[p] * inv_hp;         // grid nodes at k hp
    ut[p] = utp;
    up[p] = upp;
    int64_t t0 = static_cast<int64_t>(std::ceil(utp - half_w));
    int64_t p0 = static_cast<int64_t>(std::ceil(upp - half_w));
    // shift into [0, n): adjust the fractional position with the wrap
    // so the weight arguments are unchanged
    int64_t tw = t0 % ntheta;
    if (tw < 0) tw += ntheta;
    ut[p] += static_cast<double>(tw - t0);
    jt0[p] = tw;
    int64_t pw = p0 % nphi;
    if (pw < 0) pw += nphi;
    up[p] += static_cast<double>(pw - p0);
    jp0[p] = pw;
  }
  std::vector<int64_t> count(ntheta + 1, 0);
  for (int64_t p = 0; p < npts; ++p) count[jt0[p] + 1]++;
  for (int64_t r = 0; r < ntheta; ++r) count[r + 1] += count[r];
  // physically permute the per-point data into bucket order: the main
  // loop then streams, instead of paying ~6 cache misses per point for
  // indirect reads through the permutation
  std::vector<double> uts(npts), ups(npts), vs(npts * nrows * ncomp);
  std::vector<int64_t> jts(npts), jps(npts);
  {
    std::vector<int64_t> cursor(count.begin(), count.end() - 1);
    for (int64_t p = 0; p < npts; ++p) {
      const int64_t s = cursor[jt0[p]]++;
      uts[s] = ut[p];
      ups[s] = up[p];
      jts[s] = jt0[p];
      jps[s] = jp0[p];
      for (int64_t r = 0; r < nrows; ++r)
        for (int64_t c = 0; c < ncomp; ++c)
          vs[(s * nrows + r) * ncomp + c] = values[(r * npts + p) * ncomp + c];
    }
  }

  std::vector<double> wt(w), wp(w);
  for (int64_t s = 0; s < npts; ++s) {
    es_weights(uts[s], jts[s], w, inv_halfw, beta, wt.data());
    es_weights(ups[s], jps[s], w, inv_halfw, beta, wp.data());
    const int64_t cell = jts[s] * grow + jps[s] * ncomp;
    for (int64_t r = 0; r < nrows; ++r) {
      const double *v = &vs[(s * nrows + r) * ncomp];
      double *g0 = grid + r * gplane + cell;
      if (ncomp == 1) {
        const double v0 = v[0];
        for (int a = 0; a < w; ++a) {
          const double c = v0 * wt[a];
          double *g = g0 + a * grow;
          for (int b = 0; b < w; ++b) g[b] += c * wp[b];
        }
      } else {
        const double vre = v[0], vim = v[1];
        for (int a = 0; a < w; ++a) {
          const double cre = vre * wt[a], cim = vim * wt[a];
          double *g = g0 + a * grow;
          for (int b = 0; b < w; ++b) {
            g[2 * b] += cre * wp[b];
            g[2 * b + 1] += cim * wp[b];
          }
        }
      }
    }
  }
}

} // extern "C"
