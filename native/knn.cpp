// Grid-hash k-nearest-neighbor mean distances for Gaussian-splat
// initialization.
//
// Role: the reference pipeline's scene init (Nerfstudio splatfacto)
// seeds Gaussian scales from each SfM point's mean distance to its 3
// nearest neighbors; the pure-numpy fallback in core/types.py is
// O(N^2) and unusable at the 0.5M-3M point scales of BASELINE.md.
// This is the native data-path component (uniform grid hash, expanding
// ring search, OpenMP across points), exposed to Python via ctypes
// (robosimgs_tpu/native).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Grid {
  float origin[3];
  float cell;          // cell edge length
  int dims[3];
  std::vector<int32_t> starts;  // per-cell start into `order` (size ncells+1)
  std::vector<int32_t> order;   // point indices sorted by cell

  inline int64_t cell_index(int cx, int cy, int cz) const {
    return (static_cast<int64_t>(cz) * dims[1] + cy) * dims[0] + cx;
  }
  inline void locate(const float* p, int* c) const {
    for (int d = 0; d < 3; ++d) {
      int v = static_cast<int>((p[d] - origin[d]) / cell);
      c[d] = std::min(std::max(v, 0), dims[d] - 1);
    }
  }
};

Grid build_grid(const float* pts, int64_t n, int k) {
  Grid g;
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[i * 3 + d]);
      hi[d] = std::max(hi[d], pts[i * 3 + d]);
    }
  }
  float ext[3];
  double vol = 1.0;
  for (int d = 0; d < 3; ++d) {
    ext[d] = std::max(hi[d] - lo[d], 1e-6f);
    vol *= ext[d];
  }
  // target ~ 2-8 points per cell
  double target_cells = std::max(1.0, static_cast<double>(n) / 4.0);
  float cell = static_cast<float>(std::cbrt(vol / target_cells));
  cell = std::max(cell, 1e-6f);
  for (int d = 0; d < 3; ++d) {
    g.origin[d] = lo[d];
    g.dims[d] = std::max(1, static_cast<int>(std::ceil(ext[d] / cell)));
    // cap the grid so degenerate (planar/linear) clouds don't explode
    g.dims[d] = std::min(g.dims[d], 1 << 10);
  }
  // recompute cell so the capped grid still covers the bbox
  for (int d = 0; d < 3; ++d)
    cell = std::max(cell, ext[d] / g.dims[d] + 1e-7f);
  g.cell = cell;

  int64_t ncells = static_cast<int64_t>(g.dims[0]) * g.dims[1] * g.dims[2];
  std::vector<int32_t> counts(ncells + 1, 0);
  std::vector<int64_t> cell_of(n);
  for (int64_t i = 0; i < n; ++i) {
    int c[3];
    g.locate(pts + i * 3, c);
    cell_of[i] = g.cell_index(c[0], c[1], c[2]);
    counts[cell_of[i] + 1]++;
  }
  g.starts.resize(ncells + 1);
  g.starts[0] = 0;
  for (int64_t c = 0; c < ncells; ++c) g.starts[c + 1] = g.starts[c] + counts[c + 1];
  g.order.resize(n);
  std::vector<int32_t> cursor(g.starts.begin(), g.starts.end() - 1);
  for (int64_t i = 0; i < n; ++i) g.order[cursor[cell_of[i]]++] = static_cast<int32_t>(i);
  return g;
}

}  // namespace

extern "C" {

// out[i] = mean distance from point i to its k nearest neighbors
// (excluding itself). pts is (n, 3) float32 row-major.
void knn_mean_dist(const float* pts, int64_t n, int k, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.01f;
    return;
  }
  int kk = std::min<int64_t>(k, n - 1);
  Grid g = build_grid(pts, n, kk);

#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * 3;
    int c[3];
    g.locate(p, c);
    // best-k distances (squared), small insertion heap
    std::vector<float> best(kk, 3.4e38f);
    int found = 0;
    for (int ring = 0;; ++ring) {
      // ring of cells at Chebyshev distance `ring`
      int x0 = std::max(c[0] - ring, 0), x1 = std::min(c[0] + ring, g.dims[0] - 1);
      int y0 = std::max(c[1] - ring, 0), y1 = std::min(c[1] + ring, g.dims[1] - 1);
      int z0 = std::max(c[2] - ring, 0), z1 = std::min(c[2] + ring, g.dims[2] - 1);
      for (int z = z0; z <= z1; ++z)
        for (int y = y0; y <= y1; ++y)
          for (int x = x0; x <= x1; ++x) {
            if (ring > 0 && std::max({std::abs(x - c[0]), std::abs(y - c[1]),
                                      std::abs(z - c[2])}) != ring)
              continue;  // interior cells were visited in earlier rings
            int64_t ci = g.cell_index(x, y, z);
            for (int32_t s = g.starts[ci]; s < g.starts[ci + 1]; ++s) {
              int32_t j = g.order[s];
              if (j == i) continue;
              const float* q = pts + static_cast<int64_t>(j) * 3;
              float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < best[kk - 1]) {
                // insertion into the sorted best-k array
                int pos = kk - 1;
                while (pos > 0 && best[pos - 1] > d2) {
                  best[pos] = best[pos - 1];
                  --pos;
                }
                best[pos] = d2;
                if (found < kk) ++found;
              }
            }
          }
      // stop when the k-th best is closer than the guaranteed-covered
      // radius (ring * cell), or the whole grid is exhausted
      bool covered_all =
          x0 == 0 && y0 == 0 && z0 == 0 && x1 == g.dims[0] - 1 &&
          y1 == g.dims[1] - 1 && z1 == g.dims[2] - 1;
      float safe_r = static_cast<float>(ring) * g.cell;
      if ((found >= kk && best[kk - 1] <= safe_r * safe_r) || covered_all) break;
    }
    double acc = 0.0;
    int m = std::max(found, 1);
    for (int t = 0; t < m; ++t) acc += std::sqrt(std::max(best[t], 1e-24f));
    out[i] = static_cast<float>(std::max(acc / m, 1e-7));
  }
}

}  // extern "C"
