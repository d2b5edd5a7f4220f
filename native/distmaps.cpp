// Native click distance transform for the interactive-segmentation host
// path (the CPU analog of ops/distmaps.py; replaces the reference's
// Cython BFS, fbrs/utils/cython/_get_dist_maps.pyx — see SURVEY.md §2.9).
//
// Produces (2, H, W) float32 normalized SQUARED euclidean distances:
// layer 0 = min over the first n/2 (positive) clicks, layer 1 = min over
// the rest. Cells unreachable from any click hold 1e6.
//
// Two strategies, chosen by click count:
//   * exact dense sweep, O(H*W*N) — vectorizable, fastest for the
//     interactive regime (N <= ~64 clicks);
//   * multi-source Dijkstra-flavored BFS carrying click origins,
//     O(H*W * small-constant) — for very large click sets. Unlike a
//     plain grid BFS this yields true euclidean distances because each
//     queue node remembers which click it came from.
//
// Built as a plain shared library (no pybind11); Python binds via
// ctypes (mivos_tpu/ops/native_distmaps.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Node {
  int32_t row, col;
  int32_t orig_row, orig_col;
  int32_t layer;
};

constexpr float kFar = 1e6f;

void dense_sweep(const float* points, int n_points, int height, int width,
                 float inv_norm, float* out) {
  const int hw = height * width;
  for (int i = 0; i < n_points; ++i) {
    // Round to integer pixel origins like the reference Cython BFS
    // (_get_dist_maps.pyx casts coords to int) and this file's own
    // multi_source_bfs path — keeps both strategies and the reference
    // bitwise-consistent for sub-pixel click coordinates.
    const float py = static_cast<float>(std::lround(points[2 * i]));
    const float px = static_cast<float>(std::lround(points[2 * i + 1]));
    if (py < 0 || px < 0) continue;
    float* layer = out + (i >= n_points / 2 ? hw : 0);
    for (int r = 0; r < height; ++r) {
      const float dy = (static_cast<float>(r) - py) * inv_norm;
      const float dy2 = dy * dy;
      float* row_out = layer + r * width;
      for (int c = 0; c < width; ++c) {
        const float dx = (static_cast<float>(c) - px) * inv_norm;
        const float d = dy2 + dx * dx;
        if (d < row_out[c]) row_out[c] = d;
      }
    }
  }
}

void multi_source_bfs(const float* points, int n_points, int height,
                      int width, float inv_norm, float* out) {
  const int hw = height * width;
  std::vector<Node> queue;
  queue.reserve(4 * hw + n_points);
  for (int i = 0; i < n_points; ++i) {
    const int r = static_cast<int>(std::lround(points[2 * i]));
    const int c = static_cast<int>(std::lround(points[2 * i + 1]));
    if (r < 0 || c < 0 || r >= height || c >= width) continue;
    const int layer = (i >= n_points / 2) ? 1 : 0;
    out[layer * hw + r * width + c] = 0.0f;
    queue.push_back(Node{r, c, r, c, layer});
  }
  static const int kD[8] = {-1, 0, 0, -1, 0, 1, 1, 0};
  for (size_t head = 0; head < queue.size(); ++head) {
    const Node v = queue[head];  // copy: queue may reallocate
    float* layer = out + v.layer * hw;
    for (int k = 0; k < 4; ++k) {
      const int r = v.row + kD[2 * k];
      const int c = v.col + kD[2 * k + 1];
      if (r < 0 || c < 0 || r >= height || c >= width) continue;
      const float dy = static_cast<float>(r - v.orig_row) * inv_norm;
      const float dx = static_cast<float>(c - v.orig_col) * inv_norm;
      const float d = dy * dy + dx * dx;
      float& cell = layer[r * width + c];
      if (d < cell) {
        cell = d;
        queue.push_back(Node{r, c, v.orig_row, v.orig_col, v.layer});
      }
    }
  }
}

}  // namespace

extern "C" {

// points: (n_points, 2) float32 rows of (y, x); first half positive
// clicks, second half negative; coords < 0 mark padding.
// out: caller-allocated (2, height, width) float32.
void mivos_get_dist_maps(const float* points, int n_points, int height,
                         int width, float norm_delimiter, float* out) {
  const int hw = height * width;
  for (int i = 0; i < 2 * hw; ++i) out[i] = kFar;
  if (n_points <= 0) return;
  const float inv_norm = 1.0f / norm_delimiter;
  if (n_points <= 64) {
    dense_sweep(points, n_points, height, width, inv_norm, out);
  } else {
    multi_source_bfs(points, n_points, height, width, inv_norm, out);
  }
}

int mivos_native_abi_version() { return 1; }

}  // extern "C"
