// Monotonic Alignment Search — native host kernel (C++ / OpenMP).
//
// Host-side counterpart of the Pallas TPU kernel for CPU pipelines and
// parity testing. Behavioural equivalent of the reference's Cython kernel
// (matcha/utils/monotonic_align/core.pyx:11-47): a banded Viterbi forward
// pass over the (text x mel-frame) grid followed by an argmax backtrack,
// parallelised over the batch with OpenMP.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC mas.cpp -o libmas.so

#include <algorithm>
#include <cstdint>

namespace {

constexpr float kMaxNeg = -1e9f;

// In-place DP + backtrack for one (t_x, t_y) problem.
// `value` is the masked log-prior, row-major (T_x, t_y_stride); it is
// overwritten with accumulated path scores. `path` receives 0/1.
void maximum_path_each(int32_t* path, float* value, int t_x, int t_y,
                       int64_t x_stride) {
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      const float v_cur = (x == y) ? kMaxNeg : value[x * x_stride + (y - 1)];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.f : kMaxNeg;
      } else {
        v_prev = value[(x - 1) * x_stride + (y - 1)];
      }
      value[x * x_stride + y] += std::max(v_cur, v_prev);
    }
  }

  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * x_stride + y] = 1;
    if (index != 0 && y > 0 &&
        (index == y ||
         value[index * x_stride + (y - 1)] < value[(index - 1) * x_stride + (y - 1)])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// Batched entry point.
//   paths:  (B, T_x, T_y) int32, zero-initialised by the caller.
//   values: (B, T_x, T_y) float32 masked log-prior (overwritten).
//   t_xs/t_ys: (B,) int32 true lengths.
void maximum_path_c(int32_t* paths, float* values, const int32_t* t_xs,
                    const int32_t* t_ys, int32_t batch, int64_t max_t_x,
                    int64_t max_t_y) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < batch; ++b) {
    maximum_path_each(paths + b * max_t_x * max_t_y,
                      values + b * max_t_x * max_t_y, t_xs[b], t_ys[b],
                      max_t_y);
  }
}

}  // extern "C"
