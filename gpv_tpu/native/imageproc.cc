// Native image preprocessing: threaded batch bilinear resize for the host
// input pipeline.
//
// Role: the reference burns 30 dataloader workers on skimage resize per
// image (datasets/coco_generic_dataset.py:61, train_distr.py:213-222).
// Here the host-side hot path (decode -> resize to the fixed 480x640) is a
// compact C++ kernel with an OpenMP-style thread pool, called through
// ctypes from gpv_tpu/datasets; normalization happens on device in XLA.
//
// Exposed C ABI:
//   resize_bilinear_u8(src, H, W, C, dst, out_h, out_w)
//   resize_bilinear_u8_batch(srcs*, Hs, Ws, C, dst, out_h, out_w, n, threads)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline void resize_one(const uint8_t* src, int H, int W, int C, uint8_t* dst,
                       int out_h, int out_w) {
  // PIL-style bilinear with half-pixel centers.
  const float sy = static_cast<float>(H) / out_h;
  const float sx = static_cast<float>(W) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(H - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, H - 1);
    float wy = fy - y0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(W - 1)));
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, W - 1);
      float wx = fx - x0;
      for (int c = 0; c < C; ++c) {
        float v00 = src[(y0 * W + x0) * C + c];
        float v01 = src[(y0 * W + x1) * C + c];
        float v10 = src[(y1 * W + x0) * C + c];
        float v11 = src[(y1 * W + x1) * C + c];
        float top = v00 + wx * (v01 - v00);
        float bot = v10 + wx * (v11 - v10);
        float val = top + wy * (bot - top);
        dst[(oy * out_w + ox) * C + c] =
            static_cast<uint8_t>(val + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

void resize_bilinear_u8(const uint8_t* src, int H, int W, int C,
                        uint8_t* dst, int out_h, int out_w) {
  resize_one(src, H, W, C, dst, out_h, out_w);
}

// srcs: array of n pointers; Hs/Ws per-image dims; dst: contiguous
// (n, out_h, out_w, C).
void resize_bilinear_u8_batch(const uint8_t** srcs, const int* Hs,
                              const int* Ws, int C, uint8_t* dst,
                              int out_h, int out_w, int n, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      resize_one(srcs[i], Hs[i], Ws[i], C,
                 dst + static_cast<size_t>(i) * out_h * out_w * C,
                 out_h, out_w);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < std::min(threads, n); ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
