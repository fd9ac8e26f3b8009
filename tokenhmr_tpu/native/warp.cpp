// Native host-side preprocessing kernel: fused affine crop-warp + color
// scale + normalize, multithreaded over a batch of boxes.
//
// Replaces the reference's cv2.warpAffine + python normalize loop
// (ref tokenhmr/lib/datasets/utils.py:348, 620-624) on the host path of the
// data pipeline, so dataloader workers spend their time in compiled code.
// Bilinear sampling with constant border, matching cv2.warpAffine
// (INTER_LINEAR) semantics in float arithmetic.
//
// C ABI only (consumed via ctypes); no pybind11 dependency.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxChannels = 4;

struct Affine {
  double a00, a01, a02, a10, a11, a12;
};

// invert a 2x3 affine (dst<-src mapping becomes src<-dst sampling map)
Affine invert(const Affine& m) {
  double det = m.a00 * m.a11 - m.a01 * m.a10;
  double id = det != 0.0 ? 1.0 / det : 0.0;
  Affine r;
  r.a00 = m.a11 * id;
  r.a01 = -m.a01 * id;
  r.a10 = -m.a10 * id;
  r.a11 = m.a00 * id;
  r.a02 = -(r.a00 * m.a02 + r.a01 * m.a12);
  r.a12 = -(r.a10 * m.a02 + r.a11 * m.a12);
  return r;
}

// One output row of bilinear warp + normalize, channels-last.
inline void warp_row_normalize(
    const uint8_t* src, int sh, int sw, int channels,
    const Affine& inv, int y, int dw,
    const float* color_scale, const float* mean, const float* inv_std,
    float* dst_row) {
  const double sx0 = inv.a01 * y + inv.a02;
  const double sy0 = inv.a11 * y + inv.a12;
  for (int x = 0; x < dw; ++x) {
    const double fx = inv.a00 * x + sx0;
    const double fy = inv.a10 * x + sy0;
    const int x0 = (int)std::floor(fx);
    const int y0 = (int)std::floor(fy);
    const float ax = (float)(fx - x0);
    const float ay = (float)(fy - y0);
    float px[kMaxChannels] = {0, 0, 0, 0};
    // gather 4 neighbors with constant(0) border
    const bool in00 = (unsigned)x0 < (unsigned)sw && (unsigned)y0 < (unsigned)sh;
    const bool in01 = (unsigned)(x0 + 1) < (unsigned)sw && (unsigned)y0 < (unsigned)sh;
    const bool in10 = (unsigned)x0 < (unsigned)sw && (unsigned)(y0 + 1) < (unsigned)sh;
    const bool in11 =
        (unsigned)(x0 + 1) < (unsigned)sw && (unsigned)(y0 + 1) < (unsigned)sh;
    const float w00 = (1 - ax) * (1 - ay);
    const float w01 = ax * (1 - ay);
    const float w10 = (1 - ax) * ay;
    const float w11 = ax * ay;
    const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * channels;
    const uint8_t* p01 = p00 + channels;
    const uint8_t* p10 = p00 + (size_t)sw * channels;
    const uint8_t* p11 = p10 + channels;
    for (int c = 0; c < channels; ++c) {
      float v = 0.f;
      if (in00) v += w00 * p00[c];
      if (in01) v += w01 * p01[c];
      if (in10) v += w10 * p10[c];
      if (in11) v += w11 * p11[c];
      px[c] = v;
    }
    float* out = dst_row + (size_t)x * channels;
    for (int c = 0; c < channels; ++c) {
      float v = px[c] * color_scale[c];
      v = std::min(std::max(v, 0.f), 255.f);
      out[c] = (v - mean[c]) * inv_std[c];
    }
  }
}

void run_parallel(int n, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  int t = std::min(num_threads, n);
  threads.reserve(t);
  for (int k = 0; k < t; ++k) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Warp+normalize ONE crop.
//   src: (sh, sw, channels) uint8, row-major
//   trans: 2x3 dst<-src affine (row-major, 6 doubles) — same convention as
//          cv2.warpAffine / ops.crop.gen_crop_affine
//   dst: (dh, dw, channels) float32
// color_scale/mean/inv_std: per-channel (channels,)
void warp_affine_normalize_u8(
    const uint8_t* src, int sh, int sw, int channels,
    const double* trans, float* dst, int dh, int dw,
    const float* color_scale, const float* mean, const float* inv_std) {
  if (channels < 1 || channels > kMaxChannels) return;  // caller validates
  Affine m{trans[0], trans[1], trans[2], trans[3], trans[4], trans[5]};
  Affine inv = invert(m);
  for (int y = 0; y < dh; ++y) {
    warp_row_normalize(src, sh, sw, channels, inv, y, dw, color_scale, mean,
                       inv_std, dst + (size_t)y * dw * channels);
  }
}

// Warp+normalize N crops out of ONE source image (the demo/eval multi-person
// case), threaded over crops.
//   trans: (n, 6) affines; dst: (n, dh, dw, channels)
void warp_affine_normalize_batch_u8(
    const uint8_t* src, int sh, int sw, int channels, int n,
    const double* trans, float* dst, int dh, int dw,
    const float* color_scale, const float* mean, const float* inv_std,
    int num_threads) {
  run_parallel(n, num_threads, [&](int i) {
    warp_affine_normalize_u8(src, sh, sw, channels, trans + (size_t)i * 6,
                             dst + (size_t)i * dh * dw * channels, dh, dw,
                             color_scale, mean, inv_std);
  });
}

// Plain uint8 warp (no normalize) — drop-in for cv2.warpAffine in the
// augment pipeline.
void warp_affine_u8(
    const uint8_t* src, int sh, int sw, int channels,
    const double* trans, uint8_t* dst, int dh, int dw) {
  if (channels < 1 || channels > kMaxChannels) return;  // caller validates
  Affine m{trans[0], trans[1], trans[2], trans[3], trans[4], trans[5]};
  Affine inv = invert(m);
  std::vector<float> id_scale(channels, 1.0f);
  std::vector<float> zero(channels, 0.0f);
  std::vector<float> one(channels, 1.0f);
  std::vector<float> row((size_t)dw * channels);
  for (int y = 0; y < dh; ++y) {
    warp_row_normalize(src, sh, sw, channels, inv, y, dw, id_scale.data(),
                       zero.data(), one.data(), row.data());
    uint8_t* out = dst + (size_t)y * dw * channels;
    for (size_t i = 0; i < row.size(); ++i) {
      float v = row[i];
      out[i] = (uint8_t)std::min(std::max(v + 0.5f, 0.f), 255.f);
    }
  }
}

}  // extern "C"
