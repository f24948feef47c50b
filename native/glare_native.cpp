// glare_native: C++ data-path core for glare_tpu.
//
// The reference's native surface is a CUDA extension on the compute path;
// on TPU the compute path is XLA/Pallas, so the native layer moves to where
// it still pays off: the host-side data path. This module fuses the exact
// GLARE preprocessing chain (uint8 -> f32 /255, log(clamp(x+1e-3)), reflect
// pad, NHWC batch assembly, flip/rot augmentation) into single-pass C++
// loops, exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Protocol parity targets:
//   log transform      — reference code/data/LoL_dataset.py:493-494
//   reflect pad        — reference code/infer_dataset_lol.py:71-72
//   flip/rot augment   — reference code/data/LoL_dataset.py:183-216

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// uint8 HWC -> float32 /255 with optional log(clamp(x + eps, eps)).
void u8_to_f32_log(const uint8_t* src, float* dst, int64_t n, int apply_log,
                   float eps) {
  if (apply_log) {
    // LUT: only 256 possible outputs
    float lut[256];
    for (int v = 0; v < 256; ++v) {
      float x = static_cast<float>(v) / 255.0f + eps;
      lut[v] = std::log(x < eps ? eps : x);
    }
    for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
  } else {
    float lut[256];
    for (int v = 0; v < 256; ++v) lut[v] = static_cast<float>(v) / 255.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
  }
}

// Reflect-pad HWC float32 (numpy 'reflect' semantics: edge not repeated).
void reflect_pad_f32(const float* src, float* dst, int h, int w, int c,
                     int top, int bottom, int left, int right) {
  const int oh = h + top + bottom;
  const int ow = w + left + right;
  for (int oy = 0; oy < oh; ++oy) {
    int sy = oy - top;
    if (sy < 0) sy = -sy;
    if (sy >= h) sy = 2 * (h - 1) - sy;
    const float* srow = src + (int64_t)sy * w * c;
    float* drow = dst + (int64_t)oy * ow * c;
    for (int ox = 0; ox < ow; ++ox) {
      int sx = ox - left;
      if (sx < 0) sx = -sx;
      if (sx >= w) sx = 2 * (w - 1) - sx;
      std::memcpy(drow + (int64_t)ox * c, srow + (int64_t)sx * c,
                  sizeof(float) * c);
    }
  }
}

// Fused: uint8 HWC image -> reflect-padded f32 (optionally log-domain),
// written into a preallocated NHWC batch slot. One pass over the output.
void preprocess_into_batch(const uint8_t* src, float* batch_slot, int h,
                           int w, int c, int top, int bottom, int left,
                           int right, int apply_log, float eps) {
  float lut[256];
  for (int v = 0; v < 256; ++v) {
    float x = static_cast<float>(v) / 255.0f;
    if (apply_log) {
      float xe = x + eps;
      lut[v] = std::log(xe < eps ? eps : xe);
    } else {
      lut[v] = x;
    }
  }
  const int oh = h + top + bottom;
  const int ow = w + left + right;
  for (int oy = 0; oy < oh; ++oy) {
    int sy = oy - top;
    if (sy < 0) sy = -sy;
    if (sy >= h) sy = 2 * (h - 1) - sy;
    const uint8_t* srow = src + (int64_t)sy * w * c;
    float* drow = batch_slot + (int64_t)oy * ow * c;
    for (int ox = 0; ox < ow; ++ox) {
      int sx = ox - left;
      if (sx < 0) sx = -sx;
      if (sx >= w) sx = 2 * (w - 1) - sx;
      const uint8_t* sp = srow + (int64_t)sx * c;
      float* dp = drow + (int64_t)ox * c;
      for (int ch = 0; ch < c; ++ch) dp[ch] = lut[sp[ch]];
    }
  }
}

// Crop + flip/rot90 augment + convert, fused (train-path hot loop).
// rot90: 0/1/3 quarter turns (reference uses np.rot90 choices {0,1,3}).
// Output size: he x we (swapped when rot90 is odd).
void crop_augment_f32(const float* src, float* dst, int w_src, int c,
                      int top, int left, int hc, int wc, int hflip,
                      int vflip, int rot90) {
  // gather crop with flips into a temp orientation, then rotate
  // dst dims: rot90 odd -> (wc, hc), else (hc, wc)
  for (int y = 0; y < hc; ++y) {
    for (int x = 0; x < wc; ++x) {
      int sy = top + (vflip ? (hc - 1 - y) : y);
      int sx = left + (hflip ? (wc - 1 - x) : x);
      const float* sp = src + ((int64_t)sy * w_src + sx) * c;
      int dy, dx, dw;
      if (rot90 == 1) {        // (y, x) -> (wc-1-x, y)
        dy = wc - 1 - x; dx = y; dw = hc;
      } else if (rot90 == 3) { // (y, x) -> (x, hc-1-y)
        dy = x; dx = hc - 1 - y; dw = hc;
      } else {
        dy = y; dx = x; dw = wc;
      }
      std::memcpy(dst + ((int64_t)dy * dw + dx) * c, sp, sizeof(float) * c);
    }
  }
}

int glare_native_version() { return 1; }

}  // extern "C"
