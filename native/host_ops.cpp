// freefine_tpu native host ops: the C++ data-path of the runtime.
//
// The reference leans on cv2/PIL C++ for all host-side image work
// (resize/dilate/normalize on the eval harness's hot loader path,
// /root/reference/evaluation/FreeFine/freefine_batch_infer_2d.py and
// src/utils/vis_utils.py).  This library provides the same primitives as a
// dependency-free, OpenMP-parallel C++ core consumed through ctypes
// (freefine_tpu/native.py), keeping the TPU feeding pipeline off the
// Python interpreter:
//
//   * nearest / bilinear uint8 resize (mask / image conventions)
//   * binary square dilation & erosion with cv2's even-kernel anchor
//   * uint8 HWC -> float32 [-1, 1] normalization (the VAE input transform)
//   * L1-inside-mask accumulation (the WRAP_E inner loop)
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC host_ops.cpp -o libfreefine_host.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// Nearest-neighbour resize, any channel count (masks use this; matches
// torch F.interpolate(mode='nearest') coordinate convention: src index =
// floor(dst * scale)).
void resize_nearest_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                       uint8_t* dst, int64_t dh, int64_t dw) {
  const double sy = (double)sh / dh;
  const double sx = (double)sw / dw;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < dh; ++y) {
    int64_t ys = std::min((int64_t)(y * sy), sh - 1);
    const uint8_t* row = src + ys * sw * c;
    uint8_t* out = dst + y * dw * c;
    for (int64_t x = 0; x < dw; ++x) {
      int64_t xs = std::min((int64_t)(x * sx), sw - 1);
      std::memcpy(out + x * c, row + xs * c, c);
    }
  }
}

// Bilinear resize with half-pixel centers (PIL/cv2 INTER_LINEAR convention).
void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                        uint8_t* dst, int64_t dh, int64_t dw) {
  const double sy = (double)sh / dh;
  const double sx = (double)sw / dw;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int64_t y0 = (int64_t)std::floor(fy);
    double wy = fy - y0;
    int64_t y0c = std::clamp(y0, (int64_t)0, sh - 1);
    int64_t y1c = std::clamp(y0 + 1, (int64_t)0, sh - 1);
    for (int64_t x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int64_t x0 = (int64_t)std::floor(fx);
      double wx = fx - x0;
      int64_t x0c = std::clamp(x0, (int64_t)0, sw - 1);
      int64_t x1c = std::clamp(x0 + 1, (int64_t)0, sw - 1);
      for (int64_t k = 0; k < c; ++k) {
        double v00 = src[(y0c * sw + x0c) * c + k];
        double v01 = src[(y0c * sw + x1c) * c + k];
        double v10 = src[(y1c * sw + x0c) * c + k];
        double v11 = src[(y1c * sw + x1c) * c + k];
        double v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                   wy * ((1 - wx) * v10 + wx * v11);
        dst[(y * dw + x) * c + k] = (uint8_t)std::lround(std::clamp(v, 0.0, 255.0));
      }
    }
  }
}

// Binary square dilation with cv2's even-kernel anchor (k//2): window
// offsets [-k/2, k - k/2 - 1] in both axes.
void dilate_u8(const uint8_t* src, int64_t h, int64_t w, int64_t k, uint8_t* dst) {
  const int64_t lo = k / 2;
  const int64_t hi = k - lo - 1;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      uint8_t m = 0;
      int64_t y0 = std::max((int64_t)0, y - lo), y1 = std::min(h - 1, y + hi);
      int64_t x0 = std::max((int64_t)0, x - lo), x1 = std::min(w - 1, x + hi);
      for (int64_t yy = y0; yy <= y1 && !m; ++yy)
        for (int64_t xx = x0; xx <= x1; ++xx)
          if (src[yy * w + xx]) { m = 1; break; }
      dst[y * w + x] = m ? 255 : 0;
    }
  }
}

void erode_u8(const uint8_t* src, int64_t h, int64_t w, int64_t k, uint8_t* dst) {
  const int64_t lo = k / 2;
  const int64_t hi = k - lo - 1;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      uint8_t m = 1;
      int64_t y0 = y - lo, y1 = y + hi, x0 = x - lo, x1 = x + hi;
      if (y0 < 0 || x0 < 0 || y1 >= h || x1 >= w) { m = 0; }
      else {
        for (int64_t yy = y0; yy <= y1 && m; ++yy)
          for (int64_t xx = x0; xx <= x1; ++xx)
            if (!src[yy * w + xx]) { m = 0; break; }
      }
      dst[y * w + x] = m ? 255 : 0;
    }
  }
}

// uint8 HWC -> float32 in [-1, 1] (the SD VAE input transform,
// reference preprocess_image: x / 127.5 - 1).
void normalize_to_f32(const uint8_t* src, int64_t n, float* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    dst[i] = (float)src[i] / 127.5f - 1.0f;
}

// sum |a - b| * m and sum m over 3-channel uint8 images with a uint8 mask
// (the WRAP_E inner loop, evaluation/metrics/wrap_error.py:5-21).
void masked_l1_u8(const uint8_t* a, const uint8_t* b, const uint8_t* mask,
                  int64_t h, int64_t w, double* out_sum, double* out_count) {
  double s = 0.0, cnt = 0.0;
#pragma omp parallel for reduction(+:s, cnt) schedule(static)
  for (int64_t i = 0; i < h * w; ++i) {
    double m = mask[i] / 255.0;
    if (m == 0.0) continue;
    for (int64_t k = 0; k < 3; ++k) {
      s += m * std::abs((double)a[i * 3 + k] - (double)b[i * 3 + k]) / 255.0;
      cnt += m;
    }
  }
  *out_sum = s;
  *out_count = cnt;
}

}  // extern "C"
