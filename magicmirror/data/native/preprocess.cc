// Native host-side image preprocessing for the data pipeline.
//
// The reference parallelizes host work with DataLoader worker *processes*
// (reference train.py:160-169); the TPU-native loader uses threads, so the
// hot per-sample ops (resize, binarize, composite, hole-fill, fg-ratio) are
// implemented here in C++ releasing the GIL entirely — called via ctypes
// (no pybind11 in this image), with pure-NumPy fallbacks when the shared
// library is absent.
//
// Build: magicmirror/data/native/build.sh  (g++ -O3 -shared -fPIC)
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Bilinear resize HWC uint8, torch/PIL 'align_corners=False' pixel-center
// convention.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(std::max(y0 + 1, 0), sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(std::max(x0 + 1, 0), sw - 1);
      for (int k = 0; k < c; ++k) {
        float v00 = src[(y0c * sw + x0c) * c + k];
        float v01 = src[(y0c * sw + x1c) * c + k];
        float v10 = src[(y1c * sw + x0c) * c + k];
        float v11 = src[(y1c * sw + x1c) * c + k];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        dst[(y * dw + x) * c + k] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Nearest resize HW uint8 (masks), PIL NEAREST convention.
void resize_nearest_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                       int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    int sy = std::min(static_cast<int>(y * static_cast<float>(sh) / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min(static_cast<int>(x * static_cast<float>(sw) / dw), sw - 1);
      dst[y * dw + x] = src[sy * sw + sx];
    }
  }
}

// Binarize: p > threshold → 255 else 0 (reference datasets/bird.py:27).
void binarize_u8(uint8_t* data, int n, int threshold) {
  for (int i = 0; i < n; ++i) data[i] = data[i] > threshold ? 255 : 0;
}

// Foreground ratio of a {0,255} mask.
double fg_ratio_u8(const uint8_t* mask, int n) {
  int64_t s = 0;
  for (int i = 0; i < n; ++i) s += mask[i] > 0 ? 1 : 0;
  return static_cast<double>(s) / n;
}

// RGBA float32 compose: rgb*mask + white*(1-mask), in-place on an HWC4
// float image whose channel 3 is the mask (reference datasets/bird.py:131).
void white_composite_f32(float* rgba, int h, int w) {
  for (int i = 0; i < h * w; ++i) {
    float m = rgba[i * 4 + 3];
    for (int k = 0; k < 3; ++k) {
      rgba[i * 4 + k] = rgba[i * 4 + k] * m + (1.0f - m);
    }
  }
}

// ATR mask hole filling (reference prepare_ATR.py:27-31): iterations of
// seg += meanpool3(seg); threshold at 4/9.  mask: {0,1} float64.
void fill_holes_f64(double* mask, int h, int w, int iters) {
  std::vector<double> tmp(h * w);
  for (int it = 0; it < iters; ++it) {
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        double s = 0;
        for (int dy = -1; dy <= 1; ++dy) {
          for (int dx = -1; dx <= 1; ++dx) {
            int yy = y + dy, xx = x + dx;
            if (yy >= 0 && yy < h && xx >= 0 && xx < w) s += mask[yy * w + xx];
          }
        }
        tmp[y * w + x] = mask[y * w + x] + s / 9.0;
      }
    }
    for (int i = 0; i < h * w; ++i) mask[i] = tmp[i] > (4.0 / 9.0) ? 1.0 : 0.0;
  }
}

}  // extern "C"
