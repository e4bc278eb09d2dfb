// Native host-side data-pipeline kernels.
//
// TPU-native counterpart of the runtime roles the reference fills with
// native code on the host/data path (the cffi fps extension
// ref lib/csrc/fps/src/farthest_point_sampling.cpp, and the cv2 C++ warps
// the loader leans on, ref lib/datasets/augmentation.py): the augmentation
// hot loops — bilinear/nearest affine warps and the per-pixel vertex-field
// target — run as OpenMP C++ compiled at first import and bound via
// ctypes (no pybind11 in this image; raw-buffer ABI instead).
//
// All functions are extern "C", operate on caller-owned row-major buffers,
// and return 0 on success.

#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Affine warp, bilinear, uint8 HWC. minv: 2x3 output->input mapping.
int warp_affine_u8(const uint8_t* src, int sh, int sw, int c,
                   const double* minv, uint8_t* dst, int dh, int dw,
                   double border) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      double sx = minv[0] * x + minv[1] * y + minv[2];
      double sy = minv[3] * x + minv[4] * y + minv[5];
      int x0 = (int)std::floor(sx);
      int y0 = (int)std::floor(sy);
      double fx = sx - x0, fy = sy - y0;
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int dy2 = 0; dy2 <= 1; ++dy2) {
          for (int dx2 = 0; dx2 <= 1; ++dx2) {
            int yy = y0 + dy2, xx = x0 + dx2;
            double w = (dx2 ? fx : 1.0 - fx) * (dy2 ? fy : 1.0 - fy);
            double v = border;
            if (yy >= 0 && yy < sh && xx >= 0 && xx < sw)
              v = (double)src[(yy * sw + xx) * c + ch];
            acc += w * v;
          }
        }
        double r = std::nearbyint(acc);
        dst[(y * dw + x) * c + ch] =
            (uint8_t)(r < 0 ? 0 : (r > 255 ? 255 : r));
      }
    }
  }
  return 0;
}

// Affine warp, nearest, uint8 single channel (masks).
int warp_affine_nearest_u8(const uint8_t* src, int sh, int sw,
                           const double* minv, uint8_t* dst, int dh, int dw,
                           double border) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      double sx = minv[0] * x + minv[1] * y + minv[2];
      double sy = minv[3] * x + minv[4] * y + minv[5];
      long xi = std::lround(sx);
      long yi = std::lround(sy);
      uint8_t v = (uint8_t)border;
      if (yi >= 0 && yi < sh && xi >= 0 && xi < sw)
        v = src[yi * sw + xi];
      dst[y * dw + x] = v;
    }
  }
  return 0;
}

// Per-pixel unit vectors toward K keypoints on foreground pixels
// (behavior of ref lib/utils/pvnet/pvnet_data_utils.py:30-44, incl. the
// 1e-3 norm floor). out: [h, w, k*2] float32, zeroed on background.
int compute_vertex_f32(const uint8_t* mask, int h, int w, const float* kpt,
                       int k, float* out) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float* row = out + ((size_t)y * w + x) * (size_t)(k * 2);
      if (mask[y * w + x] != 1) {
        std::memset(row, 0, sizeof(float) * k * 2);
        continue;
      }
      for (int i = 0; i < k; ++i) {
        float dx = kpt[i * 2] - (float)x;
        float dy = kpt[i * 2 + 1] - (float)y;
        float n = std::sqrt(dx * dx + dy * dy);
        if (n < 1e-3f) n += 1e-3f;
        row[i * 2] = dx / n;
        row[i * 2 + 1] = dy / n;
      }
    }
  }
  return 0;
}

// Greedy farthest-point sampling (behavior of
// ref lib/csrc/fps/src/farthest_point_sampling.cpp:76-160).
int fps_f32(const float* pts, int n, int m, int init_center, int* idx_out) {
  if (n <= 0 || m <= 0) return 1;
  float* min_d2 = new float[n];
  for (int i = 0; i < n; ++i) min_d2[i] = 1e30f;

  int first = 0;
  if (init_center) {
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = 0; i < n; ++i)
      for (int d = 0; d < 3; ++d) {
        float v = pts[i * 3 + d];
        if (v < lo[d]) lo[d] = v;
        if (v > hi[d]) hi[d] = v;
      }
    float ctr[3] = {(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2,
                    (lo[2] + hi[2]) / 2};
    float best = 1e30f;
    for (int i = 0; i < n; ++i) {
      float d2 = 0;
      for (int d = 0; d < 3; ++d) {
        float t = pts[i * 3 + d] - ctr[d];
        d2 += t * t;
      }
      if (d2 < best) { best = d2; first = i; }
    }
  }
  idx_out[0] = first;
  for (int j = 1; j < m; ++j) {
    const float* last = pts + (size_t)idx_out[j - 1] * 3;
    int arg = 0;
    float best = -1.0f;
#pragma omp parallel
    {
      int l_arg = 0;
      float l_best = -1.0f;
#pragma omp for nowait
      for (int i = 0; i < n; ++i) {
        float dx = pts[i * 3] - last[0];
        float dy = pts[i * 3 + 1] - last[1];
        float dz = pts[i * 3 + 2] - last[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < min_d2[i]) min_d2[i] = d2;
        if (min_d2[i] > l_best) { l_best = min_d2[i]; l_arg = i; }
      }
#pragma omp critical
      if (l_best > best) { best = l_best; arg = l_arg; }
    }
    idx_out[j] = arg;
  }
  delete[] min_d2;
  return 0;
}

}  // extern "C"
