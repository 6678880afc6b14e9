// mdt_host — native host-side runtime ops for the makeupdiffuse_tpu data pipeline.
//
// The reference gets its native tier implicitly from OpenCV/dlib/torch inside
// DataLoader workers (SURVEY.md §2: cv2 resizes at datasets.py:629-631, dlib C++
// landmarks). This library is the framework's explicit equivalent: the per-image
// CPU hot loop (uint8 decode-side resize, normalize-to-float, label-map nearest
// resize, masked 256-bin histograms) implemented in C++ with OpenMP-free plain
// loops (the batcher threads already parallelize across images), exposed to Python
// via ctypes (makeupdiffuse_tpu/utils/native.py) with a pure-numpy fallback.
//
// Build: cc -O3 -fPIC -shared -o libmdt_host.so mdt_host.cc   (see build.sh)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Bilinear resize uint8 HWC -> float32 HWC, then affine map y = x/127.5 - 1
// (the load_image path: PIL resize + ToTensor + Normalize(0.5,0.5) —
// /root/reference/diffdata/preprocessing.py:47-50).
void resize_normalize_u8(
    const uint8_t* src, int sh, int sw, int c,
    float* dst, int dh, int dw,
    float scale, float offset) {
  const float ry = (float)sh / dh;
  const float rx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * ry - 0.5f;
    int y0 = (int)fy; if (fy < 0) y0 = 0;
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0; if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * rx - 0.5f;
      int x0 = (int)fx; if (fx < 0) x0 = 0;
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0; if (wx < 0) wx = 0;
      for (int ch = 0; ch < c; ++ch) {
        float v00 = src[(y0 * sw + x0) * c + ch];
        float v01 = src[(y0 * sw + x1) * c + ch];
        float v10 = src[(y1 * sw + x0) * c + ch];
        float v11 = src[(y1 * sw + x1) * c + ch];
        float v0 = v00 + (v01 - v00) * wx;
        float v1 = v10 + (v11 - v10) * wx;
        dst[(y * dw + x) * c + ch] = (v0 + (v1 - v0) * wy) * scale + offset;
      }
    }
  }
}

// Nearest-neighbor resize for integer label maps (segs/scgan_segs —
// load_mask semantics, preprocessing.py:81-85).
void resize_nearest_labels(
    const uint8_t* src, int sh, int sw,
    int32_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    int sy = std::min((int)((y + 0.5f) * sh / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min((int)((x + 0.5f) * sw / dw), sw - 1);
      dst[y * dw + x] = (int32_t)src[sy * sw + sx];
    }
  }
}

// Masked cumulative 256-bin histogram per channel over float intensities in
// [0,255] — the host twin of ops/histogram.masked_cdf for CPU-side PGT pre-
// computation (histogram_matching.py:5-23 capability).
void masked_cdf_f32(
    const float* img, const float* mask, int n, int c,
    float* cdf_out /* c * 256 */) {
  for (int ch = 0; ch < c; ++ch) {
    double hist[256] = {0.0};
    double total = 0.0;
    for (int i = 0; i < n; ++i) {
      float w = mask[i];
      if (w <= 0) continue;
      float v = img[i * c + ch];
      int b = (int)v;
      if (b < 0) b = 0;
      if (b > 255) b = 255;
      hist[b] += w;
      total += w;
    }
    double acc = 0.0;
    for (int b = 0; b < 256; ++b) {
      acc += hist[b];
      cdf_out[ch * 256 + b] = total > 0 ? (float)(acc / total) : 0.0f;
    }
  }
}

// One-hot component masks from a label map: out[n, k] = labels[n] in classes[k].
void class_masks_i32(
    const int32_t* labels, int n,
    const int32_t* classes, const int32_t* class_offsets, int k,
    float* out) {
  std::memset(out, 0, sizeof(float) * (size_t)n * k);
  for (int comp = 0; comp < k; ++comp) {
    int lo = class_offsets[comp];
    int hi = class_offsets[comp + 1];
    for (int i = 0; i < n; ++i) {
      int32_t v = labels[i];
      for (int j = lo; j < hi; ++j) {
        if (v == classes[j]) { out[(size_t)i * k + comp] = 1.0f; break; }
      }
    }
  }
}

int mdt_host_abi_version() { return 1; }

}  // extern "C"
