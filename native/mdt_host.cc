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
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

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

}  // extern "C"

// ---------------------------------------------------------------------------
// Native batch executor: a persistent worker pool assembling whole training
// batches in parallel. This is the framework's equivalent of the native worker
// tier torch's DataLoader(num_workers=2) gives the reference implicitly
// (/root/reference/runs/train.py:32): Python enqueues one foreign call (ctypes
// releases the GIL for its duration), the pool fans the per-image work across
// host cores, and the result lands in ONE contiguous [B,H,W,C] buffer ready for
// the single jax.device_put per batch.
// ---------------------------------------------------------------------------

namespace {

class MdtPool {
 public:
  explicit MdtPool(int n_threads) : stop_(false), pending_(0) {
    n_threads = std::max(1, n_threads);
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { this->Run(); });
    }
  }

  ~MdtPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int size() const { return (int)workers_.size(); }

  // Enqueue n index-tasks and block until all completed.
  void ParallelFor(int n, const std::function<void(int)>& fn) {
    if (n <= 0) return;
    {
      std::lock_guard<std::mutex> lk(mu_);
      pending_ += n;
      for (int i = 0; i < n; ++i) jobs_.push([fn, i] { fn(i); });
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
      }
      job();
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  bool stop_;
  int pending_;
};

}  // namespace

extern "C" {

void* mdt_pool_create(int n_threads) { return new MdtPool(n_threads); }

void mdt_pool_destroy(void* pool) { delete static_cast<MdtPool*>(pool); }

int mdt_pool_size(void* pool) { return static_cast<MdtPool*>(pool)->size(); }

// B variable-size uint8 HWC images → one contiguous float32 [B,dh,dw,c] batch,
// images fanned across the pool. shapes is [B,3] (h,w,c); every image's c must
// equal the output c.
void mdt_batch_resize_normalize(
    void* pool,
    const uint8_t** srcs, const int32_t* shapes, int b,
    float* dst, int dh, int dw, int c, float scale, float offset) {
  MdtPool* p = static_cast<MdtPool*>(pool);
  const size_t stride = (size_t)dh * dw * c;
  p->ParallelFor(b, [=](int i) {
    resize_normalize_u8(srcs[i], shapes[i * 3], shapes[i * 3 + 1],
                        shapes[i * 3 + 2], dst + stride * (size_t)i, dh, dw,
                        scale, offset);
  });
}

// B variable-size uint8 label maps → int32 [B,dh,dw], nearest, fanned.
void mdt_batch_resize_labels(
    void* pool,
    const uint8_t** srcs, const int32_t* shapes, int b,
    int32_t* dst, int dh, int dw) {
  MdtPool* p = static_cast<MdtPool*>(pool);
  const size_t stride = (size_t)dh * dw;
  p->ParallelFor(b, [=](int i) {
    resize_nearest_labels(srcs[i], shapes[i * 2], shapes[i * 2 + 1],
                          dst + stride * (size_t)i, dh, dw);
  });
}

int mdt_host_abi_version() { return 2; }

}  // extern "C"
