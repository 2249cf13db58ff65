// Native host-side image augmentation for the input pipeline.
//
// The reference's input pipeline is torchvision transforms running in 12
// DataLoader worker processes (/root/reference/demo.py:523). The TPU-native
// rebuild feeds a single host process, so the decode+augment stage is
// implemented here as a multithreaded C++ batch kernel driven via ctypes
// (see native/__init__.py): PIL-style antialiased bilinear resize of a crop
// box -> horizontal flip -> per-channel normalize, fused into one separable
// two-pass pipeline per image, parallelized over the batch with std::thread.
//
// Resize semantics match PIL Image.BILINEAR exactly (triangle filter with
// support scaled by the downscale ratio, half-pixel centers), which is what
// data/transforms.py produces through PIL; that Python path remains the
// semantics oracle and fallback.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread -o libnfp_augment.so augment.cpp

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Precomputed sampling weights for one output coordinate axis (PIL
// ImagingResampleHorizontal convention).
struct AxisWeights {
  std::vector<int> first;      // per-output start index (source coords)
  std::vector<int> count;      // per-output tap count
  std::vector<float> weights;  // per-output taps, stride = max_count
  int max_count = 0;
};

AxisWeights compute_weights(int in_start, int in_size, int out_size) {
  AxisWeights aw;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = filterscale;  // triangle filter support = 1.0
  aw.max_count = static_cast<int>(std::ceil(support)) * 2 + 1;
  aw.first.resize(out_size);
  aw.count.resize(out_size);
  aw.weights.assign(static_cast<size_t>(out_size) * aw.max_count, 0.0f);
  for (int i = 0; i < out_size; ++i) {
    const double center = in_start + (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    int xmax = static_cast<int>(center + support + 0.5);
    xmin = std::max(xmin, in_start);
    xmax = std::min(xmax, in_start + in_size);
    double total = 0.0;
    float* w = &aw.weights[static_cast<size_t>(i) * aw.max_count];
    for (int k = xmin; k < xmax; ++k) {
      const double x = (k - center + 0.5) / filterscale;
      const double t = x < 0 ? -x : x;
      const double v = t < 1.0 ? 1.0 - t : 0.0;  // triangle (bilinear)
      w[k - xmin] = static_cast<float>(v);
      total += v;
    }
    if (total > 0) {
      for (int k = 0; k < xmax - xmin; ++k) {
        w[k] = static_cast<float>(w[k] / total);
      }
    }
    aw.first[i] = xmin;
    aw.count[i] = xmax - xmin;
  }
  return aw;
}

struct Job {
  const float* src;
  int sh, sw;
  int ct, cl, chh, cww;  // crop box (top, left, h, w)
  int flip;
};

void process_one(const Job& job, int channels, int out_h, int out_w,
                 const float* mean, const float* inv_std, float* dst,
                 std::vector<float>* scratch) {
  const AxisWeights wx = compute_weights(job.cl, job.cww, out_w);
  const AxisWeights wy = compute_weights(job.ct, job.chh, out_h);

  // horizontal pass over the crop's source rows: (chh, out_w, c)
  scratch->assign(static_cast<size_t>(job.chh) * out_w * channels, 0.0f);
  float* tmp = scratch->data();
  for (int sy = 0; sy < job.chh; ++sy) {
    // int64 linearized index: large panoramas overflow 32-bit arithmetic
    const float* row = job.src + (static_cast<int64_t>(job.ct + sy) *
                                  job.sw) * channels;
    float* trow = tmp + (static_cast<size_t>(sy) * out_w) * channels;
    for (int ox = 0; ox < out_w; ++ox) {
      const float* w = &wx.weights[static_cast<size_t>(ox) * wx.max_count];
      const int first = wx.first[ox];
      const int cnt = wx.count[ox];
      float* out = trow + ox * channels;
      for (int ch = 0; ch < channels; ++ch) {
        float acc = 0.0f;
        for (int k = 0; k < cnt; ++k) {
          acc += row[(first + k) * channels + ch] * w[k];
        }
        out[ch] = acc;
      }
    }
  }

  // vertical pass + flip + normalize: (out_h, out_w, c)
  for (int oy = 0; oy < out_h; ++oy) {
    const float* w = &wy.weights[static_cast<size_t>(oy) * wy.max_count];
    const int first = wy.first[oy] - job.ct;  // tmp rows are crop-relative
    const int cnt = wy.count[oy];
    for (int ox = 0; ox < out_w; ++ox) {
      const int tx = job.flip ? (out_w - 1 - ox) : ox;
      float* out = dst + (static_cast<size_t>(oy) * out_w + ox) * channels;
      for (int ch = 0; ch < channels; ++ch) {
        float acc = 0.0f;
        for (int k = 0; k < cnt; ++k) {
          acc += tmp[((static_cast<size_t>(first + k)) * out_w + tx) *
                         channels + ch] * w[k];
        }
        out[ch] = (acc - mean[ch]) * inv_std[ch];
      }
    }
  }
}

}  // namespace

extern "C" {

// Batched augment; see native/__init__.py for the argument contract.
// Returns 0 on success, 1 on malformed crop.
int nfp_augment_batch(const float* images, const int64_t* offsets,
                      const int32_t* shapes, const int32_t* crops,
                      const int32_t* flips, int n, int channels, int out_h,
                      int out_w, const float* mean, const float* std,
                      float* out, int num_threads) {
  if (n <= 0) return 0;
  std::vector<float> inv_std(channels);
  for (int ch = 0; ch < channels; ++ch) {
    inv_std[ch] = 1.0f / std[ch];
  }
  // validate crops up front
  for (int i = 0; i < n; ++i) {
    const int sh = shapes[i * 2], sw = shapes[i * 2 + 1];
    const int ct = crops[i * 4], cl = crops[i * 4 + 1];
    const int ch_ = crops[i * 4 + 2], cw = crops[i * 4 + 3];
    if (ch_ <= 0 || cw <= 0 || ct < 0 || cl < 0 || ct + ch_ > sh ||
        cl + cw > sw) {
      return 1;
    }
  }
  std::atomic<int> next{0};
  const int workers = std::max(1, std::min(num_threads, n));
  const int64_t out_stride = static_cast<int64_t>(out_h) * out_w * channels;

  auto worker = [&]() {
    std::vector<float> scratch;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Job job;
      job.src = images + offsets[i];
      job.sh = shapes[i * 2];
      job.sw = shapes[i * 2 + 1];
      job.ct = crops[i * 4];
      job.cl = crops[i * 4 + 1];
      job.chh = crops[i * 4 + 2];
      job.cww = crops[i * 4 + 3];
      job.flip = flips[i];
      process_one(job, channels, out_h, out_w, mean, inv_std.data(),
                  out + i * out_stride, &scratch);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(workers - 1);
  for (int t = 1; t < workers; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
