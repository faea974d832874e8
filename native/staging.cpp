// Host-side data-staging runtime for the TPU training pipeline.
//
// The reference's host path is CPU DataLoader workers doing PIL transforms
// (dataset/transform_cfg.py); in this framework augmentation moved onto the
// device, so the host's remaining job is assembling uint8 batches fast
// enough to keep the chip fed.  This library provides the hot host
// primitives as native, multi-threaded code:
//
//   * staging_gather_u8:    parallel row gather (batch assembly from the
//                           in-memory image array)
//   * staging_gather_cast:  gather + uint8->float32 normalize fallback for
//                           CPU-only paths
//
// Built with `python -m subspace_reg_tpu.data.native` or lazily on first
// use (g++ -O3 -shared).  Python binds via ctypes (no pybind11 in image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows of `item_bytes` bytes from src at `indices` into dst.
void staging_gather_u8(const uint8_t* src, const int64_t* indices,
                       uint8_t* dst, int64_t n_idx, int64_t item_bytes,
                       int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n_idx) break;
      std::memcpy(dst + i * item_bytes, src + indices[i] * item_bytes,
                  static_cast<size_t>(item_bytes));
    }
  };
  if (n_threads == 1 || n_idx < 4) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Gather + normalize: dst[i] = (src[indices[i]]/255 - mean[c]) / std[c].
// Layout HWC with `channels` trailing.
void staging_gather_normalize(const uint8_t* src, const int64_t* indices,
                              float* dst, int64_t n_idx, int64_t item_elems,
                              const float* mean, const float* inv_std,
                              int channels, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  const float k = 1.0f / 255.0f;
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n_idx) break;
      const uint8_t* s = src + indices[i] * item_elems;
      float* d = dst + i * item_elems;
      for (int64_t e = 0; e < item_elems; ++e) {
        int c = static_cast<int>(e % channels);
        d[e] = (static_cast<float>(s[e]) * k - mean[c]) * inv_std[c];
      }
    }
  };
  if (n_threads == 1 || n_idx < 4) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
