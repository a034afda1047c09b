// Native host-side data-path kernels for the input pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; the host input pipeline (decode,
// normalize, collate) is plain CPU work that sits on the training critical
// path when per-step batches are large (the reference leans on torch's C++
// DataLoader workers + MDS's native decoders for this). These kernels cover
// the two hot per-batch transforms, multithreaded over samples:
//
//   normalize_u8_to_f32:   uint8 HWC -> float32, y = x * scale + bias
//                          (scale=1/127.5, bias=-1 gives the [-1, 1] range
//                          every dataset here uses)
//   gather_collate_f32:    stack N index-selected float32 samples into one
//                          contiguous batch (the collate hot loop)
//
// Built with plain g++ -O3 -march=native -shared; bound via ctypes
// (diffulab_tpu.data.native). No Python.h dependency.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n,
                         float scale, float bias, int n_threads) {
  if (n_threads <= 1 || n < (1 << 16)) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]) * scale + bias;
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t start = t * chunk;
    int64_t end = start + chunk < n ? start + chunk : n;
    if (start >= end) break;
    threads.emplace_back([=]() {
      for (int64_t i = start; i < end; ++i)
        dst[i] = static_cast<float>(src[i]) * scale + bias;
    });
  }
  for (auto& th : threads) th.join();
}

// src: base pointer of a [total, sample_elems] float32 array
// indices: [n_idx] row indices; dst: [n_idx, sample_elems] output
void gather_collate_f32(const float* src, const int64_t* indices, float* dst,
                        int64_t n_idx, int64_t sample_elems, int n_threads) {
  auto copy_range = [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * sample_elems, src + indices[i] * sample_elems,
                  sizeof(float) * static_cast<size_t>(sample_elems));
    }
  };
  if (n_threads <= 1 || n_idx * sample_elems < (1 << 16)) {
    copy_range(0, n_idx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t start = t * chunk;
    int64_t end = start + chunk < n_idx ? start + chunk : n_idx;
    if (start >= end) break;
    threads.emplace_back(copy_range, start, end);
  }
  for (auto& th : threads) th.join();
}

// Fused gather + u8->f32 normalize (latent-free pixel datasets: one pass
// from the raw uint8 store to the normalized batch).
void gather_normalize_u8(const uint8_t* src, const int64_t* indices, float* dst,
                         int64_t n_idx, int64_t sample_elems, float scale,
                         float bias, int n_threads) {
  auto work = [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* s = src + indices[i] * sample_elems;
      float* d = dst + i * sample_elems;
      for (int64_t j = 0; j < sample_elems; ++j)
        d[j] = static_cast<float>(s[j]) * scale + bias;
    }
  };
  if (n_threads <= 1 || n_idx * sample_elems < (1 << 16)) {
    work(0, n_idx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t start = t * chunk;
    int64_t end = start + chunk < n_idx ? start + chunk : n_idx;
    if (start >= end) break;
    threads.emplace_back(work, start, end);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
