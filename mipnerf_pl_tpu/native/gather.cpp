// Native host-side batch gather for the ray pipeline.
//
// The training sampler gathers K*B random rows from each of the 8 flattened
// ray/pixel arrays every dispatch (reference analog: DataLoader workers,
// models/nerf_system.py:78-83).  numpy fancy-indexing does this one array
// at a time — 8 passes over the index vector and 8 rounds of cache misses.
// This kernel fuses the gather across all fields: one pass over the indices,
// all fields copied per index while the index is hot, parallelized across
// threads when the host has them.
//
// Build: make -C mipnerf_pl_tpu/native   (g++ -O3 -shared -fPIC)
// Python binding: ctypes (mipnerf_pl_tpu/native/gather.py), numpy fallback.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows from one f32 array: dst[i, :] = src[idx[i], :].
void gather_rows_f32(const float* src, const int64_t* idx, float* dst,
                     int64_t n_idx, int64_t row_elems, int n_threads) {
  auto work = [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                  sizeof(float) * row_elems);
    }
  };
  if (n_threads <= 1 || n_idx < 4096) {
    work(0, n_idx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Fused gather across n_fields f32 arrays sharing one index vector:
// dsts[f][i, :] = srcs[f][idx[i], :].  One pass over idx, all fields per
// index — better cache behaviour than per-field gathers.
void gather_multi_f32(const float** srcs, float** dsts,
                      const int64_t* widths, int64_t n_fields,
                      const int64_t* idx, int64_t n_idx, int n_threads) {
  auto work = [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t r = idx[i];
      for (int64_t f = 0; f < n_fields; ++f) {
        const int64_t w = widths[f];
        std::memcpy(dsts[f] + i * w, srcs[f] + r * w, sizeof(float) * w);
      }
    }
  };
  if (n_threads <= 1 || n_idx < 4096) {
    work(0, n_idx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
