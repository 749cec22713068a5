// Native snapshot-matrix packer.
//
// Host-side hot path of the ingest pipeline (SURVEY.md section 2b,
// "Host-side native component"): ERA5 fields arrive time-major
// (time, level, lat, lon) from the storage layer, while the decomposition
// engine consumes space-major (space, time) row blocks per device shard.
// This transpose touches every byte of the slice, so it is implemented as
// a multithreaded, cache-blocked C++ kernel with optional fused fp32->bf16
// conversion and fused per-row (mean, sumsq) statistics — one pass instead
// of three numpy passes.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBlock = 64;  // cache tile edge (rows x cols of the transpose)

inline uint16_t f32_to_bf16_rne(float v) {
  uint32_t bits;
  std::memcpy(&bits, &v, sizeof(bits));
  // round-to-nearest-even on the truncated mantissa
  uint32_t rounding_bias = 0x7fff + ((bits >> 16) & 1);
  return static_cast<uint16_t>((bits + rounding_bias) >> 16);
}

template <typename Fn>
void parallel_for(int64_t n, Fn&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = hw ? static_cast<int>(hw) : 2;
  if (n < n_threads) n_threads = static_cast<int>(n > 0 ? n : 1);
  std::atomic<int64_t> next(0);
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int w = 0; w < n_threads; ++w) {
    workers.emplace_back([&next, n, &fn]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) break;
        fn(i);
      }
    });
  }
  for (auto& t : workers) t.join();
}

}  // namespace

extern "C" {

// Transpose (n_time, n_space) row-major -> (n_space, n_time) row-major.
// src: time-major snapshots (each time step is a contiguous flattened
// field of n_space values — level/lat/lon already flattened row-major,
// which is exactly the (level, latitude, longitude) stack order of the
// reference layout).  dst: space-major snapshot matrix.
void pack_space_time_f32(const float* src, float* dst, int64_t n_time,
                         int64_t n_space) {
  int64_t row_tiles = (n_space + kBlock - 1) / kBlock;
  int64_t col_tiles = (n_time + kBlock - 1) / kBlock;
  parallel_for(row_tiles * col_tiles, [=](int64_t tile) {
    int64_t rt = tile / col_tiles;
    int64_t ct = tile % col_tiles;
    int64_t s0 = rt * kBlock, s1 = std::min<int64_t>(s0 + kBlock, n_space);
    int64_t t0 = ct * kBlock, t1 = std::min<int64_t>(t0 + kBlock, n_time);
    for (int64_t t = t0; t < t1; ++t) {
      const float* src_row = src + t * n_space;
      for (int64_t s = s0; s < s1; ++s) {
        dst[s * n_time + t] = src_row[s];
      }
    }
  });
}

// Same transpose with fused fp32 -> bf16 (round-to-nearest-even).
void pack_space_time_bf16(const float* src, uint16_t* dst, int64_t n_time,
                          int64_t n_space) {
  int64_t row_tiles = (n_space + kBlock - 1) / kBlock;
  int64_t col_tiles = (n_time + kBlock - 1) / kBlock;
  parallel_for(row_tiles * col_tiles, [=](int64_t tile) {
    int64_t rt = tile / col_tiles;
    int64_t ct = tile % col_tiles;
    int64_t s0 = rt * kBlock, s1 = std::min<int64_t>(s0 + kBlock, n_space);
    int64_t t0 = ct * kBlock, t1 = std::min<int64_t>(t0 + kBlock, n_time);
    for (int64_t t = t0; t < t1; ++t) {
      const float* src_row = src + t * n_space;
      for (int64_t s = s0; s < s1; ++s) {
        dst[s * n_time + t] = f32_to_bf16_rne(src_row[s]);
      }
    }
  });
}

// Per-row mean and standard deviation of a (n_rows, n_cols) row-major
// matrix, one multithreaded pass (Welford-free two-accumulator form —
// adequate in double accumulation).
void row_stats_f32(const float* x, int64_t n_rows, int64_t n_cols,
                   float* mean_out, float* std_out, int ddof) {
  parallel_for(n_rows, [=](int64_t r) {
    const float* row = x + r * n_cols;
    double acc = 0.0, acc2 = 0.0;
    for (int64_t c = 0; c < n_cols; ++c) {
      double v = row[c];
      acc += v;
      acc2 += v * v;
    }
    double mu = acc / n_cols;
    double denom = static_cast<double>(n_cols - ddof);
    double var = denom > 0 ? (acc2 - n_cols * mu * mu) / denom : 0.0;
    if (var < 0) var = 0;
    mean_out[r] = static_cast<float>(mu);
    std_out[r] = static_cast<float>(std::sqrt(var));
  });
}

// fp32 -> bf16 flat conversion.
void convert_f32_to_bf16(const float* src, uint16_t* dst, int64_t n) {
  constexpr int64_t kChunk = 1 << 16;
  int64_t chunks = (n + kChunk - 1) / kChunk;
  parallel_for(chunks, [=](int64_t c) {
    int64_t i0 = c * kChunk, i1 = std::min<int64_t>(i0 + kChunk, n);
    for (int64_t i = i0; i < i1; ++i) dst[i] = f32_to_bf16_rne(src[i]);
  });
}

}  // extern "C"
