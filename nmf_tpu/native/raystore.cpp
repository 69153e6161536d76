// Native host-side data path: parallel ray generation and batch gathering.
//
// The reference's native layer is CUDA compute kernels; on TPU those live in
// XLA/Pallas, so the native runtime component here is the host data path:
// camera-ray generation over all images and the per-step shuffled batch
// gather, both memory-bandwidth-bound loops that benefit from threads.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC raystore.cpp -o libraystore.so
// (see build.sh; loaded via ctypes with a numpy fallback).

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? static_cast<int64_t>(hw) : 4;
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// poses: (P, 12) row-major 3x4 camera-to-world matrices.
// dirs: (HW, 3) camera-frame unit directions.
// out: (P*HW, 6) world rays (origin, direction).
void generate_rays(const float* poses, int64_t P, const float* dirs,
                   int64_t HW, float* out) {
  parallel_for(P, [=](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      const float* M = poses + p * 12;
      const float ox = M[3], oy = M[7], oz = M[11];
      float* dst = out + p * HW * 6;
      for (int64_t i = 0; i < HW; ++i) {
        const float dx = dirs[i * 3 + 0];
        const float dy = dirs[i * 3 + 1];
        const float dz = dirs[i * 3 + 2];
        float* o6 = dst + i * 6;
        o6[0] = ox;
        o6[1] = oy;
        o6[2] = oz;
        o6[3] = M[0] * dx + M[1] * dy + M[2] * dz;
        o6[4] = M[4] * dx + M[5] * dy + M[6] * dz;
        o6[5] = M[8] * dx + M[9] * dy + M[10] * dz;
      }
    }
  });
}

// Gather rows ids (n,) from rays (N, 6) and rgbs (N, C) into contiguous
// batch buffers.
void gather_batch(const float* rays, const float* rgbs, int64_t rgb_dim,
                  const int64_t* ids, int64_t n, float* out_rays,
                  float* out_rgbs) {
  parallel_for(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t src = ids[i];
      std::memcpy(out_rays + i * 6, rays + src * 6, 6 * sizeof(float));
      std::memcpy(out_rgbs + i * rgb_dim, rgbs + src * rgb_dim,
                  rgb_dim * sizeof(float));
    }
  });
}

}  // extern "C"
