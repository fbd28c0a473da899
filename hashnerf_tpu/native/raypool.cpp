// Native ray-pool builder + shuffler for the host-side data pipeline.
//
// Capability parity: the reference builds its random-ray-batching pool in
// numpy (run_nerf.py:510-519: per-image get_rays_np, concat with rgb,
// transpose, reshape, np.random.shuffle) — ~10s and 2+ GB of temporaries for
// a 100x800x800 blender scene. This multithreaded C++ implementation fuses
// ray generation, packing, and permutation-gather into one pass over
// write-once memory.
//
// Exposed C ABI (ctypes):
//   hn_build_ray_pool(poses, images, K, n, h, w, out, seed, shuffle, threads)
//   hn_shuffle_rows(data, out, n_rows, row_floats, seed, threads)
//
// Layout contracts (all float32, C-contiguous):
//   poses  : (n, 3, 4) camera-to-world
//   images : (n, h, w, 3)
//   K      : (3, 3) intrinsics
//   out    : (n*h*w, 3, 3) rows of [origin, direction, rgb]
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

// Generate the identity permutation then Fisher-Yates it (sequential — the
// permutation is tiny next to the payload; the payload gather is parallel).
std::vector<int64_t> make_permutation(int64_t n, uint64_t seed) {
  std::vector<int64_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  std::mt19937_64 rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    std::uniform_int_distribution<int64_t> dist(0, i);
    std::swap(perm[i], perm[dist(rng)]);
  }
  return perm;
}

void parallel_for(int64_t n, int threads, void (*fn)(int64_t, int64_t, void*),
                  void* ctx) {
  if (threads <= 1) {
    fn(0, n, ctx);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi, ctx);
  }
  for (auto& th : pool) th.join();
}

struct BuildCtx {
  const float* poses;
  const float* images;
  const float* K;
  int64_t n, h, w;
  float* out;
  const int64_t* perm;  // nullptr -> identity
};

// One output row: pixel (i=x, j=y) of image img (matches ops/rays.py
// get_rays_np: dir = [(i-cx)/fx, -(j-cy)/fy, -1] rotated by c2w; origin =
// c2w translation).
inline void write_row(const BuildCtx& c, int64_t flat, float* dst) {
  const int64_t hw = c.h * c.w;
  const int64_t img = flat / hw;
  const int64_t pix = flat % hw;
  const int64_t j = pix / c.w;  // row (y)
  const int64_t i = pix % c.w;  // col (x)

  const float fx = c.K[0], cx = c.K[2], fy = c.K[4], cy = c.K[5];
  const float dcx = (static_cast<float>(i) - cx) / fx;
  const float dcy = -(static_cast<float>(j) - cy) / fy;
  const float dcz = -1.0f;

  const float* p = c.poses + img * 12;  // (3,4) row-major
  // rotate: d_world[r] = R[r,0]*dcx + R[r,1]*dcy + R[r,2]*dcz
  for (int r = 0; r < 3; ++r) {
    dst[3 + r] = p[r * 4 + 0] * dcx + p[r * 4 + 1] * dcy + p[r * 4 + 2] * dcz;
    dst[r] = p[r * 4 + 3];  // origin
  }
  const float* rgb = c.images + (img * hw + pix) * 3;
  dst[6] = rgb[0];
  dst[7] = rgb[1];
  dst[8] = rgb[2];
}

void build_worker(int64_t lo, int64_t hi, void* vctx) {
  const BuildCtx& c = *static_cast<const BuildCtx*>(vctx);
  for (int64_t row = lo; row < hi; ++row) {
    const int64_t src = c.perm ? c.perm[row] : row;
    write_row(c, src, c.out + row * 9);
  }
}

struct ShuffleCtx {
  const float* data;
  float* out;
  int64_t row_floats;
  const int64_t* perm;
};

void shuffle_worker(int64_t lo, int64_t hi, void* vctx) {
  const ShuffleCtx& c = *static_cast<const ShuffleCtx*>(vctx);
  for (int64_t row = lo; row < hi; ++row) {
    std::memcpy(c.out + row * c.row_floats, c.data + c.perm[row] * c.row_floats,
                sizeof(float) * c.row_floats);
  }
}

}  // namespace

extern "C" {

void hn_build_ray_pool(const float* poses, const float* images, const float* K,
                       int64_t n, int64_t h, int64_t w, float* out,
                       uint64_t seed, int shuffle, int threads) {
  const int64_t rows = n * h * w;
  std::vector<int64_t> perm;
  BuildCtx ctx{poses, images, K, n, h, w, out, nullptr};
  if (shuffle) {
    perm = make_permutation(rows, seed);
    ctx.perm = perm.data();
  }
  parallel_for(rows, threads, build_worker, &ctx);
}

void hn_shuffle_rows(const float* data, float* out, int64_t n_rows,
                     int64_t row_floats, uint64_t seed, int threads) {
  std::vector<int64_t> perm = make_permutation(n_rows, seed);
  ShuffleCtx ctx{data, out, row_floats, perm.data()};
  parallel_for(n_rows, threads, shuffle_worker, &ctx);
}

}  // extern "C"
