// Native latent sampler: numpy-legacy-exact gaussian generation, threaded.
//
// The decomposition pipeline's host-side cost is dominated by
// np.random.RandomState(seed).standard_normal(...) — the reference's seeded
// draw discipline (models/wrappers.py:167-179) that the caches' bit-exact
// reproducibility depends on.  numpy's legacy path is single-threaded
// (~100M doubles/s); since every batch uses an independent RandomState(seed),
// batches are embarrassingly parallel across threads once the seed sequence
// is known.
//
// This file reimplements exactly:
//   * MT19937 with init_genrand seeding (numpy RandomState(int32 seed));
//   * random_double: ((a>>5)*2^26 + (b>>6)) / 2^53  from two 32-bit draws;
//   * legacy_gauss: polar Box-Muller, returning f*x2 first and caching f*x1
//     (numpy random/src/legacy/legacy-distributions.c semantics);
// and fills one float32 (or float64) buffer per seed on a thread pool.
// Bit-exactness vs numpy is asserted by tests/test_native_rand.py.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct MT19937 {
  static constexpr int N = 624;
  static constexpr int M = 397;
  uint32_t mt[N];
  int mti;

  explicit MT19937(uint32_t s) {
    mt[0] = s;
    for (mti = 1; mti < N; mti++) {
      mt[mti] = 1812433253u * (mt[mti - 1] ^ (mt[mti - 1] >> 30)) +
                static_cast<uint32_t>(mti);
    }
  }

  uint32_t next32() {
    constexpr uint32_t UPPER = 0x80000000u, LOWER = 0x7fffffffu;
    constexpr uint32_t MAG[2] = {0u, 0x9908b0dfu};
    if (mti >= N) {
      int kk;
      for (kk = 0; kk < N - M; kk++) {
        uint32_t y = (mt[kk] & UPPER) | (mt[kk + 1] & LOWER);
        mt[kk] = mt[kk + M] ^ (y >> 1) ^ MAG[y & 1u];
      }
      for (; kk < N - 1; kk++) {
        uint32_t y = (mt[kk] & UPPER) | (mt[kk + 1] & LOWER);
        mt[kk] = mt[kk + (M - N)] ^ (y >> 1) ^ MAG[y & 1u];
      }
      uint32_t y = (mt[N - 1] & UPPER) | (mt[0] & LOWER);
      mt[N - 1] = mt[M - 1] ^ (y >> 1) ^ MAG[y & 1u];
      mti = 0;
    }
    uint32_t y = mt[mti++];
    y ^= y >> 11;
    y ^= (y << 7) & 0x9d2c5680u;
    y ^= (y << 15) & 0xefc60000u;
    y ^= y >> 18;
    return y;
  }

  double next_double() {
    uint32_t a = next32() >> 5, b = next32() >> 6;
    return (a * 67108864.0 + b) / 9007199254740992.0;
  }
};

struct LegacyGauss {
  MT19937 rng;
  double cached = 0.0;
  bool has_cached = false;

  explicit LegacyGauss(uint32_t seed) : rng(seed) {}

  double next() {
    if (has_cached) {
      has_cached = false;
      return cached;
    }
    double x1, x2, r2;
    do {
      x1 = 2.0 * rng.next_double() - 1.0;
      x2 = 2.0 * rng.next_double() - 1.0;
      r2 = x1 * x1 + x2 * x2;
    } while (r2 >= 1.0 || r2 == 0.0);
    const double f = std::sqrt(-2.0 * std::log(r2) / r2);
    cached = f * x1;      // numpy caches f*x1 ...
    has_cached = true;
    return f * x2;        // ... and returns f*x2 first
  }
};

void fill_one(uint32_t seed, int64_t n, float* out) {
  LegacyGauss g(seed);
  for (int64_t i = 0; i < n; i++) out[i] = static_cast<float>(g.next());
}

void fill_one_f64(uint32_t seed, int64_t n, double* out) {
  LegacyGauss g(seed);
  for (int64_t i = 0; i < n; i++) out[i] = g.next();
}

}  // namespace

extern "C" {

// out: [n_batches * n_per] float32; batch b uses seeds[b], fills
// out[b*n_per : (b+1)*n_per].  Threaded over batches.
void fastrand_normal_batches(const uint32_t* seeds, int n_batches,
                             int64_t n_per, float* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= n_batches) break;
      fill_one(seeds[b], n_per, out + static_cast<int64_t>(b) * n_per);
    }
  };
  std::vector<std::thread> threads;
  int spawn = n_threads < n_batches ? n_threads : n_batches;
  threads.reserve(spawn);
  for (int i = 0; i < spawn; i++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Single draw, float64 — matches RandomState(seed).standard_normal(n) bits.
void fastrand_normal_f64(uint32_t seed, int64_t n, double* out) {
  fill_one_f64(seed, n, out);
}

}  // extern "C"
