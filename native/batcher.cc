// Native epoch-shuffled minibatcher.
//
// TPU-native re-design of the reference's host-side DataSet
// (onofftf/main.py:66-133). The numpy version physically re-shuffles the
// full (N, D) arrays at every epoch boundary (two O(N·D) copies) and slices
// batches from them; here the data stays put and only an int64 index
// permutation is Fisher-Yates-shuffled — each batch is one O(B·D) gather
// with epoch wraparound, so staging K batches for a lax.scan block costs
// exactly the bytes of the block. Exposed to Python over a C ABI via ctypes
// (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Batcher {
  const double* x;  // borrowed, owned by the caller (numpy array)
  const double* y;
  int64_t n;
  int64_t dx;
  int64_t dy;
  std::vector<int64_t> perm;
  int64_t pos = 0;
  int64_t epochs = 0;
  std::mt19937_64 rng;

  Batcher(const double* x_, const double* y_, int64_t n_, int64_t dx_,
          int64_t dy_, uint64_t seed)
      : x(x_), y(y_), n(n_), dx(dx_), dy(dy_), perm(n_), rng(seed) {
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    shuffle();
  }

  void shuffle() {
    std::shuffle(perm.begin(), perm.end(), rng);
  }

  // Fill one batch of `b` rows into out_x (b*dx) and out_y (b*dy),
  // wrapping into a freshly shuffled next epoch when the current one runs
  // out (reference DataSet.next_batch wraparound-concat semantics).
  void next(int64_t b, double* out_x, double* out_y) {
    int64_t filled = 0;
    while (filled < b) {
      if (pos == n) {
        shuffle();
        pos = 0;
        ++epochs;
      }
      int64_t take = std::min(b - filled, n - pos);
      for (int64_t i = 0; i < take; ++i) {
        const int64_t r = perm[pos + i];
        std::memcpy(out_x + (filled + i) * dx, x + r * dx, sizeof(double) * dx);
        std::memcpy(out_y + (filled + i) * dy, y + r * dy, sizeof(double) * dy);
      }
      pos += take;
      filled += take;
    }
  }

  // Stage k batches contiguously: out_x is (k*b*dx), out_y is (k*b*dy).
  void next_block(int64_t b, int64_t k, double* out_x, double* out_y) {
    for (int64_t j = 0; j < k; ++j) {
      next(b, out_x + j * b * dx, out_y + j * b * dy);
    }
  }

  // Advance the stream past k batches of size b without copying any rows —
  // used to fast-forward to a checkpointed step on resume so the restored
  // run sees exactly the batches the original run would have.
  void skip(int64_t b, int64_t k) {
    int64_t remaining = b * k;
    while (remaining > 0) {
      if (pos == n) {
        shuffle();
        pos = 0;
        ++epochs;
      }
      const int64_t take = std::min(remaining, n - pos);
      pos += take;
      remaining -= take;
    }
  }
};

}  // namespace

extern "C" {

void* zigp_batcher_create(const double* x, const double* y, int64_t n,
                          int64_t dx, int64_t dy, uint64_t seed) {
  return new Batcher(x, y, n, dx, dy, seed);
}

void zigp_batcher_next(void* handle, int64_t batch, double* out_x,
                       double* out_y) {
  static_cast<Batcher*>(handle)->next(batch, out_x, out_y);
}

void zigp_batcher_next_block(void* handle, int64_t batch, int64_t k,
                             double* out_x, double* out_y) {
  static_cast<Batcher*>(handle)->next_block(batch, k, out_x, out_y);
}

void zigp_batcher_skip(void* handle, int64_t batch, int64_t k) {
  static_cast<Batcher*>(handle)->skip(batch, k);
}

int64_t zigp_batcher_epochs(void* handle) {
  return static_cast<Batcher*>(handle)->epochs;
}

void zigp_batcher_destroy(void* handle) {
  delete static_cast<Batcher*>(handle);
}

}  // extern "C"
