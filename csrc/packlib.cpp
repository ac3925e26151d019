// Host-side packed-weight codec: the native analog of the reference's
// csrc pack/unpack utilities (csrc/ort_cuda dequant family +
// compress_weight.py bit manipulation), used on the checkpoint
// import/export path where multi-GB repacks are CPU-bound.
//
// All functions operate on row-major buffers. Threading: OpenMP-style
// manual chunking over std::thread (the image's g++ has no libgomp
// guarantee).
//
// Build: make -C csrc   (or qllm_tpu.native builds it on demand)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

template <typename F>
void parallel_for(int64_t n, F f) {
  int nt = hw_threads();
  if (n < 1024 || nt <= 1) {
    f(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([=] { f(lo, hi); });
  }
  for (auto &t : ts) t.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// 2/4/8-bit LSB-first field packing along axis 0 (K) of q[K, N]
// -> out[K/pf, N] (reference pack_on_row_fast_248bit semantics)
// ---------------------------------------------------------------------------
void pack_fields_rows(const int32_t *q, uint32_t *out, int64_t K, int64_t N,
                      int bits) {
  const int pf = 32 / bits;
  const int64_t rows = K / pf;
  parallel_for(rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      for (int64_t n = 0; n < N; ++n) {
        uint32_t w = 0;
        for (int j = 0; j < pf; ++j) {
          w |= (static_cast<uint32_t>(q[(r * pf + j) * N + n]) &
                ((1u << bits) - 1u))
               << (bits * j);
        }
        out[r * N + n] = w;
      }
    }
  });
}

void unpack_fields_rows(const uint32_t *p, int32_t *out, int64_t K, int64_t N,
                        int bits) {
  const int pf = 32 / bits;
  const int64_t rows = K / pf;
  const uint32_t mask = (1u << bits) - 1u;
  parallel_for(rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      for (int64_t n = 0; n < N; ++n) {
        uint32_t w = p[r * N + n];
        for (int j = 0; j < pf; ++j) {
          out[(r * pf + j) * N + n] =
              static_cast<int32_t>((w >> (bits * j)) & mask);
        }
      }
    }
  });
}

// ---------------------------------------------------------------------------
// odd-bit straddling bitstream along axis 0 (reference
// pack_on_row_fast_anybit): per column n, bit b of value k sits at
// bitstream position k*bits + b; words little-endian.
// q[K, N] -> out[K*bits/32, N]
// ---------------------------------------------------------------------------
void pack_bitstream_rows(const int32_t *q, uint32_t *out, int64_t K, int64_t N,
                         int bits) {
  const int64_t words = K * bits / 32;
  parallel_for(N, [=](int64_t lo, int64_t hi) {
    for (int64_t n = lo; n < hi; ++n) {
      for (int64_t w = 0; w < words; ++w) out[w * N + n] = 0;
      for (int64_t k = 0; k < K; ++k) {
        uint32_t v = static_cast<uint32_t>(q[k * N + n]) & ((1u << bits) - 1u);
        int64_t bitpos = k * bits;
        int64_t w = bitpos >> 5;
        int off = static_cast<int>(bitpos & 31);
        out[w * N + n] |= v << off;
        if (off + bits > 32) {
          out[(w + 1) * N + n] |= v >> (32 - off);
        }
      }
    }
  });
}

void unpack_bitstream_rows(const uint32_t *p, int32_t *out, int64_t K,
                           int64_t N, int bits) {
  const uint32_t mask = (1u << bits) - 1u;
  parallel_for(N, [=](int64_t lo, int64_t hi) {
    for (int64_t n = lo; n < hi; ++n) {
      for (int64_t k = 0; k < K; ++k) {
        int64_t bitpos = k * bits;
        int64_t w = bitpos >> 5;
        int off = static_cast<int>(bitpos & 31);
        uint64_t lo32 = p[w * N + n];
        uint64_t hi32 = (off + bits > 32) ? p[(w + 1) * N + n] : 0;
        uint64_t window = lo32 | (hi32 << 32);
        out[k * N + n] = static_cast<int32_t>((window >> off) & mask);
      }
    }
  });
}

// ---------------------------------------------------------------------------
// AWQ GEMM column interleave [0,2,4,6,1,3,5,7] applied along axis 1
// (quant_linear_awq.py reorder_int_tensor); inverse flag for import.
// ---------------------------------------------------------------------------
void awq_interleave_cols(const int32_t *q, int32_t *out, int64_t K, int64_t N,
                         int inverse) {
  static const int order[8] = {0, 2, 4, 6, 1, 3, 5, 7};
  parallel_for(K, [=](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      for (int64_t c = 0; c < N / 8; ++c) {
        for (int j = 0; j < 8; ++j) {
          int64_t a = c * 8 + j;
          int64_t b = c * 8 + order[j];
          if (inverse)
            out[k * N + b] = q[k * N + a];
          else
            out[k * N + a] = q[k * N + b];
        }
      }
    }
  });
}

int packlib_version() { return 1; }

}  // extern "C"
