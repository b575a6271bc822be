// Native weight packer: QTPU interleave + AutoAWQ GEMM layout conversion.
//
// The TPU-native replacement for the reference's offline packing step
// (quick/awq/modules/linear/quick.py:89-150 runs an O(IC*OC) Python loop;
// SURVEY.md flags it as the slow offline stage). Single-pass, row-wise
// streaming versions of the transforms in quick_tpu/quantize/packing.py —
// bit-identical to the numpy implementations (property-tested against them).
//
// Exposed as plain C symbols for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 packer.cpp -o libqtpu_packer.so

#include <cstdint>
#include <cstring>

extern "C" {

// q [K, N] uint8 codes (0..15) -> out [K/8, N] int32, QTPU j-major layout:
// word (g*slab + k8, n) nibble j = q[g*G + j*slab + k8, n], slab = G/8.
void qtpu_pack(const uint8_t* q, int32_t* out, int64_t K, int64_t N,
               int64_t G) {
  const int64_t slab = G / 8;
  const int64_t ngroups = K / G;
  for (int64_t g = 0; g < ngroups; ++g) {
    for (int64_t k8 = 0; k8 < slab; ++k8) {
      uint32_t* orow =
          reinterpret_cast<uint32_t*>(out) + (g * slab + k8) * N;
      std::memset(orow, 0, sizeof(uint32_t) * N);
      for (int j = 0; j < 8; ++j) {
        const uint8_t* src = q + (g * G + j * slab + k8) * N;
        const uint32_t shift = 4u * j;
        for (int64_t n = 0; n < N; ++n) {
          orow[n] |= (static_cast<uint32_t>(src[n]) & 0xFu) << shift;
        }
      }
    }
  }
}

// Inverse of qtpu_pack.
void qtpu_unpack(const int32_t* in, uint8_t* out, int64_t K, int64_t N,
                 int64_t G) {
  const int64_t slab = G / 8;
  const int64_t ngroups = K / G;
  for (int64_t g = 0; g < ngroups; ++g) {
    for (int64_t k8 = 0; k8 < slab; ++k8) {
      const uint32_t* irow =
          reinterpret_cast<const uint32_t*>(in) + (g * slab + k8) * N;
      for (int j = 0; j < 8; ++j) {
        uint8_t* dst = out + (g * G + j * slab + k8) * N;
        const uint32_t shift = 4u * j;
        for (int64_t n = 0; n < N; ++n) {
          dst[n] = static_cast<uint8_t>((irow[n] >> shift) & 0xFu);
        }
      }
    }
  }
}

// AWQ GEMM order: nibble j of word (k, n8) holds column n8*8 + ORDER[j]
// with ORDER = {0,2,4,6,1,3,5,7} (reference linear/gemm.py:116).
static const int AWQ_ORDER[8] = {0, 2, 4, 6, 1, 3, 5, 7};
static const int AWQ_REVERSE[8] = {0, 4, 1, 5, 2, 6, 3, 7};

// q [K, N] codes -> out [K, N/8] int32 (AWQ GEMM layout).
void awq_gemm_pack(const uint8_t* q, int32_t* out, int64_t K, int64_t N) {
  const int64_t N8 = N / 8;
  for (int64_t k = 0; k < K; ++k) {
    const uint8_t* row = q + k * N;
    uint32_t* orow = reinterpret_cast<uint32_t*>(out) + k * N8;
    for (int64_t n8 = 0; n8 < N8; ++n8) {
      uint32_t w = 0;
      for (int j = 0; j < 8; ++j) {
        w |= (static_cast<uint32_t>(row[n8 * 8 + AWQ_ORDER[j]]) & 0xFu)
             << (4u * j);
      }
      orow[n8] = w;
    }
  }
}

// out [K, N/8] int32 (AWQ GEMM) -> q [K, N] codes.
void awq_gemm_unpack(const int32_t* in, uint8_t* out, int64_t K, int64_t N8) {
  for (int64_t k = 0; k < K; ++k) {
    const uint32_t* irow = reinterpret_cast<const uint32_t*>(in) + k * N8;
    uint8_t* row = out + k * N8 * 8;
    for (int64_t n8 = 0; n8 < N8; ++n8) {
      const uint32_t w = irow[n8];
      // nibble j is column AWQ_ORDER[j]; inverse via AWQ_REVERSE
      for (int j = 0; j < 8; ++j) {
        row[n8 * 8 + j] =
            static_cast<uint8_t>((w >> (4u * AWQ_REVERSE[j])) & 0xFu);
      }
    }
  }
}

// Fused AutoAWQ GEMM -> QTPU repack for one tensor (skips the [K, N]
// intermediate): in_q [K, N/8] AWQ words -> out [K/8, N] QTPU words.
void awq_gemm_to_qtpu(const int32_t* in_q, int32_t* out, int64_t K,
                      int64_t N, int64_t G) {
  const int64_t slab = G / 8;
  const int64_t N8 = N / 8;
  const int64_t ngroups = K / G;
  for (int64_t g = 0; g < ngroups; ++g) {
    for (int64_t k8 = 0; k8 < slab; ++k8) {
      uint32_t* orow =
          reinterpret_cast<uint32_t*>(out) + (g * slab + k8) * N;
      std::memset(orow, 0, sizeof(uint32_t) * N);
      for (int j = 0; j < 8; ++j) {
        const uint32_t* irow = reinterpret_cast<const uint32_t*>(in_q) +
                               (g * G + j * slab + k8) * N8;
        const uint32_t shift = 4u * j;
        for (int64_t n8 = 0; n8 < N8; ++n8) {
          const uint32_t w = irow[n8];
          for (int c = 0; c < 8; ++c) {
            const uint32_t nib = (w >> (4u * AWQ_REVERSE[c])) & 0xFu;
            orow[n8 * 8 + c] |= nib << shift;
          }
        }
      }
    }
  }
}

}  // extern "C"
