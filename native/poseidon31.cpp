// Native host kernels for the M31 Poseidon2-16 permutation.
//
// The TPU compute path runs the jit/XLA implementation
// (recursive_stwo_tpu/core/poseidon2.py); this library accelerates the
// HOST-side runtime — eager circuit building (gadgets/poseidon.py), hint
// expansion and Merkle replay (verifier/hints.py) — where per-call numpy
// overhead dominates.  Round structure and constants mirror
// core/poseidon2.py (reference: primitives/poseidon31/src/implementation.rs).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libposeidon31.so poseidon31.cpp

#include <cstdint>
#include <cstring>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr uint32_t P = 2147483647u;

inline uint32_t m_add(uint32_t a, uint32_t b) {
    uint32_t s = a + b;  // a, b < P so no u32 overflow
    return s >= P ? s - P : s;
}

inline uint32_t m_mul(uint32_t a, uint32_t b) {
    uint64_t t = (uint64_t)a * b;
    uint32_t lo = (uint32_t)(t & P);
    uint32_t hi = (uint32_t)(t >> 31);
    uint32_t s = lo + hi;
    return s >= P ? s - P : s;
}

inline uint32_t m_pow5(uint32_t a) {
    uint32_t a2 = m_mul(a, a);
    return m_mul(m_mul(a2, a2), a);
}

const uint32_t MAT_DIAG16_M_1[16] = {
    3, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
    32768, 65536,
};

const uint32_t FIRST_FOUR_ROUND_RC[4][16] = {
    {0x768bab52, 0x70e0ab7d, 0x3d266c8a, 0x6da42045, 0x600fef22, 0x41dace6b,
     0x64f9bdd4, 0x5d42d4fe, 0x76b1516d, 0x6fc9a717, 0x70ac4fb6, 0x00194ef6,
     0x22b644e2, 0x1f7916d5, 0x47581be2, 0x2710a123},
    {0x6284e867, 0x018d3afe, 0x5df99ef3, 0x4c1e467b, 0x566f6abc, 0x2994e427,
     0x538a6d42, 0x5d7bf2cf, 0x7fda2dab, 0x0fd854c4, 0x46922fca, 0x3d7763a1,
     0x19fd05ca, 0x0a4bbb43, 0x15075851, 0x3d903d76},
    {0x2d290ff7, 0x40809fa0, 0x59dac6ec, 0x127927a2, 0x6bbf0ea0, 0x0294140f,
     0x24742976, 0x6e84c081, 0x22484f4a, 0x354cae59, 0x0453ffe1, 0x3f47a3cc,
     0x0088204e, 0x6066e109, 0x3b7c4b80, 0x6b55665d},
    {0x3bc4b897, 0x735bf378, 0x508daf42, 0x1884fc2b, 0x7214f24c, 0x7498be0a,
     0x1a60e640, 0x3303f928, 0x29b46376, 0x5c96bb68, 0x65d097a5, 0x1d358e9f,
     0x4a9a9017, 0x4724cf76, 0x347af70f, 0x1e77e59a},
};

const uint32_t PARTIAL_ROUNDS_RC[14] = {
    0x7f7ec4bf, 0x0421926f, 0x5198e669, 0x34db3148, 0x4368bafd, 0x66685c7f,
    0x78d3249a, 0x60187881, 0x76dad67a, 0x0690b437, 0x1ea95311, 0x40e5369a,
    0x38f103fc, 0x1d226a21,
};

const uint32_t LAST_FOUR_ROUNDS_RC[4][16] = {
    {0x57090613, 0x1fa42108, 0x17bbef50, 0x1ff7e11c, 0x047b24ca, 0x4e140275,
     0x4fa086f5, 0x079b309c, 0x1159bd47, 0x6d37e4e5, 0x075d8dce, 0x12121ca0,
     0x7f6a7c40, 0x68e182ba, 0x5493201b, 0x0444a80e},
    {0x0064f4c6, 0x6467abe6, 0x66975762, 0x2af68f9b, 0x345b33be, 0x1b70d47f,
     0x053db717, 0x381189cb, 0x43b915f8, 0x20df3694, 0x0f459d26, 0x77a0e97b,
     0x2f73e739, 0x1876c2f9, 0x65a0e29a, 0x4cabefbe},
    {0x5abd1268, 0x4d34a760, 0x12771799, 0x69a0c9ac, 0x39091e55, 0x7f611cd0,
     0x3af055da, 0x7ac0bbdf, 0x6e0f3a24, 0x41e3b6f7, 0x49b3756d, 0x568bc538,
     0x20c079d8, 0x1701c72c, 0x7670dc6c, 0x5a439035},
    {0x7c93e00e, 0x561fbb4d, 0x1178907b, 0x02737406, 0x32fb24f1, 0x6323b60a,
     0x6ab12418, 0x42c99cea, 0x155a0b97, 0x53d1c6aa, 0x2bd20347, 0x279b3d73,
     0x4f5f3c70, 0x0245af6c, 0x238359d3, 0x49966a59},
};

inline void apply_m4(uint32_t* x) {
    uint32_t t0 = m_add(x[0], x[1]);
    uint32_t t1 = m_add(x[2], x[3]);
    uint32_t t2 = m_add(m_add(x[1], x[1]), t1);
    uint32_t t3 = m_add(m_add(x[3], x[3]), t0);
    uint32_t t4 = m_add(m_add(m_add(t1, t1), m_add(t1, t1)), t3);
    uint32_t t5 = m_add(m_add(m_add(t0, t0), m_add(t0, t0)), t2);
    x[0] = m_add(t3, t5);
    x[1] = t5;
    x[2] = m_add(t2, t4);
    x[3] = t4;
}

inline void mds16(uint32_t* s) {
    uint32_t t[16];
    std::memcpy(t, s, sizeof(t));
    for (int g = 0; g < 4; ++g) apply_m4(t + 4 * g);
    uint32_t sums[4];
    for (int j = 0; j < 4; ++j) {
        sums[j] = m_add(m_add(t[j], t[4 + j]), m_add(t[8 + j], t[12 + j]));
    }
    for (int i = 0; i < 16; ++i) s[i] = m_add(t[i], sums[i & 3]);
}

inline void full_round(uint32_t* s, const uint32_t* rc) {
    for (int i = 0; i < 16; ++i) s[i] = m_pow5(m_add(s[i], rc[i]));
    mds16(s);
}

inline void partial_round(uint32_t* s, uint32_t rc) {
    s[0] = m_pow5(m_add(s[0], rc));
    uint32_t total = 0;
    for (int i = 0; i < 16; ++i) total = m_add(total, s[i]);
    for (int i = 0; i < 16; ++i)
        s[i] = m_add(total, m_mul(s[i], MAT_DIAG16_M_1[i]));
}

inline void permute_one(uint32_t* s) {
    mds16(s);
    for (int r = 0; r < 4; ++r) full_round(s, FIRST_FOUR_ROUND_RC[r]);
    for (int r = 0; r < 14; ++r) partial_round(s, PARTIAL_ROUNDS_RC[r]);
    for (int r = 0; r < 4; ++r) full_round(s, LAST_FOUR_ROUNDS_RC[r]);
}


// ---------------------------------------------------------------------------
// AVX-512 16-way vertical permutation: one __m512i holds lane j of 16
// different states; all field ops become elementwise vector ops.  Used by
// the batch/tree entry points below (the hypervisor traps SHA-NI but runs
// AVX-512 natively — see native/sha256.cpp).
// ---------------------------------------------------------------------------

#if defined(__AVX512F__) && defined(__AVX512BW__)
#define POS_AVX512 1

namespace v16 {

static const __m512i VP = _mm512_set1_epi32((int)2147483647u);

static inline __m512i v_add(__m512i a, __m512i b) {
    __m512i s = _mm512_add_epi32(a, b);
    __mmask16 ge = _mm512_cmpge_epu32_mask(s, VP);
    return _mm512_mask_sub_epi32(s, ge, s, VP);
}

static inline __m512i v_mul(__m512i a, __m512i b) {
    const __m512i P64 = _mm512_set1_epi64((long long)2147483647u);
    __m512i pe = _mm512_mul_epu32(a, b);
    __m512i po = _mm512_mul_epu32(_mm512_srli_epi64(a, 32),
                                  _mm512_srli_epi64(b, 32));
    __m512i se = _mm512_add_epi64(_mm512_and_si512(pe, P64),
                                  _mm512_srli_epi64(pe, 31));
    __m512i so = _mm512_add_epi64(_mm512_and_si512(po, P64),
                                  _mm512_srli_epi64(po, 31));
    __m512i r = _mm512_or_si512(se, _mm512_slli_epi64(so, 32));
    __mmask16 ge = _mm512_cmpge_epu32_mask(r, VP);
    return _mm512_mask_sub_epi32(r, ge, r, VP);
}

static inline __m512i v_pow5(__m512i a) {
    __m512i a2 = v_mul(a, a);
    return v_mul(v_mul(a2, a2), a);
}

static inline void v_m4(__m512i* x) {
    __m512i t0 = v_add(x[0], x[1]);
    __m512i t1 = v_add(x[2], x[3]);
    __m512i t2 = v_add(v_add(x[1], x[1]), t1);
    __m512i t3 = v_add(v_add(x[3], x[3]), t0);
    __m512i t4 = v_add(v_add(v_add(t1, t1), v_add(t1, t1)), t3);
    __m512i t5 = v_add(v_add(v_add(t0, t0), v_add(t0, t0)), t2);
    x[0] = v_add(t3, t5);
    x[1] = t5;
    x[2] = v_add(t2, t4);
    x[3] = t4;
}

static inline void v_mds16(__m512i* s) {
    __m512i t[16];
    for (int i = 0; i < 16; ++i) t[i] = s[i];
    for (int g = 0; g < 4; ++g) v_m4(t + 4 * g);
    __m512i sums[4];
    for (int j = 0; j < 4; ++j)
        sums[j] = v_add(v_add(t[j], t[4 + j]), v_add(t[8 + j], t[12 + j]));
    for (int i = 0; i < 16; ++i) s[i] = v_add(t[i], sums[i & 3]);
}

static inline void v_permute(__m512i* s) {
    v_mds16(s);
    for (int r = 0; r < 4; ++r) {
        for (int i = 0; i < 16; ++i)
            s[i] = v_pow5(v_add(s[i], _mm512_set1_epi32(
                (int)FIRST_FOUR_ROUND_RC[r][i])));
        v_mds16(s);
    }
    for (int r = 0; r < 14; ++r) {
        s[0] = v_pow5(v_add(s[0], _mm512_set1_epi32(
            (int)PARTIAL_ROUNDS_RC[r])));
        __m512i total = s[0];
        for (int i = 1; i < 16; ++i) total = v_add(total, s[i]);
        for (int i = 0; i < 16; ++i)
            s[i] = v_add(total, v_mul(s[i], _mm512_set1_epi32(
                (int)MAT_DIAG16_M_1[i])));
    }
    for (int r = 0; r < 4; ++r) {
        for (int i = 0; i < 16; ++i)
            s[i] = v_pow5(v_add(s[i], _mm512_set1_epi32(
                (int)LAST_FOUR_ROUNDS_RC[r][i])));
        v_mds16(s);
    }
}

static const __m512i STRIDE16 = _mm512_setr_epi32(
    0, 16, 32, 48, 64, 80, 96, 112, 128, 144, 160, 176, 192, 208, 224, 240);

// load lane j of 16 consecutive row-major states (row stride `stride` u32)
static inline __m512i load_lane(const uint32_t* base, int j, int stride) {
    __m512i idx = _mm512_mullo_epi32(
        _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                          15),
        _mm512_set1_epi32(stride));
    idx = _mm512_add_epi32(idx, _mm512_set1_epi32(j));
    return _mm512_i32gather_epi32(idx, (const int*)base, 4);
}

static inline void store_lane(uint32_t* base, int j, int stride, __m512i v) {
    __m512i idx = _mm512_mullo_epi32(
        _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                          15),
        _mm512_set1_epi32(stride));
    idx = _mm512_add_epi32(idx, _mm512_set1_epi32(j));
    _mm512_i32scatter_epi32((int*)base, idx, v, 4);
}

}  // namespace v16
#endif  // POS_AVX512

}  // namespace

extern "C" {

// In-place Poseidon2 permutation of n contiguous 16-lane u32 states.
void poseidon2_permute_batch(uint32_t* states, uint64_t n) {
#ifdef POS_AVX512
    int64_t n16 = (int64_t)(n / 16);
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n16; ++g) {
        uint32_t* base = states + (uint64_t)g * 256;
        __m512i s[16];
        for (int j = 0; j < 16; ++j) s[j] = v16::load_lane(base, j, 16);
        v16::v_permute(s);
        for (int j = 0; j < 16; ++j) v16::store_lane(base, j, 16, s[j]);
    }
    for (uint64_t i = (uint64_t)n16 * 16; i < n; ++i)
        permute_one(states + 16 * i);
#else
    for (uint64_t i = 0; i < n; ++i) permute_one(states + 16 * i);
#endif
}

// Merkle leaf level (commit._hash_leaf_level semantics): columns
// (n_cols, N) C-order; out (N, 8) digests.
void poseidon2_leaf_level(const uint32_t* cols, uint64_t n_cols, uint64_t N,
                          uint32_t* out) {
    uint64_t n_chunks = (n_cols + 7) / 8;
#ifdef POS_AVX512
    int64_t n16 = (int64_t)(N / 16);
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n16; ++g) {
        uint64_t i0 = (uint64_t)g * 16;
        __m512i digest[8];
        for (int j = 0; j < 8; ++j) digest[j] = _mm512_setzero_si512();
        for (uint64_t c = 0; c < n_chunks; ++c) {
            __m512i s[16];
            for (int j = 0; j < 8; ++j) {
                uint64_t ci = c * 8 + (uint64_t)j;
                s[j] = ci < n_cols
                           ? _mm512_loadu_si512((const void*)(cols + ci * N + i0))
                           : _mm512_setzero_si512();
                s[8 + j] = digest[j];
            }
            v16::v_permute(s);
            for (int j = 0; j < 8; ++j) digest[j] = s[8 + j];
        }
        __m512i s[16];
        for (int j = 0; j < 8; ++j) {
            s[j] = _mm512_setzero_si512();
            s[8 + j] = digest[j];
        }
        v16::v_permute(s);
        for (int j = 0; j < 8; ++j)
            v16::store_lane(out + i0 * 8, j, 8, s[j]);
    }
    uint64_t rem0 = (uint64_t)n16 * 16;
#else
    uint64_t rem0 = 0;
#endif
    for (uint64_t i = rem0; i < N; ++i) {
        uint32_t digest[8] = {0, 0, 0, 0, 0, 0, 0, 0};
        uint32_t s[16];
        for (uint64_t c = 0; c < n_chunks; ++c) {
            for (int j = 0; j < 8; ++j) {
                uint64_t ci = c * 8 + (uint64_t)j;
                s[j] = ci < n_cols ? cols[ci * N + i] : 0;
                s[8 + j] = digest[j];
            }
            permute_one(s);
            for (int j = 0; j < 8; ++j) digest[j] = s[8 + j];
        }
        for (int j = 0; j < 8; ++j) {
            s[j] = 0;
            s[8 + j] = digest[j];
        }
        permute_one(s);
        for (int j = 0; j < 8; ++j) out[i * 8 + j] = s[j];
    }
}

// Merkle inner level (commit._hash_node_level semantics): children
// (2N, 8) C-order, optional columns (n_cols, N); out (N, 8).
void poseidon2_node_level(const uint32_t* children, const uint32_t* cols,
                          uint64_t n_cols, uint64_t N, uint32_t* out) {
    uint64_t n_chunks = (n_cols + 7) / 8;
#ifdef POS_AVX512
    int64_t n16 = (int64_t)(N / 16);
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n16; ++g) {
        uint64_t i0 = (uint64_t)g * 16;
        __m512i s[16];
        const uint32_t* ch = children + i0 * 16;
        for (int j = 0; j < 16; ++j) s[j] = v16::load_lane(ch, j, 16);
        v16::v_permute(s);
        __m512i h[8];
        for (int j = 0; j < 8; ++j) h[j] = s[j];
        if (n_cols) {
            __m512i digest[8];
            for (int j = 0; j < 8; ++j) digest[j] = _mm512_setzero_si512();
            for (uint64_t c = 0; c < n_chunks; ++c) {
                __m512i t[16];
                for (int j = 0; j < 8; ++j) {
                    uint64_t ci = c * 8 + (uint64_t)j;
                    t[j] = ci < n_cols ? _mm512_loadu_si512(
                                             (const void*)(cols + ci * N + i0))
                                       : _mm512_setzero_si512();
                    t[8 + j] = digest[j];
                }
                v16::v_permute(t);
                for (int j = 0; j < 8; ++j) digest[j] = t[8 + j];
            }
            __m512i t[16];
            for (int j = 0; j < 8; ++j) {
                t[j] = h[j];
                t[8 + j] = digest[j];
            }
            v16::v_permute(t);
            for (int j = 0; j < 8; ++j) h[j] = t[j];
        }
        for (int j = 0; j < 8; ++j)
            v16::store_lane(out + i0 * 8, j, 8, h[j]);
    }
    uint64_t rem0 = (uint64_t)n16 * 16;
#else
    uint64_t rem0 = 0;
#endif
    for (uint64_t i = rem0; i < N; ++i) {
        uint32_t s[16];
        std::memcpy(s, children + i * 16, 64);
        permute_one(s);
        uint32_t h[8];
        std::memcpy(h, s, 32);
        if (n_cols) {
            uint32_t digest[8] = {0, 0, 0, 0, 0, 0, 0, 0};
            for (uint64_t c = 0; c < n_chunks; ++c) {
                for (int j = 0; j < 8; ++j) {
                    uint64_t ci = c * 8 + (uint64_t)j;
                    s[j] = ci < n_cols ? cols[ci * N + i] : 0;
                    s[8 + j] = digest[j];
                }
                permute_one(s);
                for (int j = 0; j < 8; ++j) digest[j] = s[8 + j];
            }
            std::memcpy(s, h, 32);
            std::memcpy(s + 8, digest, 32);
            permute_one(s);
            std::memcpy(h, s, 32);
        }
        std::memcpy(out + i * 8, h, 32);
    }
}

// Sponge absorb: for each of n rows, digest = permute(op || digest)[8:].
// ops: n x 8, digest: 8 (updated in place sequentially).
void poseidon2_digest_chain(const uint32_t* ops, uint64_t n, uint32_t* digest) {
    uint32_t s[16];
    for (uint64_t i = 0; i < n; ++i) {
        std::memcpy(s, ops + 8 * i, 8 * sizeof(uint32_t));
        std::memcpy(s + 8, digest, 8 * sizeof(uint32_t));
        permute_one(s);
        std::memcpy(digest, s + 8, 8 * sizeof(uint32_t));
    }
}

// PoW grind: find the smallest nonce >= start whose 22/21/21-limb mix
// leaves digest limb 0 with `bits` low zero bits.  Returns the nonce.
// AVX-512 path scans 16 nonces per permutation round (the scalar scan
// was the dominant cost of high-pow prover levels).
uint64_t poseidon2_grind(const uint32_t* digest, uint32_t bits,
                         uint64_t start) {
    const uint32_t mask = (bits >= 32) ? 0xffffffffu : ((1u << bits) - 1u);
#ifdef POS_AVX512
    {
        const __m512i maskv = _mm512_set1_epi32((int)mask);
        alignas(64) uint32_t l0[16], l1[16], l2[16];
        for (uint64_t base = start;; base += 16) {
            for (int j = 0; j < 16; ++j) {
                uint64_t n = base + (uint64_t)j;
                l0[j] = (uint32_t)(n & ((1u << 22) - 1));
                l1[j] = (uint32_t)((n >> 22) & ((1u << 21) - 1));
                l2[j] = (uint32_t)((n >> 43) & ((1u << 21) - 1));
            }
            __m512i s[16];
            s[0] = _mm512_load_si512((const void*)l0);
            s[1] = _mm512_load_si512((const void*)l1);
            s[2] = _mm512_load_si512((const void*)l2);
            for (int j = 3; j < 8; ++j) s[j] = _mm512_setzero_si512();
            for (int j = 0; j < 8; ++j)
                s[8 + j] = _mm512_set1_epi32((int)digest[j]);
            v16::v_permute(s);
            __mmask16 hit = _mm512_cmpeq_epu32_mask(
                _mm512_and_si512(s[8], maskv), _mm512_setzero_si512());
            if (hit) return base + (uint64_t)__builtin_ctz((unsigned)hit);
        }
    }
#else
    uint64_t nonce = start;
    for (;;) {
        uint32_t s[16];
        s[0] = (uint32_t)(nonce & ((1u << 22) - 1));
        s[1] = (uint32_t)((nonce >> 22) & ((1u << 21) - 1));
        s[2] = (uint32_t)((nonce >> 43) & ((1u << 21) - 1));
        for (int i = 3; i < 8; ++i) s[i] = 0;
        std::memcpy(s + 8, digest, 8 * sizeof(uint32_t));
        permute_one(s);
        if ((s[8] & mask) == 0) return nonce;
        ++nonce;
    }
#endif
}

}  // extern "C"
