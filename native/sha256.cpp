// Native SHA-256 host kernels for the framework's SHA-256 Merkle/channel
// flavors (see recursive_stwo_tpu/verifier/sha256_merkle.py for the node
// rules and core/sha256.py for the word/padding conventions these must
// match bit-for-bit).
//
// Messages are arrays of uint32 words (big-endian word semantics, i.e.
// each uint32 IS the word value); padding appends 0x80000000, zero words,
// and the 64-bit bit length, exactly like core/sha256.sha256_words.
//
// Uses x86 SHA-NI when available (compiled with -march=native; this image
// exposes sha_ni), with a portable scalar fallback.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif


#if defined(__x86_64__)
#include <immintrin.h>
#endif
#if defined(__SHA__) && defined(__x86_64__)
#define HAVE_SHA_NI 1
#endif

static const uint32_t K256[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static const uint32_t H0[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                               0xa54ff53a, 0x510e527f, 0x9b05688c,
                               0x1f83d9ab, 0x5be0cd19};

#ifdef HAVE_SHA_NI
// One 64-byte block; state and block are uint32 word values (no byte
// shuffling needed — words are already the big-endian values).
static inline void compress_ni(uint32_t state[8], const uint32_t block[16]) {
    __m128i STATE0, STATE1, MSG, TMP;
    __m128i MSG0, MSG1, MSG2, MSG3;

    TMP = _mm_loadu_si128((const __m128i*)&state[0]);    // ABCD (A in lane0)
    STATE1 = _mm_loadu_si128((const __m128i*)&state[4]); // EFGH
    TMP = _mm_shuffle_epi32(TMP, 0xB1);                  // CDAB
    STATE1 = _mm_shuffle_epi32(STATE1, 0x1B);            // EFGH
    STATE0 = _mm_alignr_epi8(TMP, STATE1, 8);            // ABEF
    STATE1 = _mm_blend_epi16(STATE1, TMP, 0xF0);         // CDGH

    const __m128i ABEF_SAVE = STATE0;
    const __m128i CDGH_SAVE = STATE1;

#define QROUND(Ki, M)                                             \
    MSG = _mm_add_epi32(M, _mm_loadu_si128((const __m128i*)&K256[Ki])); \
    STATE1 = _mm_sha256rnds2_epu32(STATE1, STATE0, MSG);          \
    MSG = _mm_shuffle_epi32(MSG, 0x0E);                           \
    STATE0 = _mm_sha256rnds2_epu32(STATE0, STATE1, MSG);

    MSG0 = _mm_loadu_si128((const __m128i*)&block[0]);
    MSG1 = _mm_loadu_si128((const __m128i*)&block[4]);
    MSG2 = _mm_loadu_si128((const __m128i*)&block[8]);
    MSG3 = _mm_loadu_si128((const __m128i*)&block[12]);

    QROUND(0, MSG0);
    QROUND(4, MSG1);
    QROUND(8, MSG2);
    QROUND(12, MSG3);

    for (int i = 16; i < 64; i += 16) {
        MSG0 = _mm_sha256msg1_epu32(MSG0, MSG1);
        TMP = _mm_alignr_epi8(MSG3, MSG2, 4);
        MSG0 = _mm_add_epi32(MSG0, TMP);
        MSG0 = _mm_sha256msg2_epu32(MSG0, MSG3);
        QROUND(i, MSG0);

        MSG1 = _mm_sha256msg1_epu32(MSG1, MSG2);
        TMP = _mm_alignr_epi8(MSG0, MSG3, 4);
        MSG1 = _mm_add_epi32(MSG1, TMP);
        MSG1 = _mm_sha256msg2_epu32(MSG1, MSG0);
        QROUND(i + 4, MSG1);

        MSG2 = _mm_sha256msg1_epu32(MSG2, MSG3);
        TMP = _mm_alignr_epi8(MSG1, MSG0, 4);
        MSG2 = _mm_add_epi32(MSG2, TMP);
        MSG2 = _mm_sha256msg2_epu32(MSG2, MSG1);
        QROUND(i + 8, MSG2);

        MSG3 = _mm_sha256msg1_epu32(MSG3, MSG0);
        TMP = _mm_alignr_epi8(MSG2, MSG1, 4);
        MSG3 = _mm_add_epi32(MSG3, TMP);
        MSG3 = _mm_sha256msg2_epu32(MSG3, MSG2);
        QROUND(i + 12, MSG3);
    }
#undef QROUND

    STATE0 = _mm_add_epi32(STATE0, ABEF_SAVE);
    STATE1 = _mm_add_epi32(STATE1, CDGH_SAVE);

    TMP = _mm_shuffle_epi32(STATE0, 0x1B);       // FEBA
    STATE1 = _mm_shuffle_epi32(STATE1, 0xB1);    // DCHG
    STATE0 = _mm_blend_epi16(TMP, STATE1, 0xF0); // a,b,c,d (memory order)
    STATE1 = _mm_alignr_epi8(STATE1, TMP, 8);    // e,f,g,h (memory order)

    _mm_storeu_si128((__m128i*)&state[0], STATE0);
    _mm_storeu_si128((__m128i*)&state[4], STATE1);
}
#endif

static inline uint32_t rotr(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
}

static void compress_scalar(uint32_t state[8], const uint32_t block[16]) {
    uint32_t w[64];
    std::memcpy(w, block, 64);
    for (int i = 16; i < 64; i++) {
        uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = state[0], b = state[1], c = state[2], d = state[3];
    uint32_t e = state[4], f = state[5], g = state[6], h = state[7];
    for (int i = 0; i < 64; i++) {
        uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = h + S1 + ch + K256[i] + w[i];
        uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
        uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = S0 + maj;
        h = g; g = f; f = e; e = d + t1;
        d = c; c = b; b = a; a = t1 + t2;
    }
    state[0] += a; state[1] += b; state[2] += c; state[3] += d;
    state[4] += e; state[5] += f; state[6] += g; state[7] += h;
}

static inline void compress(uint32_t state[8], const uint32_t block[16]) {
#ifdef HAVE_SHA_NI
    compress_ni(state, block);
#else
    compress_scalar(state, block);
#endif
}


#if defined(__AVX512F__) && defined(__AVX512BW__)
#define HAVE_AVX512 1
// 16-way vertical SIMD: one __m512i lane per message.  ~15x scalar on this
// host (SHA-NI is trapped by the hypervisor; AVX-512 runs native).
namespace w16 {

static inline __m512i rotr(__m512i x, int n) { return _mm512_ror_epi32(x, n); }

// one block for 16 messages; state/block are arrays of __m512i
static void compress(__m512i state[8], const __m512i block[16]) {
    __m512i w[16];
    for (int i = 0; i < 16; i++) w[i] = block[i];
    __m512i a = state[0], b = state[1], c = state[2], d = state[3];
    __m512i e = state[4], f = state[5], g = state[6], h = state[7];
    for (int i = 0; i < 64; i++) {
        __m512i wi;
        if (i < 16) {
            wi = w[i];
        } else {
            __m512i w15 = w[(i - 15) & 15], w2 = w[(i - 2) & 15];
            __m512i s0 = _mm512_xor_si512(
                _mm512_xor_si512(rotr(w15, 7), rotr(w15, 18)),
                _mm512_srli_epi32(w15, 3));
            __m512i s1 = _mm512_xor_si512(
                _mm512_xor_si512(rotr(w2, 17), rotr(w2, 19)),
                _mm512_srli_epi32(w2, 10));
            wi = _mm512_add_epi32(
                _mm512_add_epi32(w[i & 15], s0),
                _mm512_add_epi32(w[(i - 7) & 15], s1));
            w[i & 15] = wi;
        }
        __m512i S1 = _mm512_xor_si512(_mm512_xor_si512(rotr(e, 6), rotr(e, 11)),
                                      rotr(e, 25));
        __m512i ch = _mm512_xor_si512(_mm512_and_si512(e, f),
                                      _mm512_andnot_si512(e, g));
        __m512i t1 = _mm512_add_epi32(
            _mm512_add_epi32(h, S1),
            _mm512_add_epi32(_mm512_add_epi32(ch, _mm512_set1_epi32((int)K256[i])), wi));
        __m512i S0 = _mm512_xor_si512(_mm512_xor_si512(rotr(a, 2), rotr(a, 13)),
                                      rotr(a, 22));
        __m512i maj = _mm512_ternarylogic_epi32(a, b, c, 0xE8);  // (a&b)^(a&c)^(b&c)
        __m512i t2 = _mm512_add_epi32(S0, maj);
        h = g; g = f; f = e; e = _mm512_add_epi32(d, t1);
        d = c; c = b; b = a; a = _mm512_add_epi32(t1, t2);
    }
    state[0] = _mm512_add_epi32(state[0], a);
    state[1] = _mm512_add_epi32(state[1], b);
    state[2] = _mm512_add_epi32(state[2], c);
    state[3] = _mm512_add_epi32(state[3], d);
    state[4] = _mm512_add_epi32(state[4], e);
    state[5] = _mm512_add_epi32(state[5], f);
    state[6] = _mm512_add_epi32(state[6], g);
    state[7] = _mm512_add_epi32(state[7], h);
}

static inline void init_state(__m512i state[8]) {
    for (int i = 0; i < 8; i++) state[i] = _mm512_set1_epi32((int)H0[i]);
}

// store lane-sliced state as 16 row-major digests at out[row*8 + i]
static void store_digests(const __m512i state[8], uint32_t* out) {
    alignas(64) uint32_t tmp[8][16];
    for (int i = 0; i < 8; i++)
        _mm512_store_si512((__m512i*)tmp[i], state[i]);
    for (int r = 0; r < 16; r++)
        for (int i = 0; i < 8; i++) out[r * 8 + i] = tmp[i][r];
}

// generic: 16 rows of k contiguous words each, rows start at in + row*k
static void hash_rows(const uint32_t* in, uint64_t k, uint32_t* out) {
    const __m512i lane = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                           11, 12, 13, 14, 15);
    const __m512i rowbase = _mm512_mullo_epi32(lane, _mm512_set1_epi32((int)k));
    __m512i state[8];
    init_state(state);
    uint64_t nb = (k + 3 + 15) / 16;
    uint64_t bitlen = 32 * k;
    __m512i block[16];
    for (uint64_t b = 0; b < nb; b++) {
        for (int j = 0; j < 16; j++) {
            uint64_t idx = b * 16 + (uint64_t)j;
            if (idx < k) {
                __m512i vindex = _mm512_add_epi32(rowbase,
                                                  _mm512_set1_epi32((int)idx));
                block[j] = _mm512_i32gather_epi32(vindex, (const int*)in, 4);
            } else if (idx == k) {
                block[j] = _mm512_set1_epi32((int)0x80000000u);
            } else if (idx == nb * 16 - 2) {
                block[j] = _mm512_set1_epi32((int)(bitlen >> 32));
            } else if (idx == nb * 16 - 1) {
                block[j] = _mm512_set1_epi32((int)(bitlen & 0xffffffffu));
            } else {
                block[j] = _mm512_setzero_si512();
            }
        }
        compress(state, block);
    }
    store_digests(state, out);
}

// leaf level, column-major input: word c of node i is cols[c*N + i];
// 16 consecutive nodes -> contiguous loads
static void leaf_rows(const uint32_t* cols, uint64_t n_cols, uint64_t N,
                      uint64_t i0, uint32_t* out) {
    __m512i state[8];
    init_state(state);
    uint64_t k = n_cols;
    uint64_t nb = (k + 3 + 15) / 16;
    uint64_t bitlen = 32 * k;
    __m512i block[16];
    for (uint64_t b = 0; b < nb; b++) {
        for (int j = 0; j < 16; j++) {
            uint64_t idx = b * 16 + (uint64_t)j;
            if (idx < k)
                block[j] = _mm512_loadu_si512(
                    (const void*)(cols + idx * N + i0));
            else if (idx == k)
                block[j] = _mm512_set1_epi32((int)0x80000000u);
            else if (idx == nb * 16 - 2)
                block[j] = _mm512_set1_epi32((int)(bitlen >> 32));
            else if (idx == nb * 16 - 1)
                block[j] = _mm512_set1_epi32((int)(bitlen & 0xffffffffu));
            else
                block[j] = _mm512_setzero_si512();
        }
        compress(state, block);
    }
    store_digests(state, out + i0 * 8);
}

// inner level: children row-major (2N, 8); cols column-major or null
static void node_rows(const uint32_t* children, const uint32_t* cols,
                      uint64_t n_cols, uint64_t N, uint64_t i0,
                      uint32_t* out) {
    const __m512i lane = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                           11, 12, 13, 14, 15);
    const __m512i rowbase = _mm512_mullo_epi32(lane, _mm512_set1_epi32(16));
    __m512i state[8];
    init_state(state);
    uint64_t k = 16 + n_cols;
    uint64_t nb = (k + 3 + 15) / 16;
    uint64_t bitlen = 32 * k;
    const uint32_t* chbase = children + i0 * 16;
    __m512i block[16];
    for (uint64_t b = 0; b < nb; b++) {
        for (int j = 0; j < 16; j++) {
            uint64_t idx = b * 16 + (uint64_t)j;
            if (idx < 16) {
                __m512i vindex = _mm512_add_epi32(rowbase,
                                                  _mm512_set1_epi32((int)idx));
                block[j] = _mm512_i32gather_epi32(vindex, (const int*)chbase, 4);
            } else if (idx < k) {
                block[j] = _mm512_loadu_si512(
                    (const void*)(cols + (idx - 16) * N + i0));
            } else if (idx == k) {
                block[j] = _mm512_set1_epi32((int)0x80000000u);
            } else if (idx == nb * 16 - 2) {
                block[j] = _mm512_set1_epi32((int)(bitlen >> 32));
            } else if (idx == nb * 16 - 1) {
                block[j] = _mm512_set1_epi32((int)(bitlen & 0xffffffffu));
            } else {
                block[j] = _mm512_setzero_si512();
            }
        }
        compress(state, block);
    }
    store_digests(state, out + i0 * 8);
}

}  // namespace w16
#endif  // HAVE_AVX512

// digest of a k-word message already assembled in `msg`
static void hash_words(const uint32_t* msg, uint64_t k, uint32_t out[8]) {
    uint32_t block[16];
    uint32_t state[8];
    std::memcpy(state, H0, 32);
    uint64_t nb = (k + 3 + 15) / 16;  // message + 0x80 word + 2 length words
    uint64_t bitlen = 32 * k;
    uint64_t pos = 0;
    for (uint64_t b = 0; b < nb; b++) {
        for (int j = 0; j < 16; j++) {
            uint64_t idx = b * 16 + j;
            uint32_t w;
            if (idx < k) w = msg[pos++];
            else if (idx == k) w = 0x80000000u;
            else if (idx == nb * 16 - 2) w = (uint32_t)(bitlen >> 32);
            else if (idx == nb * 16 - 1) w = (uint32_t)(bitlen & 0xffffffffu);
            else w = 0;
            block[j] = w;
        }
        compress(state, block);
    }
    std::memcpy(out, state, 32);
}

extern "C" {

// rows of k contiguous words -> (n, 8) digests
void sha256_words_batch(const uint32_t* in, uint64_t n, uint64_t k,
                        uint32_t* out) {
#ifdef HAVE_AVX512
    int64_t n16 = (int64_t)(n / 16);
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n16; g++)
        w16::hash_rows(in + (uint64_t)g * 16 * k, k, out + (uint64_t)g * 16 * 8);
    for (uint64_t i = n16 * 16; i < n; i++)
        hash_words(in + i * k, k, out + i * 8);
#else
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)n; i++) {
        hash_words(in + (uint64_t)i * k, k, out + (uint64_t)i * 8);
    }
#endif
}

// Merkle leaf level: columns in (n_cols, N) C-order; row i's message is
// cols[0][i], cols[1][i], ... (the transpose, gathered on the fly).
void sha256_leaf_level(const uint32_t* cols, uint64_t n_cols, uint64_t N,
                       uint32_t* out) {
#ifdef HAVE_AVX512
    int64_t n16 = (int64_t)(N / 16);
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n16; g++)
        w16::leaf_rows(cols, n_cols, N, (uint64_t)g * 16, out);
    for (uint64_t i = (uint64_t)n16 * 16; i < N; i++) {
        uint32_t msg[1024];
        for (uint64_t c = 0; c < n_cols; c++) msg[c] = cols[c * N + i];
        hash_words(msg, n_cols, out + i * 8);
    }
#else
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)N; i++) {
        uint32_t msg[1024];
        for (uint64_t c = 0; c < n_cols; c++) msg[c] = cols[c * N + i];
        hash_words(msg, n_cols, out + (uint64_t)i * 8);
    }
#endif
}

// Merkle inner level: children (2N, 8) C-order; cols optional (n_cols, N).
void sha256_node_level(const uint32_t* children, const uint32_t* cols,
                       uint64_t n_cols, uint64_t N, uint32_t* out) {
#ifdef HAVE_AVX512
    int64_t n16 = (int64_t)(N / 16);
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n16; g++)
        w16::node_rows(children, cols, n_cols, N, (uint64_t)g * 16, out);
    for (uint64_t i = (uint64_t)n16 * 16; i < N; i++) {
        uint32_t msg[1024];
        std::memcpy(msg, children + i * 16, 64);
        for (uint64_t c = 0; c < n_cols; c++) msg[16 + c] = cols[c * N + i];
        hash_words(msg, 16 + n_cols, out + i * 8);
    }
#else
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)N; i++) {
        uint32_t msg[1024];
        std::memcpy(msg, children + (uint64_t)i * 16, 64);
        for (uint64_t c = 0; c < n_cols; c++) msg[16 + c] = cols[c * N + i];
        hash_words(msg, 16 + n_cols, out + (uint64_t)i * 8);
    }
#endif
}

// PoW grind: find nonce with `bits` trailing zero bits (LE interpretation
// of the digest head) after mixing le8(nonce)+pad24 || digest (64-byte
// message).  Mirrors prover/prove_sha256.Sha256ProverChannel.grind_pow.
uint64_t sha256_grind(const uint32_t* digest, uint32_t bits, uint64_t start) {
    uint32_t mask = (bits >= 32) ? 0xffffffffu : ((1u << bits) - 1u);
    uint64_t found = ~0ull;
#ifdef HAVE_AVX512
    {
        const __m512i bswap = _mm512_broadcast_i32x4(
            _mm_setr_epi8(3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9, 8, 15, 14, 13, 12));
        const __m512i lane = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                               10, 11, 12, 13, 14, 15);
#pragma omp parallel
        {
#ifdef _OPENMP
            int tid = omp_get_thread_num();
            int nth = omp_get_num_threads();
#else
            int tid = 0, nth = 1;
#endif
            __m512i block[16], pad[16];
            for (int j = 0; j < 16; j++) pad[j] = _mm512_setzero_si512();
            pad[0] = _mm512_set1_epi32((int)0x80000000u);
            pad[15] = _mm512_set1_epi32(512);
            for (int j = 2; j < 8; j++) block[j] = _mm512_setzero_si512();
            for (int j = 0; j < 8; j++)
                block[8 + j] = _mm512_set1_epi32((int)digest[j]);
            for (uint64_t base = start + (uint64_t)tid * 16;;
                 base += (uint64_t)nth * 16) {
                uint64_t cur;
#pragma omp atomic read
                cur = found;
                if (base >= cur) break;
                // lanes: nonce = base + lane (assumes base + 15 < 2^32,
                // true for every realistic pow_bits)
                __m512i lo = _mm512_add_epi32(
                    _mm512_set1_epi32((int)(uint32_t)base), lane);
                block[0] = _mm512_shuffle_epi8(lo, bswap);
                block[1] = _mm512_set1_epi32(
                    (int)__builtin_bswap32((uint32_t)(base >> 32)));
                __m512i state[8];
                w16::init_state(state);
                w16::compress(state, block);
                w16::compress(state, pad);
                __m512i first_le = _mm512_shuffle_epi8(state[0], bswap);
                __mmask16 hit = _mm512_testn_epi32_mask(
                    first_le, _mm512_set1_epi32((int)mask));
                if (hit) {
                    uint64_t nonce = base + (uint64_t)__builtin_ctz(hit);
#pragma omp critical
                    if (nonce < found) found = nonce;
                }
            }
        }
        return found;
    }
#endif
#pragma omp parallel
    {
        uint32_t block[16];
        uint32_t pad[16];
        std::memset(pad, 0, 64);
        pad[0] = 0x80000000u;
        pad[15] = 512;
        std::memset(block, 0, 64);
        for (int j = 0; j < 8; j++) block[8 + j] = digest[j];
#ifdef _OPENMP
        int tid = omp_get_thread_num();
        int nth = omp_get_num_threads();
#else
        int tid = 0, nth = 1;
#endif
        for (uint64_t nonce = start + (uint64_t)tid;; nonce += (uint64_t)nth) {
            uint64_t cur;
#pragma omp atomic read
            cur = found;
            if (nonce >= cur) break;
            uint32_t lo = (uint32_t)(nonce & 0xffffffffu);
            uint32_t hi = (uint32_t)(nonce >> 32);
            block[0] = __builtin_bswap32(lo);
            block[1] = __builtin_bswap32(hi);
            uint32_t state[8];
            std::memcpy(state, H0, 32);
            compress(state, block);
            compress(state, pad);
            uint32_t first_le = __builtin_bswap32(state[0]);
            if ((first_le & mask) == 0) {
#pragma omp critical
                if (nonce < found) found = nonce;
            }
        }
    }
    return found;
}

}  // extern "C"
