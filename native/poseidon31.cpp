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

}  // namespace

extern "C" {

// In-place Poseidon2 permutation of n contiguous 16-lane u32 states.
void poseidon2_permute_batch(uint32_t* states, uint64_t n) {
    for (uint64_t i = 0; i < n; ++i) permute_one(states + 16 * i);
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
uint64_t poseidon2_grind(const uint32_t* digest, uint32_t bits,
                         uint64_t start) {
    const uint32_t mask = (bits >= 32) ? 0xffffffffu : ((1u << bits) - 1u);
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
}

}  // extern "C"
