// Native M31 circle-FFT butterflies (host path for LDE domains too large
// for the remote TPU compiler — see prover/prove.py::_FFTRouter).
//
// Bit-exact with recursive_stwo_tpu/prover/circle_fft.py::evaluate /
// interpolate: same bit-reversed layout, same per-layer twiddle tables
// (passed in from Python, concatenated with offsets), canonical [0, P)
// values throughout.

#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

static const uint32_t P = 2147483647u;

static inline uint32_t m31_add(uint32_t a, uint32_t b) {
    uint32_t s = a + b;  // both < 2^31 -> no wrap
    return s >= P ? s - P : s;
}

static inline uint32_t m31_sub(uint32_t a, uint32_t b) {
    return a >= b ? a - b : a + P - b;
}

static inline uint32_t m31_mul(uint32_t a, uint32_t b) {
    uint64_t m = (uint64_t)a * b;                       // < 2^62
    uint64_t t = (m & 0x7fffffffu) + (m >> 31);         // < 2^32
    t = (t & 0x7fffffffu) + (t >> 31);                  // <= P
    return t >= P ? (uint32_t)(t - P) : (uint32_t)t;
}

extern "C" {

// In-place evaluate: coefficients -> evaluations (bit-reversed order).
// v: (rows, n) C-order.  tw: concatenated per-layer twiddles; layer k
// (k = 0 .. log_size-1) starts at tw_off[k] and has n >> (k+1) entries.
void m31_fft_evaluate(uint32_t* v, uint64_t rows, uint64_t n,
                      const uint32_t* tw, const uint64_t* tw_off,
                      uint32_t log_size) {
    for (int layer = (int)log_size - 1; layer >= 0; layer--) {
        uint64_t step = 1ull << layer;
        uint64_t n_groups = n >> (layer + 1);
        const uint32_t* t = tw + tw_off[layer];
        int64_t total = (int64_t)(rows * n_groups);
#pragma omp parallel for schedule(static)
        for (int64_t rg = 0; rg < total; rg++) {
            uint64_t r = (uint64_t)rg / n_groups;
            uint64_t g = (uint64_t)rg % n_groups;
            uint32_t tg = t[g];
            uint32_t* base = v + r * n + g * 2 * step;
            for (uint64_t j = 0; j < step; j++) {
                uint32_t f0 = base[j];
                uint32_t tf1 = m31_mul(base[step + j], tg);
                base[j] = m31_add(f0, tf1);
                base[step + j] = m31_sub(f0, tf1);
            }
        }
    }
}

// In-place interpolate: evaluations (bit-reversed) -> coefficients,
// scaled by inv2n = (2^log_size)^-1 mod P.  itw = inverse twiddles in the
// same concatenated layout.
void m31_fft_interpolate(uint32_t* v, uint64_t rows, uint64_t n,
                         const uint32_t* itw, const uint64_t* itw_off,
                         uint32_t log_size, uint32_t inv2n) {
    for (uint32_t layer = 0; layer < log_size; layer++) {
        uint64_t step = 1ull << layer;
        uint64_t n_groups = n >> (layer + 1);
        const uint32_t* t = itw + itw_off[layer];
        int64_t total = (int64_t)(rows * n_groups);
#pragma omp parallel for schedule(static)
        for (int64_t rg = 0; rg < total; rg++) {
            uint64_t r = (uint64_t)rg / n_groups;
            uint64_t g = (uint64_t)rg % n_groups;
            uint32_t tg = t[g];
            uint32_t* base = v + r * n + g * 2 * step;
            for (uint64_t j = 0; j < step; j++) {
                uint32_t a = base[j];
                uint32_t b = base[step + j];
                base[j] = m31_add(a, b);
                base[step + j] = m31_mul(m31_sub(a, b), tg);
            }
        }
    }
    int64_t total = (int64_t)(rows * n);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < total; i++) v[i] = m31_mul(v[i], inv2n);
}

}  // extern "C"

extern "C" {

// Batch modular inverse a^(p-2) via the same 37-mul addition chain as
// core/m31.py::inv (numpy path) — one read + one write per element
// instead of ~37 full-array numpy passes.
void m31_inv_batch(const uint32_t* a, uint64_t n, uint32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)n; i++) {
        uint32_t x = a[i];
        uint32_t s = m31_mul(x, x);
        s = m31_mul(s, s);
        uint32_t t0 = m31_mul(s, x);                       // x^5
        uint32_t t1 = m31_mul(m31_mul(t0, t0), t0);        // x^15
        uint32_t t2 = t1;
        for (int k = 0; k < 3; k++) t2 = m31_mul(t2, t2);
        t2 = m31_mul(t2, t0);                              // x^125
        uint32_t t3 = m31_mul(m31_mul(t2, t2), t0);        // x^255
        uint32_t t4 = t3;
        for (int k = 0; k < 8; k++) t4 = m31_mul(t4, t4);
        t4 = m31_mul(t4, t3);                              // x^65535
        uint32_t t5 = t4;
        for (int k = 0; k < 8; k++) t5 = m31_mul(t5, t5);
        t5 = m31_mul(t5, t3);                              // x^16777215
        uint32_t r = t5;
        for (int k = 0; k < 7; k++) r = m31_mul(r, r);
        out[i] = m31_mul(r, t2);                           // x^(p-2)
    }
}

// Elementwise modular product out = a*b mod P (one pass; numpy's
// limb-split mul makes ~20 full-array passes).
void m31_mul_batch(const uint32_t* a, const uint32_t* b, uint64_t n,
                   uint32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)n; i++) out[i] = m31_mul(a[i], b[i]);
}

void m31_add_batch(const uint32_t* a, const uint32_t* b, uint64_t n,
                   uint32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)n; i++) out[i] = m31_add(a[i], b[i]);
}

void m31_sub_batch(const uint32_t* a, const uint32_t* b, uint64_t n,
                   uint32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)n; i++) out[i] = m31_sub(a[i], b[i]);
}

// Vectorized circle point_at_index: for each idx, multiply together the
// generator powers selected by idx's bits (mirror of
// core/circle.apoints_at_indices).  gx/gy: 31 generator-power coordinates.
void m31_points_at_indices(const uint64_t* idx, uint64_t n,
                           const uint32_t* gx, const uint32_t* gy,
                           uint32_t n_bits, uint32_t* out_x,
                           uint32_t* out_y) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)n; i++) {
        uint32_t x = 1, y = 0;
        uint64_t v = idx[i];
        for (uint32_t k = 0; k < n_bits; k++) {
            if ((v >> k) & 1ull) {
                uint32_t nx = m31_sub(m31_mul(x, gx[k]), m31_mul(y, gy[k]));
                uint32_t ny = m31_add(m31_mul(x, gy[k]), m31_mul(y, gx[k]));
                x = nx;
                y = ny;
            }
        }
        out_x[i] = x;
        out_y[i] = y;
    }
}

}  // extern "C"
