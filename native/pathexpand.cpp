// Native host path expansion: turn stwo's shared-ancestor Merkle
// decommitments into fixed-shape per-query paths, entirely in C++.
//
// Mirrors recursive_stwo_tpu/verifier/hints.py::expand_single_paths_batched
// and expand_pair_paths_batched bit-for-bit (identical witness-consumption
// order and outputs; reference semantics: hints/decommit.rs:44-183 and
// hints/folding.rs:93-287).  The Python twins walked the trees with dicts
// and lists — profiled at ~70% of host hint-preparation time, dwarfing the
// actual hashing.  Here the walk is flat C++ and every tree level hashes
// the nodes of ALL proofs in one AVX-512 16-way call (poseidon31.cpp,
// compiled into the same shared library).
//
// Build: compiled together with poseidon31.cpp into libposeidon31.so
// (see recursive_stwo_tpu/utils/native.py).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <array>

extern "C" {
void poseidon2_permute_batch(uint32_t* states, uint64_t n);
void poseidon2_leaf_level(const uint32_t* cols, uint64_t n_cols, uint64_t N,
                          uint32_t* out);
void poseidon2_node_level(const uint32_t* children, const uint32_t* cols,
                          uint64_t n_cols, uint64_t N, uint32_t* out);
// SHA-256 twins (native/sha256.cpp, same shared library)
void sha256_leaf_level(const uint32_t* cols, uint64_t n_cols, uint64_t N,
                       uint32_t* out);
void sha256_node_level(const uint32_t* children, const uint32_t* cols,
                       uint64_t n_cols, uint64_t N, uint32_t* out);
}

// Merkle node-hash flavor selector (verifier/hints.py::_level_hashers):
// 0 = Poseidon31, 1 = SHA-256.
enum { FLAVOR_P31 = 0, FLAVOR_SHA256 = 1 };

namespace {

using Hash = std::array<uint32_t, 8>;
using HashMap = std::unordered_map<int64_t, Hash>;

// error codes (Python raises on nonzero)
constexpr int ERR_VALUES_EXHAUSTED = -1;
constexpr int ERR_HASHES_EXHAUSTED = -2;
constexpr int ERR_UNCONSUMED = -3;
constexpr int ERR_ROOT_MISMATCH = -4;

// Batched level hashing: collect (left, right, cols_row) jobs, run one
// poseidon2_node_level call over all of them (cols transposed to the
// kernel's column-major layout).
struct NodeJobs {
    std::vector<uint32_t> children;  // 16 u32 per job (left || right)
    std::vector<uint32_t> cols;      // ncols u32 per job, row-major
    uint32_t ncols = 0;

    void clear(uint32_t nc) {
        children.clear();
        cols.clear();
        ncols = nc;
    }
    size_t size() const { return children.size() / 16; }
    void push(const uint32_t* left, const uint32_t* right,
              const uint32_t* c) {
        size_t base = children.size();
        children.resize(base + 16);
        std::memcpy(children.data() + base, left, 32);
        std::memcpy(children.data() + base + 8, right, 32);
        if (ncols) {
            size_t cbase = cols.size();
            cols.resize(cbase + ncols);
            std::memcpy(cols.data() + cbase, c, 4ull * ncols);
        }
    }
    // run the level hash; out gets N hashes of 8 u32
    void run(std::vector<uint32_t>& out, uint32_t flavor = FLAVOR_P31) {
        size_t N = size();
        out.resize(N * 8);
        if (!N) return;
        auto node_fn = flavor == FLAVOR_SHA256 ? sha256_node_level
                                               : poseidon2_node_level;
        if (ncols) {
            std::vector<uint32_t> cm(ncols * N);
            for (size_t i = 0; i < N; ++i)
                for (uint32_t c = 0; c < ncols; ++c)
                    cm[(size_t)c * N + i] = cols[i * ncols + c];
            node_fn(children.data(), cm.data(), ncols, N, out.data());
        } else {
            node_fn(children.data(), nullptr, 0, N, out.data());
        }
    }
};

struct LeafJobs {
    std::vector<uint32_t> rows;  // ncols u32 per job, row-major
    uint32_t ncols = 0;

    void clear(uint32_t nc) {
        rows.clear();
        ncols = nc;
    }
    size_t size() const { return ncols ? rows.size() / ncols : 0; }
    void push(const uint32_t* r) {
        size_t base = rows.size();
        rows.resize(base + ncols);
        std::memcpy(rows.data() + base, r, 4ull * ncols);
    }
    void run(std::vector<uint32_t>& out, uint32_t flavor = FLAVOR_P31) {
        size_t N = size();
        out.resize(N * 8);
        if (!N) return;
        std::vector<uint32_t> cm((size_t)ncols * N);
        for (size_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < ncols; ++c)
                cm[(size_t)c * N + i] = rows[i * ncols + c];
        (flavor == FLAVOR_SHA256 ? sha256_leaf_level : poseidon2_leaf_level)(
            cm.data(), ncols, N, out.data());
    }
};

std::vector<int64_t> sorted_unique(const int64_t* q, uint32_t n) {
    std::vector<int64_t> v(q, q + n);
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    return v;
}

}  // namespace

extern "C" {

// Commitment-tree expansion over B proofs (expand_single_paths_batched).
//
//   raw_queries  (B, Q) leaf positions, already shifted to tree depth
//   values       concatenated per-proof queried values; val_off (B+1) u64
//   hashw        concatenated hash witnesses (rows of 8); hw_off (B+1)
//                counts rows
//   ncols_per_log (max_log+1) columns at each log size (index = log size)
//   roots        (B, 8) expected roots
//   out_sib      (B, Q, max_log, 8)
//   out_cols     slabs of (B, Q, ncols) for each log size with ncols>0,
//                in DESCENDING log-size order, concatenated
int rstpu_expand_single_paths(
    uint32_t B, uint32_t max_log, uint32_t Q, const int64_t* raw_queries,
    const uint32_t* values, const uint64_t* val_off, const uint32_t* hashw,
    const uint64_t* hw_off, const uint32_t* ncols_per_log,
    const uint32_t* roots, uint32_t* out_sib, uint32_t* out_cols,
    uint32_t flavor) {
    uint32_t n_top = ncols_per_log[max_log];

    struct St {
        std::vector<int64_t> queries;   // sorted unique leaf queries
        const uint32_t* values;
        size_t vlen, vcur;
        const uint32_t* hw;
        size_t hn, hcur;
        std::vector<HashMap> hash_layers;
        // per level: parent -> pointer into values (ncols wide)
        std::vector<std::unordered_map<int64_t, const uint32_t*>> col_layers;
        std::vector<int64_t> positions;
    };
    std::vector<St> st(B);

    LeafJobs leaf;
    leaf.clear(n_top);
    for (uint32_t bi = 0; bi < B; ++bi) {
        St& s = st[bi];
        s.queries = sorted_unique(raw_queries + (size_t)bi * Q, Q);
        s.values = values + val_off[bi];
        s.vlen = val_off[bi + 1] - val_off[bi];
        s.vcur = 0;
        s.hw = hashw + hw_off[bi] * 8;
        s.hn = hw_off[bi + 1] - hw_off[bi];
        s.hcur = 0;
        size_t need = (size_t)s.queries.size() * n_top;
        if (need > s.vlen) return ERR_VALUES_EXHAUSTED;
        for (size_t i = 0; i < s.queries.size(); ++i)
            leaf.push(s.values + i * n_top);
        s.vcur = need;
        s.hash_layers.resize(max_log + 1);
        s.col_layers.resize(max_log);
        s.positions = s.queries;
    }
    std::vector<uint32_t> hashed;
    leaf.run(hashed, flavor);
    {
        size_t off = 0;
        for (uint32_t bi = 0; bi < B; ++bi) {
            St& s = st[bi];
            for (size_t i = 0; i < s.queries.size(); ++i, ++off) {
                Hash h;
                std::memcpy(h.data(), hashed.data() + off * 8, 32);
                s.hash_layers[0].emplace(s.queries[i], h);
            }
        }
    }

    NodeJobs jobs;
    std::vector<std::pair<uint32_t, int64_t>> owners;  // (proof, parent)
    for (uint32_t i = 0; i < max_log; ++i) {
        uint32_t ncols = ncols_per_log[max_log - 1 - i];
        jobs.clear(ncols);
        owners.clear();
        for (uint32_t bi = 0; bi < B; ++bi) {
            St& s = st[bi];
            HashMap& hl = s.hash_layers[i];
            auto& column_layer = s.col_layers[i];
            std::vector<int64_t> parents;
            for (int64_t position : s.positions) {
                int64_t parent = position >> 1;
                if (column_layer.count(parent)) continue;
                if (s.vcur + ncols > s.vlen) return ERR_VALUES_EXHAUSTED;
                const uint32_t* cols = s.values + s.vcur;
                s.vcur += ncols;
                column_layer.emplace(parent, cols);
                int64_t sibling_idx = position ^ 1;
                auto sit = hl.find(sibling_idx);
                if (sit == hl.end()) {
                    if (s.hcur >= s.hn) return ERR_HASHES_EXHAUSTED;
                    Hash h;
                    std::memcpy(h.data(), s.hw + s.hcur * 8, 32);
                    ++s.hcur;
                    sit = hl.emplace(sibling_idx, h).first;
                }
                const Hash& own = hl.at(position);
                const Hash& sib = sit->second;
                if (position & 1)
                    jobs.push(sib.data(), own.data(), cols);
                else
                    jobs.push(own.data(), sib.data(), cols);
                owners.emplace_back(bi, parent);
                parents.push_back(parent);
            }
            std::sort(parents.begin(), parents.end());
            s.positions = std::move(parents);
        }
        jobs.run(hashed, flavor);
        for (size_t j = 0; j < owners.size(); ++j) {
            Hash h;
            std::memcpy(h.data(), hashed.data() + j * 8, 32);
            st[owners[j].first].hash_layers[i + 1].emplace(owners[j].second,
                                                           h);
        }
    }

    // final checks + gather
    for (uint32_t bi = 0; bi < B; ++bi) {
        St& s = st[bi];
        if (s.hcur != s.hn) return ERR_UNCONSUMED;
        if (s.vcur != s.vlen) return ERR_UNCONSUMED;
        auto rit = s.hash_layers[max_log].find(0);
        if (rit == s.hash_layers[max_log].end() ||
            std::memcmp(rit->second.data(), roots + (size_t)bi * 8, 32) != 0)
            return ERR_ROOT_MISMATCH;
    }

    // column-slab offsets, descending log size
    std::vector<size_t> slab_off(max_log + 1, (size_t)-1);
    {
        size_t off = 0;
        for (int lvl = (int)max_log; lvl >= 0; --lvl) {
            if (ncols_per_log[lvl]) {
                slab_off[lvl] = off;
                off += (size_t)B * Q * ncols_per_log[lvl];
            }
        }
    }
    for (uint32_t bi = 0; bi < B; ++bi) {
        St& s = st[bi];
        const int64_t* rq = raw_queries + (size_t)bi * Q;
        for (uint32_t qi = 0; qi < Q; ++qi) {
            int64_t cur = rq[qi];
            uint32_t* sib = out_sib + (((size_t)bi * Q + qi) * max_log) * 8;
            for (uint32_t i = 0; i < max_log; ++i) {
                std::memcpy(sib + (size_t)i * 8,
                            s.hash_layers[i].at(cur ^ 1).data(), 32);
                cur >>= 1;
            }
            // leaf columns
            {
                auto it = std::lower_bound(s.queries.begin(), s.queries.end(),
                                           rq[qi]);
                size_t li = (size_t)(it - s.queries.begin());
                std::memcpy(out_cols + slab_off[max_log] +
                                ((size_t)bi * Q + qi) * n_top,
                            s.values + li * n_top, 4ull * n_top);
            }
            cur = rq[qi] >> 1;
            for (uint32_t i = 0; i + 1 < max_log; ++i) {
                uint32_t lvl = max_log - i - 1;
                uint32_t nc = ncols_per_log[lvl];
                if (nc) {
                    std::memcpy(out_cols + slab_off[lvl] +
                                    ((size_t)bi * Q + qi) * nc,
                                s.col_layers[i].at(cur), 4ull * nc);
                }
                cur >>= 1;
            }
        }
    }
    return 0;
}

// FRI pair-path expansion over B proofs (expand_pair_paths_batched).
//
//   data_logs    n_levels log sizes carrying data (any order; set lookup)
//   leaf_queries (B, Q) at max_log
//   out_sib      (B, Q, max(max_log-1, 0), 8)
//   out_self/out_sibcols  slabs of (B, Q, 4) per data log size, in the
//                order given by data_logs, concatenated
int rstpu_expand_pair_paths(
    uint32_t B, uint32_t n_levels, const uint32_t* data_logs,
    uint32_t max_log, uint32_t Q, const int64_t* leaf_queries,
    const uint32_t* values, const uint64_t* val_off, const uint32_t* hashw,
    const uint64_t* hw_off, const uint32_t* roots, uint32_t* out_sib,
    uint32_t* out_self, uint32_t* out_sibcols, uint32_t flavor) {
    std::vector<bool> is_data(max_log + 1, false);
    std::vector<int> slab_of(max_log + 1, -1);
    for (uint32_t i = 0; i < n_levels; ++i) {
        is_data[data_logs[i]] = true;
        slab_of[data_logs[i]] = (int)i;
    }

    struct St {
        const uint32_t* values;
        size_t vlen, vcur;
        const uint32_t* hw;
        size_t hn, hcur;
        std::vector<int64_t> queries;
        // per data level: idx -> pointer to 4 values
        std::vector<std::unordered_map<int64_t, const uint32_t*>> qvm;
        std::vector<HashMap> hash_layers;
    };
    std::vector<St> st(B);
    for (uint32_t bi = 0; bi < B; ++bi) {
        St& s = st[bi];
        s.values = values + val_off[bi];
        s.vlen = val_off[bi + 1] - val_off[bi];
        s.vcur = 0;
        s.hw = hashw + hw_off[bi] * 8;
        s.hn = hw_off[bi + 1] - hw_off[bi];
        s.hcur = 0;
        s.queries.assign(leaf_queries + (size_t)bi * Q,
                         leaf_queries + (size_t)bi * Q + Q);
        s.qvm.resize(max_log + 1);
        s.hash_layers.reserve(max_log + 1);
    }

    LeafJobs leaf;
    NodeJobs jobs;
    std::vector<std::pair<uint32_t, int64_t>> leaf_owner, job_owner;
    std::vector<uint32_t> hashed;
    for (int current = (int)max_log; current >= 0; --current) {
        leaf.clear(4);
        jobs.clear(is_data[current] ? 4 : 0);
        leaf_owner.clear();
        job_owner.clear();
        for (uint32_t bi = 0; bi < B; ++bi) {
            St& s = st[bi];
            std::sort(s.queries.begin(), s.queries.end());
            s.queries.erase(std::unique(s.queries.begin(), s.queries.end()),
                            s.queries.end());
            s.hash_layers.emplace_back();
            HashMap* prev = s.hash_layers.size() >= 2
                                ? &s.hash_layers[s.hash_layers.size() - 2]
                                : nullptr;
            if (is_data[current]) {
                std::vector<int64_t> self_and_sib;
                self_and_sib.reserve(2 * s.queries.size());
                for (int64_t qq : s.queries) {
                    self_and_sib.push_back(qq);
                    self_and_sib.push_back(qq ^ 1);
                }
                std::sort(self_and_sib.begin(), self_and_sib.end());
                self_and_sib.erase(
                    std::unique(self_and_sib.begin(), self_and_sib.end()),
                    self_and_sib.end());
                size_t n_k = self_and_sib.size();
                if (s.vcur + 4 * n_k > s.vlen) return ERR_VALUES_EXHAUSTED;
                const uint32_t* vals = s.values + s.vcur;
                s.vcur += 4 * n_k;
                auto& qm = s.qvm[current];
                for (size_t j = 0; j < n_k; ++j)
                    qm.emplace(self_and_sib[j], vals + 4 * j);
                if (current == (int)max_log) {
                    for (size_t j = 0; j < n_k; ++j) {
                        leaf.push(vals + 4 * j);
                        leaf_owner.emplace_back(bi, self_and_sib[j]);
                    }
                } else {
                    for (size_t j = 0; j < n_k; ++j) {
                        int64_t qq = self_and_sib[j];
                        int64_t l_idx = qq << 1, r_idx = (qq << 1) + 1;
                        for (int64_t idx : {l_idx, r_idx}) {
                            if (!prev->count(idx)) {
                                if (s.hcur >= s.hn)
                                    return ERR_HASHES_EXHAUSTED;
                                Hash h;
                                std::memcpy(h.data(), s.hw + s.hcur * 8, 32);
                                ++s.hcur;
                                prev->emplace(idx, h);
                            }
                        }
                        jobs.push(prev->at(l_idx).data(),
                                  prev->at(r_idx).data(), vals + 4 * j);
                        job_owner.emplace_back(bi, qq);
                    }
                }
            } else {
                if (current == (int)max_log) return ERR_VALUES_EXHAUSTED;
                for (int64_t qq : s.queries) {
                    int64_t l_idx = qq << 1, r_idx = (qq << 1) + 1;
                    for (int64_t idx : {l_idx, r_idx}) {
                        if (!prev->count(idx)) {
                            if (s.hcur >= s.hn) return ERR_HASHES_EXHAUSTED;
                            Hash h;
                            std::memcpy(h.data(), s.hw + s.hcur * 8, 32);
                            ++s.hcur;
                            prev->emplace(idx, h);
                        }
                    }
                    jobs.push(prev->at(l_idx).data(), prev->at(r_idx).data(),
                              nullptr);
                    job_owner.emplace_back(bi, qq);
                }
            }
            for (auto& qq : s.queries) qq >>= 1;
        }
        if (!leaf_owner.empty()) {
            leaf.run(hashed, flavor);
            for (size_t j = 0; j < leaf_owner.size(); ++j) {
                Hash h;
                std::memcpy(h.data(), hashed.data() + j * 8, 32);
                st[leaf_owner[j].first].hash_layers.back().emplace(
                    leaf_owner[j].second, h);
            }
        }
        if (!job_owner.empty()) {
            jobs.run(hashed, flavor);
            for (size_t j = 0; j < job_owner.size(); ++j) {
                Hash h;
                std::memcpy(h.data(), hashed.data() + j * 8, 32);
                st[job_owner[j].first].hash_layers.back().emplace(
                    job_owner[j].second, h);
            }
        }
    }

    for (uint32_t bi = 0; bi < B; ++bi) {
        St& s = st[bi];
        if (s.vcur != s.vlen || s.hcur != s.hn) return ERR_UNCONSUMED;
        HashMap& top = s.hash_layers.back();
        auto rit = top.find(0);
        if (top.size() != 1 || rit == top.end() ||
            std::memcmp(rit->second.data(), roots + (size_t)bi * 8, 32) != 0)
            return ERR_ROOT_MISMATCH;
    }

    // gather + batched sibling-node recompute
    uint32_t depth_out = max_log > 0 ? max_log - 1 : 0;
    NodeJobs recompute;
    recompute.clear(0);
    std::vector<size_t> rc_dest;  // flat index into out_sib
    for (uint32_t bi = 0; bi < B; ++bi) {
        St& s = st[bi];
        const int64_t* lq = leaf_queries + (size_t)bi * Q;
        for (uint32_t qi = 0; qi < Q; ++qi) {
            int64_t query = lq[qi];
            uint32_t si = 0;
            for (int current = (int)max_log; current >= 1; --current) {
                size_t slot = ((size_t)bi * Q + qi);
                if (is_data[current]) {
                    size_t soff =
                        ((size_t)slab_of[current] * B * Q + slot) * 4;
                    std::memcpy(out_self + soff, s.qvm[current].at(query),
                                16);
                    std::memcpy(out_sibcols + soff,
                                s.qvm[current].at(query ^ 1), 16);
                    if (current != (int)max_log) {
                        int64_t sl = (query ^ 1) << 1, sr = sl + 1;
                        HashMap& hl = s.hash_layers[max_log - current - 1];
                        recompute.push(hl.at(sl).data(), hl.at(sr).data(),
                                       nullptr);
                        rc_dest.push_back((slot * depth_out + si) * 8);
                        ++si;
                    }
                } else {
                    std::memcpy(
                        out_sib + (slot * depth_out + si) * 8,
                        s.hash_layers[max_log - current].at(query ^ 1).data(),
                        32);
                    ++si;
                }
                query >>= 1;
            }
        }
    }
    if (!rc_dest.empty()) {
        recompute.run(hashed, flavor);
        for (size_t j = 0; j < rc_dest.size(); ++j)
            std::memcpy(out_sib + rc_dest[j], hashed.data() + j * 8, 32);
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused FRI hint pipeline: first-layer rebuild + circle folds, inner-layer
// witness assembly + line folds, pair-path expansion per layer, and the
// last-layer polynomial consistency check — the C++ twin of the middle of
// verifier/hints.py::prepare (reference: hints/folding.rs:296-601).
// Position-derived field inverses (1/y, 1/x ladders) arrive precomputed
// from vectorized numpy; this kernel does the witness walking and QM31
// arithmetic that profiled as per-proof Python overhead.
// ---------------------------------------------------------------------------

namespace {

constexpr uint32_t P31 = 2147483647u;

inline uint32_t f_add(uint32_t a, uint32_t b) {
    uint32_t s = a + b;
    return s >= P31 ? s - P31 : s;
}
inline uint32_t f_sub(uint32_t a, uint32_t b) {
    return a >= b ? a - b : a + P31 - b;
}
inline uint32_t f_mul(uint32_t a, uint32_t b) {
    uint64_t t = (uint64_t)a * b;
    uint32_t lo = (uint32_t)(t & P31);
    uint32_t hi = (uint32_t)(t >> 31);
    uint32_t s = lo + hi;
    return s >= P31 ? s - P31 : s;
}

struct Q4 {
    uint32_t a, b, c, d;
};

inline Q4 q4_add(Q4 x, Q4 y) {
    return {f_add(x.a, y.a), f_add(x.b, y.b), f_add(x.c, y.c),
            f_add(x.d, y.d)};
}
inline Q4 q4_sub(Q4 x, Q4 y) {
    return {f_sub(x.a, y.a), f_sub(x.b, y.b), f_sub(x.c, y.c),
            f_sub(x.d, y.d)};
}
inline Q4 q4_mul_m31(Q4 x, uint32_t s) {
    return {f_mul(x.a, s), f_mul(x.b, s), f_mul(x.c, s), f_mul(x.d, s)};
}
// (p + q*u)(r + s*u) = pr + (2+i) qs + (ps + qr) u, u^2 = 2+i
// (core/qm31.py::q_mul)
inline Q4 q4_mul(Q4 x, Q4 y) {
    uint32_t pr_re = f_sub(f_mul(x.a, y.a), f_mul(x.b, y.b));
    uint32_t pr_im = f_add(f_mul(x.a, y.b), f_mul(x.b, y.a));
    uint32_t qs_re = f_sub(f_mul(x.c, y.c), f_mul(x.d, y.d));
    uint32_t qs_im = f_add(f_mul(x.c, y.d), f_mul(x.d, y.c));
    uint32_t ps_re = f_sub(f_mul(x.a, y.c), f_mul(x.b, y.d));
    uint32_t ps_im = f_add(f_mul(x.a, y.d), f_mul(x.b, y.c));
    uint32_t qr_re = f_sub(f_mul(x.c, y.a), f_mul(x.d, y.b));
    uint32_t qr_im = f_add(f_mul(x.c, y.b), f_mul(x.d, y.a));
    uint32_t rqs_re = f_sub(f_add(qs_re, qs_re), qs_im);
    uint32_t rqs_im = f_add(f_add(qs_im, qs_im), qs_re);
    return {f_add(pr_re, rqs_re), f_add(pr_im, rqs_im), f_add(ps_re, qr_re),
            f_add(ps_im, qr_im)};
}

inline Q4 q4_load(const uint32_t* p) { return {p[0], p[1], p[2], p[3]}; }
inline void q4_store(uint32_t* p, Q4 v) {
    p[0] = v.a;
    p[1] = v.b;
    p[2] = v.c;
    p[3] = v.d;
}

// fold = (l + r) + alpha * (l - r) * inv
inline Q4 q4_fold(Q4 l, Q4 r, Q4 alpha, uint32_t inv) {
    return q4_add(q4_add(l, r), q4_mul(q4_mul_m31(q4_sub(l, r), inv), alpha));
}

constexpr int ERR_MIX_MISMATCH = -5;
constexpr int ERR_LAST_LAYER = -6;

}  // namespace

extern "C" {

// See the Python caller (verifier/hints.py::prepare, native branch) for
// the exact layout contract of every buffer.
int rstpu_fri_fold_hints(
    uint32_t B, uint32_t Q, uint32_t M, uint32_t n_groups,
    const uint32_t* group_logs,  // descending, group_logs[0] == M
    uint32_t n_inner, const int64_t* raw_queries,  // (B, Q) at M
    const uint32_t* answers,                       // (n_groups, B, Q, 4)
    const uint32_t* alphas, uint32_t n_alpha,      // (n_alpha, B, 4)
    const uint32_t* yinv_fl,                       // (n_groups, B, Q)
    const uint32_t* xinv_inner,                    // (n_inner, B, Q)
    const uint32_t* fl_wit, const uint64_t* fl_wit_off,  // rows of 4, (B+1)
    const uint32_t* fl_hw, const uint64_t* fl_hw_off,    // rows of 8, (B+1)
    const uint32_t* fl_roots,                            // (B, 8)
    const uint32_t* in_wit, const uint64_t* in_wit_off,  // (n_inner*B+1)
    const uint32_t* in_hw, const uint64_t* in_hw_off,    // (n_inner*B+1)
    const uint32_t* in_roots,                            // (n_inner, B, 8)
    const uint32_t* ll_coeffs, uint32_t n_coeffs,        // (B, n_coeffs, 4)
    const uint32_t* ll_xs, uint32_t n_doubles,           // (n_doubles, B, Q)
    uint32_t* fl_sib, uint32_t* fl_self, uint32_t* fl_sibc,
    uint32_t* in_sib, uint32_t* in_self, uint32_t* in_sibc,
    uint32_t flavor) {
    // ---- phase 1: first-layer rebuild + circle folds, per proof ----
    std::vector<std::vector<uint32_t>> streams(B);
    // folded_evals[bi][g]: folds in sorted pair order
    std::vector<std::vector<std::vector<Q4>>> folded_evals(B);
    // per (bi): folded_state as sorted (key, value) pairs
    std::vector<std::vector<std::pair<int64_t, Q4>>> folded(B);

    for (uint32_t bi = 0; bi < B; ++bi) {
        const int64_t* raw = raw_queries + (size_t)bi * Q;
        const uint32_t* wit = fl_wit + fl_wit_off[bi] * 4;
        size_t wn = fl_wit_off[bi + 1] - fl_wit_off[bi], wcur = 0;
        folded_evals[bi].resize(n_groups);
        auto& stream = streams[bi];
        for (uint32_t g = 0; g < n_groups; ++g) {
            uint32_t L = group_logs[g];
            // qL sorted unique + last-occurrence answer index per query
            std::vector<std::pair<int64_t, uint32_t>> q_qi(Q);
            for (uint32_t qi = 0; qi < Q; ++qi)
                q_qi[qi] = {raw[qi] >> (M - L), qi};
            std::sort(q_qi.begin(), q_qi.end());
            // dedup keeping the LAST qi for each query (matches the
            // Python dict built in raw order: later occurrences win)
            std::vector<std::pair<int64_t, uint32_t>> uq;
            for (auto& p : q_qi) {
                // q_qi sorted by (query, qi): max qi per query is last
                if (!uq.empty() && uq.back().first == p.first)
                    uq.back().second = p.second;
                else
                    uq.push_back(p);
            }
            const uint32_t* ans =
                answers + (((size_t)g * B + bi) * Q) * 4;
            const uint32_t* yrow = yinv_fl + ((size_t)g * B + bi) * Q;
            Q4 alpha = q4_load(alphas + ((size_t)(M - L) * B + bi) * 4);
            auto& fe = folded_evals[bi][g];
            size_t i = 0;
            while (i < uq.size()) {
                int64_t qq = uq[i].first;
                int64_t start = (qq >> 1) << 1;
                uint32_t rep_qi = uq[i].second;
                Q4 vals[2];
                bool have[2] = {false, false};
                vals[qq - start] = q4_load(ans + (size_t)uq[i].second * 4);
                have[qq - start] = true;
                ++i;
                if (i < uq.size() && uq[i].first == start + 1) {
                    vals[1] = q4_load(ans + (size_t)uq[i].second * 4);
                    have[1] = true;
                    ++i;
                }
                for (int slot = 0; slot < 2; ++slot) {
                    if (!have[slot]) {
                        if (wcur >= wn) return ERR_VALUES_EXHAUSTED;
                        vals[slot] = q4_load(wit + wcur * 4);
                        ++wcur;
                    }
                }
                stream.insert(stream.end(),
                              {vals[0].a, vals[0].b, vals[0].c, vals[0].d,
                               vals[1].a, vals[1].b, vals[1].c, vals[1].d});
                fe.push_back(
                    q4_fold(vals[0], vals[1], alpha, yrow[rep_qi]));
            }
        }
        if (wcur != wn) return ERR_UNCONSUMED;
        // initial folded state: {qq >> 1: 0}
        std::vector<int64_t> keys(Q);
        for (uint32_t qi = 0; qi < Q; ++qi) keys[qi] = raw[qi] >> 1;
        std::sort(keys.begin(), keys.end());
        keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
        for (int64_t k : keys) folded[bi].push_back({k, {0, 0, 0, 0}});
    }

    // ---- phase 2: first-layer pair-path expansion over all proofs ----
    {
        std::vector<uint64_t> voff(B + 1, 0);
        size_t total = 0;
        for (uint32_t bi = 0; bi < B; ++bi) total += streams[bi].size();
        std::vector<uint32_t> vals(total);
        size_t pos = 0;
        for (uint32_t bi = 0; bi < B; ++bi) {
            voff[bi] = pos;
            std::memcpy(vals.data() + pos, streams[bi].data(),
                        4 * streams[bi].size());
            pos += streams[bi].size();
        }
        voff[B] = pos;
        int rc = rstpu_expand_pair_paths(
            B, n_groups, group_logs, M, Q, raw_queries, vals.data(),
            voff.data(), fl_hw, fl_hw_off, fl_roots, fl_sib, fl_self,
            fl_sibc, flavor);
        if (rc) return rc;
    }

    // ---- phase 3: inner layers ----
    uint32_t log_size = M;
    // output slab offsets per layer (depth_out_i = max(log_size_i - 1, 0))
    size_t in_sib_pos = 0, in_cols_pos = 0;
    std::vector<int64_t> layer_queries((size_t)B * Q);
    for (uint32_t li = 0; li < n_inner; ++li) {
        // mix in first-layer folds if log_size matches a group
        int gmatch = -1;
        for (uint32_t g = 0; g < n_groups; ++g)
            if (group_logs[g] == log_size) gmatch = (int)g;
        if (gmatch >= 0) {
            for (uint32_t bi = 0; bi < B; ++bi) {
                auto& fs = folded[bi];
                auto& fe = folded_evals[bi][gmatch];
                if (fs.size() != fe.size()) return ERR_MIX_MISMATCH;
                Q4 a = q4_load(alphas + ((size_t)li * B + bi) * 4);
                Q4 a2 = q4_mul(a, a);
                for (size_t j = 0; j < fs.size(); ++j)
                    fs[j].second = q4_add(q4_mul(a2, fs[j].second), fe[j]);
            }
        }
        log_size -= 1;

        for (uint32_t bi = 0; bi < B; ++bi) streams[bi].clear();
        for (uint32_t bi = 0; bi < B; ++bi) {
            auto& fs = folded[bi];  // sorted by key
            size_t w0 = in_wit_off[(size_t)li * B + bi];
            const uint32_t* wit = in_wit + w0 * 4;
            size_t wn = in_wit_off[(size_t)li * B + bi + 1] - w0, wcur = 0;
            const uint32_t* xrow = xinv_inner + ((size_t)li * B + bi) * Q;
            const int64_t* raw = raw_queries + (size_t)bi * Q;
            Q4 a_next = q4_load(alphas + ((size_t)(li + 1) * B + bi) * 4);
            // pair start -> representative query index (for xinv lookup)
            std::unordered_map<int64_t, uint32_t> rep;
            for (uint32_t qi = 0; qi < Q; ++qi)
                rep[(raw[qi] >> (li + 2)) << 1] = qi;
            std::vector<std::pair<int64_t, Q4>> next;
            auto& stream = streams[bi];
            for (size_t j = 0; j < fs.size(); ++j) {
                int64_t k = fs[j].first;
                int64_t left_idx = (k >> 1) << 1;
                if (!next.empty() && next.back().first == (left_idx >> 1))
                    continue;  // second half of a both-present pair
                Q4 l, r;
                bool sib_present =
                    (j + 1 < fs.size() && fs[j + 1].first == (k ^ 1));
                if (k & 1) {
                    // self is odd: sibling (even) must come from earlier
                    // element or witness; since fs is sorted, k-1 present
                    // would have been handled as the pair's even half
                    if (wcur >= wn) return ERR_VALUES_EXHAUSTED;
                    l = q4_load(wit + wcur * 4);
                    ++wcur;
                    r = fs[j].second;
                } else {
                    l = fs[j].second;
                    if (sib_present) {
                        r = fs[j + 1].second;
                    } else {
                        if (wcur >= wn) return ERR_VALUES_EXHAUSTED;
                        r = q4_load(wit + wcur * 4);
                        ++wcur;
                    }
                }
                stream.insert(stream.end(),
                              {l.a, l.b, l.c, l.d, r.a, r.b, r.c, r.d});
                auto rit = rep.find(left_idx);
                if (rit == rep.end()) return ERR_MIX_MISMATCH;
                next.push_back(
                    {left_idx >> 1, q4_fold(l, r, a_next, xrow[rit->second])});
            }
            if (wcur != wn) return ERR_UNCONSUMED;
            fs = std::move(next);
        }

        // pair expansion for this layer
        for (uint32_t bi = 0; bi < B; ++bi) {
            const int64_t* raw = raw_queries + (size_t)bi * Q;
            for (uint32_t qi = 0; qi < Q; ++qi)
                layer_queries[(size_t)bi * Q + qi] = raw[qi] >> (M - log_size);
        }
        std::vector<uint64_t> voff(B + 1, 0);
        size_t total = 0;
        for (uint32_t bi = 0; bi < B; ++bi) total += streams[bi].size();
        std::vector<uint32_t> vals(total);
        size_t pos = 0;
        for (uint32_t bi = 0; bi < B; ++bi) {
            voff[bi] = pos;
            std::memcpy(vals.data() + pos, streams[bi].data(),
                        4 * streams[bi].size());
            pos += streams[bi].size();
        }
        voff[B] = pos;
        uint32_t dl[1] = {log_size};
        uint32_t depth_out = log_size > 0 ? log_size - 1 : 0;
        // expansion expects offsets relative to its hash-witness base
        uint64_t h0 = in_hw_off[(size_t)li * B];
        std::vector<uint64_t> hoff(B + 1);
        for (uint32_t bi = 0; bi <= B; ++bi)
            hoff[bi] = in_hw_off[(size_t)li * B + bi] - h0;
        int rc = rstpu_expand_pair_paths(
            B, 1, dl, log_size, Q, layer_queries.data(), vals.data(),
            voff.data(), in_hw + h0 * 8, hoff.data(),
            in_roots + (size_t)li * B * 8, in_sib + in_sib_pos,
            in_self + in_cols_pos, in_sibc + in_cols_pos, flavor);
        if (rc) return rc;
        in_sib_pos += (size_t)B * Q * depth_out * 8;
        in_cols_pos += (size_t)B * Q * 4;
    }

    // ---- phase 4: last-layer consistency ----
    for (uint32_t bi = 0; bi < B; ++bi) {
        auto& fs = folded[bi];
        const int64_t* raw = raw_queries + (size_t)bi * Q;
        std::unordered_map<int64_t, uint32_t> rep;
        for (uint32_t qi = 0; qi < Q; ++qi)
            rep[raw[qi] >> (n_inner + 1)] = qi;
        const uint32_t* coeffs = ll_coeffs + (size_t)bi * n_coeffs * 4;
        std::vector<Q4> v(n_coeffs);
        for (auto& kv : fs) {
            auto rit = rep.find(kv.first);
            if (rit == rep.end()) return ERR_LAST_LAYER;
            uint32_t qi = rit->second;
            for (uint32_t c = 0; c < n_coeffs; ++c)
                v[c] = q4_load(coeffs + (size_t)c * 4);
            uint32_t m = n_coeffs;
            for (int d = (int)n_doubles - 1; d >= 0; --d) {
                uint32_t x = ll_xs[((size_t)d * B + bi) * Q + qi];
                m >>= 1;
                for (uint32_t c = 0; c < m; ++c)
                    v[c] = q4_add(v[2 * c], q4_mul_m31(v[2 * c + 1], x));
            }
            Q4 got = kv.second;
            if (v[0].a != got.a || v[0].b != got.b || v[0].c != got.c ||
                v[0].d != got.d)
                return ERR_LAST_LAYER;
        }
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// OODS quotient ("FRI answer") evaluation — C++ twin of
// verifier/quotients.py::fri_answers_for_group over all groups (reference
// quotient math: components/recursive/answer/src/data_structures.rs:70-189).
// The numpy version is fully vectorized but per-op overhead dominated the
// host hint-preparation budget at small batch; here the whole (B, Q, C)
// accumulation is flat scalar code.
// ---------------------------------------------------------------------------

namespace {

struct C2 {
    uint32_t re, im;
};

inline C2 c2_add(C2 x, C2 y) { return {f_add(x.re, y.re), f_add(x.im, y.im)}; }
inline C2 c2_sub(C2 x, C2 y) { return {f_sub(x.re, y.re), f_sub(x.im, y.im)}; }
inline C2 c2_mul(C2 x, C2 y) {
    return {f_sub(f_mul(x.re, y.re), f_mul(x.im, y.im)),
            f_add(f_mul(x.re, y.im), f_mul(x.im, y.re))};
}

inline uint32_t f_inv(uint32_t a) {
    // a^(P-2) via square-and-multiply (P = 2^31 - 1: exponent is 29 ones
    // then 0 1 — use a simple MSB-first ladder)
    uint64_t e = 2147483645ull;
    uint32_t result = 1, base = a;
    while (e) {
        if (e & 1) result = f_mul(result, base);
        base = f_mul(base, base);
        e >>= 1;
    }
    return result;
}

inline C2 c2_inv(C2 x) {
    // 1/(a+bi) = (a-bi)/(a^2+b^2)  (core/qm31.py::c_inv)
    uint32_t norm = f_add(f_mul(x.re, x.re), f_mul(x.im, x.im));
    uint32_t ninv = f_inv(norm);
    return {f_mul(x.re, ninv), f_mul(f_sub(0, x.im), ninv)};
}

// q * cm31 (core/qm31.py::q_mul_cm31)
inline Q4 q4_mul_c2(Q4 x, C2 s) {
    C2 first = c2_mul({x.a, x.b}, s);
    C2 second = c2_mul({x.c, x.d}, s);
    return {first.re, first.im, second.re, second.im};
}

}  // namespace

extern "C" {

// answers (n_groups, B, Q, 4) for all quotient groups.
//
//   samples_flat (B, S, 4); queried_rows: concat of per-group (B, Q, C_g)
//   slabs with qr_off (n_groups+1) element offsets; dom_x/dom_y
//   (n_groups, B, Q); rc (B, 4); per-batch metadata: batch_group,
//   batch_ncols (nb), col indices (local, sample) flattened with
//   batch_col_off (nb+1), batch px/py (nb, B, 4) QM31 components.
int rstpu_fri_answers(
    uint32_t B, uint32_t Q, uint32_t n_groups, const uint32_t* group_ncols,
    const uint32_t* samples_flat, uint32_t S, const uint32_t* queried_rows,
    const uint64_t* qr_off, const uint32_t* dom_x, const uint32_t* dom_y,
    const uint32_t* rc, uint32_t nb, const uint32_t* batch_group,
    const uint32_t* batch_ncols, const uint64_t* batch_col_off,
    const uint32_t* local_idx, const uint32_t* sample_idx,
    const uint32_t* batch_px, const uint32_t* batch_py, uint32_t* out) {
    const Q4 NEG2U = {0, 0, P31 - 2, 0};
    std::vector<Q4> acc((size_t)B * Q);
    std::vector<Q4> A_row, B_row, C_row;  // per-column line coefficients
    for (uint32_t g = 0; g < n_groups; ++g) {
        for (auto& v : acc) v = {0, 0, 0, 0};
        const uint32_t* qr = queried_rows + qr_off[g];
        uint32_t Cg = group_ncols[g];
        const uint32_t* gx = dom_x + ((size_t)g * B) * Q;
        const uint32_t* gy = dom_y + ((size_t)g * B) * Q;
        for (uint32_t bi = 0; bi < B; ++bi) {
            Q4 rck = {1, 0, 0, 0};  // rc^k chain, restarts per group/proof
            Q4 rcv = q4_load(rc + (size_t)bi * 4);
            for (uint32_t b = 0; b < nb; ++b) {
                if (batch_group[b] != g) {
                    // rc power chain only advances within this group
                    continue;
                }
                uint32_t C = batch_ncols[b];
                const uint32_t* li = local_idx + batch_col_off[b];
                const uint32_t* si = sample_idx + batch_col_off[b];
                Q4 px = q4_load(batch_px + ((size_t)b * B + bi) * 4);
                Q4 py = q4_load(batch_py + ((size_t)b * B + bi) * 4);
                C2 y0 = {py.a, py.b}, y1 = {py.c, py.d};
                A_row.resize(C);
                B_row.resize(C);
                C_row.resize(C);
                for (uint32_t c = 0; c < C; ++c) {
                    const uint32_t* sv =
                        samples_flat + ((size_t)bi * S + si[c]) * 4;
                    C2 v0 = {sv[0], sv[1]}, v1 = {sv[2], sv[3]};
                    Q4 alpha = q4_mul(rck, NEG2U);
                    rck = q4_mul(rck, rcv);
                    C2 b_c = c2_sub(c2_mul(v0, y1), c2_mul(v1, y0));
                    // per-column line coefficients, hoisted out of the
                    // query loop: A = alpha*a, B = alpha*b, C = alpha*c
                    A_row[c] = q4_mul_c2(alpha, v1);
                    B_row[c] = q4_mul_c2(alpha, b_c);
                    C_row[c] = q4_mul_c2(alpha, y1);
                }
                for (uint32_t qi = 0; qi < Q; ++qi) {
                    uint32_t dx = gx[(size_t)bi * Q + qi];
                    uint32_t dy = gy[(size_t)bi * Q + qi];
                    Q4 numer = {0, 0, 0, 0};
                    const uint32_t* row =
                        qr + ((size_t)bi * Q + qi) * Cg;
                    for (uint32_t c = 0; c < C; ++c) {
                        uint32_t val = row[li[c]];
                        Q4 term = q4_sub(
                            q4_mul_m31(C_row[c], val),
                            q4_add(q4_mul_m31(A_row[c], dy), B_row[c]));
                        numer = q4_add(numer, term);
                    }
                    // denominator: (px.first - dx) * py.second -
                    //              (py.first - dy) * px.second
                    C2 prx = {f_sub(px.a, dx), px.b};
                    C2 pry = {f_sub(py.a, dy), py.b};
                    C2 pix = {px.c, px.d}, piy = {py.c, py.d};
                    C2 den = c2_sub(c2_mul(prx, piy), c2_mul(pry, pix));
                    C2 dinv = c2_inv(den);
                    acc[(size_t)bi * Q + qi] = q4_add(
                        acc[(size_t)bi * Q + qi],
                        q4_mul_c2(numer, dinv));
                }
            }
        }
        for (uint32_t bi = 0; bi < B; ++bi)
            for (uint32_t qi = 0; qi < Q; ++qi)
                q4_store(out + (((size_t)g * B + bi) * Q + qi) * 4,
                         acc[(size_t)bi * Q + qi]);
    }
    return 0;
}

}  // extern "C"
