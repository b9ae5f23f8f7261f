"""Host-side (numpy) hint preparation: expand stwo's shared-ancestor Merkle
decommitments into fixed-shape per-query paths, and replay the FRI folds to
recover the pair-proof value tensors the device verifier consumes.

This is untrusted precomputation (the device re-derives and checks all of
it); it mirrors the reference hint layer:
  - SinglePathMerkleProof::from_stwo_proof   (hints/decommit.rs:44-183)
  - SinglePairMerkleProof::from_stwo_proof   (hints/folding.rs:93-287)
  - FirstLayerHints / InnerLayersHints       (hints/folding.rs:296-601)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..core import circle, m31, poseidon2
from ..core import qm31 as q
from ..core.qm31 import QM31
from ..proof.containers import MerkleDecommitment, PlonkWithPoseidonProof
from . import points as points_mod
from . import quotients, transcript
from .arrays import PairPaths, ProofArrays, TreePaths, from_proofs
from .spec import VerifierSpec


# ---------------------------------------------------------------------------
# Scalar (host) Poseidon31 Merkle hashing
# ---------------------------------------------------------------------------

def _permute16(state16: np.ndarray) -> np.ndarray:
    return poseidon2.permute(state16.astype(np.uint32))


def hash_column_capacity(cols: np.ndarray) -> np.ndarray:
    """Absorb M31 columns (chunks of 8) into the capacity half."""
    n = len(cols)
    digest = np.zeros(8, np.uint32)
    if n == 0:
        return digest
    n_chunks = (n + 7) // 8
    for ci in range(n_chunks):
        chunk = np.zeros(8, np.uint32)
        part = cols[8 * ci : 8 * ci + 8]
        chunk[: len(part)] = part
        digest = _permute16(np.concatenate([chunk, digest]))[8:]
    return digest


def hash_node(children, cols: np.ndarray) -> np.ndarray:
    """stwo Poseidon31MerkleHasher::hash_node (gadget mirror merkle/lib.rs)."""
    cols = np.asarray(cols, np.uint32)
    if children is None:
        digest = hash_column_capacity(cols)
        return _permute16(np.concatenate([np.zeros(8, np.uint32), digest]))[:8]
    left, right = children
    h = _permute16(np.concatenate([left, right]))[:8]
    if len(cols):
        col_digest = hash_column_capacity(cols)
        h = _permute16(np.concatenate([h, col_digest]))[:8]
    return h


# ---------------------------------------------------------------------------
# Commitment-tree path expansion (single-path proofs)
# ---------------------------------------------------------------------------


def _take(it, what: str):
    """next(it) with witness exhaustion reported as a clean rejection."""
    try:
        return next(it)
    except StopIteration:
        raise AssertionError(f"{what} witness exhausted (corrupted proof?)")

def expand_single_paths(
    max_log: int,
    raw_queries: List[int],
    values: np.ndarray,
    n_columns_per_log_size: Dict[int, int],
    decommitment: MerkleDecommitment,
    root: np.ndarray,
    hash_node_fn=None,
):
    """Per-query standalone paths from a shared stwo decommitment.

    Returns (sibling_hashes (Q, max_log, 8), columns {log->(Q, n)}).
    hash_node_fn overrides the Poseidon31 node hash (e.g. the SHA-256
    flavor, verifier/sha256_merkle.py)."""
    hash_node_ = hash_node_fn or hash_node
    queries = sorted(set(raw_queries))
    vit = iter(values)
    n_top = n_columns_per_log_size[max_log]

    queries_values = {}
    for qq in queries:
        queries_values[qq] = np.array([next(vit) for _ in range(n_top)], np.uint32)

    assert len(decommitment.column_witness) == 0
    hit = iter(decommitment.hash_witness)

    hash_layers: List[Dict[int, np.ndarray]] = [
        {qq: hash_node_(None, queries_values[qq]) for qq in queries}
    ]
    column_layers: List[Dict[int, np.ndarray]] = []
    positions = sorted(queries)

    for i in range(max_log):
        layer: Dict[int, np.ndarray] = {}
        column_layer: Dict[int, np.ndarray] = {}
        parents = []
        for position in positions:
            if (position >> 1) in layer:
                continue
            sibling_idx = position ^ 1
            ncols = n_columns_per_log_size.get(max_log - 1 - i, 0)
            cols = np.array([_take(vit, 'value') for _ in range(ncols)], np.uint32)
            column_layer[position >> 1] = cols
            if sibling_idx not in hash_layers[i]:
                hash_layers[i][sibling_idx] = np.asarray(_take(hit, 'hash'), np.uint32)
            sibling = hash_layers[i][sibling_idx]
            own = hash_layers[i][position]
            pair = (own, sibling) if position & 1 == 0 else (sibling, own)
            layer[position >> 1] = hash_node_(pair, cols)
            parents.append(position >> 1)
        column_layers.append(column_layer)
        hash_layers.append(layer)
        positions = sorted(set(parents))

    assert next(hit, None) is None
    assert next(vit, None) is None
    assert np.array_equal(hash_layers[-1][0], root), "tree root mismatch"

    Q = len(raw_queries)
    sib = np.zeros((Q, max_log, 8), np.uint32)
    columns: Dict[int, np.ndarray] = {
        max_log: np.zeros((Q, n_top), np.uint32)
    }
    for lvl, ncols in n_columns_per_log_size.items():
        if lvl != max_log:
            columns[lvl] = np.zeros((Q, ncols), np.uint32)

    for qi, qq in enumerate(raw_queries):
        cur = qq
        for i in range(max_log):
            sib[qi, i] = hash_layers[i][cur ^ 1]
            cur >>= 1
        columns[max_log][qi] = queries_values[qq]
        cur = qq >> 1
        for i, layer in enumerate(column_layers[: max_log - 1]):
            data = layer[cur]
            lvl = max_log - i - 1
            if len(data):
                columns[lvl][qi] = data
            cur >>= 1
    return sib, columns


# ---------------------------------------------------------------------------
# FRI pair-proof expansion
# ---------------------------------------------------------------------------

def expand_pair_paths(
    log_sizes_with_data: List[int],
    root: np.ndarray,
    leaf_queries: List[int],
    values: np.ndarray,
    decommitment: MerkleDecommitment,
    hash_node_fn=None,
):
    """Per-query pair paths (self+sibling QM31 per data level, shared sibling
    hashes).  Returns (sibling_hashes (Q, depth-1, 8),
    self_cols {log->(Q,4)}, sib_cols {log->(Q,4)})."""
    hash_node_ = hash_node_fn or hash_node
    max_log = max(log_sizes_with_data)
    data_set = set(log_sizes_with_data)
    assert len(decommitment.column_witness) == 0

    vit = iter(values)
    hit = iter(decommitment.hash_witness)

    queries = list(leaf_queries)
    queries_values_map: Dict[int, Dict[int, np.ndarray]] = {}
    hash_layers: List[Dict[int, np.ndarray]] = []

    for current in range(max_log, -1, -1):
        queries = sorted(set(queries))
        if current in data_set:
            self_and_sib = sorted({v for qq in queries for v in (qq, qq ^ 1)})
            qv: Dict[int, np.ndarray] = {}
            for k in self_and_sib:
                qv[k] = np.array([next(vit) for _ in range(4)], np.uint32)
            layer: Dict[int, np.ndarray] = {}
            for qq, val in qv.items():
                if current == max_log:
                    layer[qq] = hash_node_(None, val)
                else:
                    l_idx, r_idx = qq << 1, (qq << 1) + 1
                    for idx in (l_idx, r_idx):
                        if idx not in hash_layers[-1]:
                            hash_layers[-1][idx] = np.asarray(_take(hit, 'hash'), np.uint32)
                    layer[qq] = hash_node_(
                        (hash_layers[-1][l_idx], hash_layers[-1][r_idx]), val
                    )
            queries_values_map[current] = qv
            hash_layers.append(layer)
        else:
            assert current != max_log
            layer = {}
            for qq in queries:
                l_idx, r_idx = qq << 1, (qq << 1) + 1
                for idx in (l_idx, r_idx):
                    if idx not in hash_layers[-1]:
                        hash_layers[-1][idx] = np.asarray(_take(hit, 'hash'), np.uint32)
                layer[qq] = hash_node_(
                    (hash_layers[-1][l_idx], hash_layers[-1][r_idx]), np.array([])
                )
            hash_layers.append(layer)
        queries = [qq >> 1 for qq in queries]

    assert next(vit, None) is None
    assert next(hit, None) is None
    assert len(hash_layers[-1]) == 1 and np.array_equal(hash_layers[-1][0], root)

    Q = len(leaf_queries)
    depth = max_log
    sib = np.zeros((Q, max(depth - 1, 0), 8), np.uint32)
    self_cols = {lvl: np.zeros((Q, 4), np.uint32) for lvl in data_set}
    sib_cols = {lvl: np.zeros((Q, 4), np.uint32) for lvl in data_set}

    for qi, leaf_q in enumerate(leaf_queries):
        query = leaf_q
        si = 0
        for current in range(max_log, 0, -1):
            if current in data_set:
                self_cols[current][qi] = queries_values_map[current][query]
                sib_cols[current][qi] = queries_values_map[current][query ^ 1]
                if current != max_log:
                    sl, sr = (query ^ 1) << 1, ((query ^ 1) << 1) + 1
                    hl = hash_layers[max_log - current - 1]
                    sib[qi, si] = hash_node_((hl[sl], hl[sr]), np.array([]))
                    si += 1
            else:
                sib[qi, si] = hash_layers[max_log - current][query ^ 1]
                si += 1
            query >>= 1
    return sib, self_cols, sib_cols


# ---------------------------------------------------------------------------
# FRI folding replay (host)
# ---------------------------------------------------------------------------

def _qm31_of(arr4) -> QM31:
    a = np.asarray(arr4, np.uint32)
    return QM31(a[..., 0], a[..., 1], a[..., 2], a[..., 3])


def _qm31_tuple(x: QM31, i=None):
    if i is None:
        return tuple(int(np.asarray(v).ravel()[0]) for v in x)
    return (int(x.a[i]), int(x.b[i]), int(x.c[i]), int(x.d[i]))


def rebuild_first_layer_evals(
    sorted_queries: List[int],
    log_size: int,
    query_evals: List[Tuple[int, int, int, int]],
    witness_iter,
):
    """Insert witness siblings; returns (pairs [(pos0, v_even, v_odd)], in
    sorted subset order) — hints/folding.rs:414-451."""
    queries = sorted(set(sorted_queries))
    qe = iter(query_evals)
    pairs = []
    i = 0
    while i < len(queries):
        qq = queries[i]
        start = (qq >> 1) << 1
        subset = [qq]
        if i + 1 < len(queries) and queries[i + 1] == start + 1:
            subset.append(queries[i + 1])
            i += 2
        else:
            i += 1
        vals = []
        it_subset = iter(subset)
        nxt = next(it_subset, None)
        for pos in (start, start + 1):
            if nxt == pos:
                vals.append(next(qe))
                nxt = next(it_subset, None)
            else:
                vals.append(next(witness_iter))
        pairs.append((start, vals[0], vals[1]))
    return pairs


def fold_circle_pair(v_even, v_odd, pos0: int, log_size: int, alpha: QM31) -> tuple:
    """(l+r) + alpha * (l-r) / y  at the even position's domain point."""
    dom = circle.CircleDomain(circle.Coset.half_odds(log_size - 1))
    _, py = dom.at(circle.bit_reverse_index(pos0, log_size))
    yinv = int(m31.inv(np.uint32(py)))
    l = q.q_scalar(*v_even)
    r = q.q_scalar(*v_odd)
    f0 = q.q_add(l, r)
    f1 = q.q_mul_m31(q.q_sub(l, r), np.uint32(yinv))
    return _qm31_tuple(q.q_add(f0, q.q_mul(f1, alpha)))


def fold_line_pair(v_even, v_odd, left_idx: int, log_size: int, alpha: QM31) -> tuple:
    """(l+r) + alpha * (l-r) / x at half_odds(log_size) bit-reversed index."""
    px, _ = circle.Coset.half_odds(log_size).at(
        circle.bit_reverse_index(left_idx, log_size)
    )
    xinv = int(m31.inv(np.uint32(px)))
    l = q.q_scalar(*v_even)
    r = q.q_scalar(*v_odd)
    f0 = q.q_add(l, r)
    f1 = q.q_mul_m31(q.q_sub(l, r), np.uint32(xinv))
    return _qm31_tuple(q.q_add(f0, q.q_mul(f1, alpha)))


# ---------------------------------------------------------------------------
# Full host preparation pipeline
# ---------------------------------------------------------------------------

def _stack_tree_paths(per_proof: List[tuple]) -> TreePaths:
    sib = np.stack([p[0] for p in per_proof])
    keys = per_proof[0][1].keys()
    cols = {k: np.stack([p[1][k] for p in per_proof]) for k in keys}
    return TreePaths(sibling_hashes=sib, columns=cols)


def _stack_pair_paths(per_proof: List[tuple]) -> PairPaths:
    sib = np.stack([p[0] for p in per_proof])
    keys = per_proof[0][1].keys()
    self_cols = {k: np.stack([p[1][k] for p in per_proof]) for k in keys}
    sib_cols = {k: np.stack([p[2][k] for p in per_proof]) for k in keys}
    return PairPaths(sibling_hashes=sib, self_columns=self_cols, sibling_columns=sib_cols)


def host_fri_answers(spec: VerifierSpec, fs, pa: ProofArrays, tree_paths):
    """Quotients per group in raw-query order (numpy), (B, Q) QM31 per group."""
    oods = points_mod.oods_point_from_t(fs.oods_t)
    half_pts = points_mod.half_index_points(
        spec, fs.raw_queries, spec.final_fold_log
    )
    answers = []
    for g, L in enumerate(spec.all_log_sizes):
        qL = transcript.queries_at_log_size(spec, fs.raw_queries, L)
        dx, dyq, _ = points_mod.domain_point(half_pts[L], qL)
        row_parts = [
            tree_paths[t].columns[L]
            for t in range(4)
            if L in tree_paths[t].columns
        ]
        rows = np.concatenate(row_parts, axis=-1)
        assert rows.shape[-1] == len(spec.group_columns[g])
        answers.append(
            quotients.fri_answers_for_group(
                spec, g, oods, fs.after_sampled_values_random_coeff,
                pa.samples_flat, rows, dx, dyq,
            )
        )
    return answers


def prepare(
    spec: VerifierSpec,
    proofs: List[PlonkWithPoseidonProof],
    arrays_fn=from_proofs,
    transcript_fn=None,
    hash_node_fn=None,
) -> ProofArrays:
    """Parse -> transcript replay -> path expansion -> batched tensors.

    arrays_fn/transcript_fn default to the with-poseidon flavor; pass
    (arrays.from_proofs_np, transcript.run_transcript_np) for
    PlonkWithoutPoseidon proofs — everything below is spec-generic.
    hash_node_fn overrides the Merkle node hash (SHA-256 flavors)."""
    pa = arrays_fn(spec, proofs)
    fs = (transcript_fn or transcript.run_transcript)(spec, pa)
    B = len(proofs)
    M = spec.max_first_layer_log

    # commitment-tree paths
    tree_paths = []
    for t in range(4):
        depth = spec.tree_max_domain_log[t]
        per_proof = []
        for bi, proof in enumerate(proofs):
            raw = [
                int(v) >> (M - depth)
                for v in (fs.raw_queries[bi] & np.uint32((1 << M) - 1))
            ]
            per_proof.append(
                expand_single_paths(
                    depth,
                    raw,
                    proof.stark_proof.queried_values[t],
                    spec.n_columns_per_log_size[t],
                    proof.stark_proof.decommitments[t],
                    proof.stark_proof.commitments[t],
                    hash_node_fn=hash_node_fn,
                )
            )
        tree_paths.append(_stack_tree_paths(per_proof))

    answers = host_fri_answers(spec, fs, pa, tree_paths)

    # first FRI layer: rebuild full pair evals, fold, expand pair paths
    fl_per_proof = []
    folded_evals_all = []  # per proof: {L: [folded (sorted pair order)]}
    for bi, proof in enumerate(proofs):
        raw_all = [int(v) for v in (fs.raw_queries[bi] & np.uint32((1 << M) - 1))]
        witness_iter = iter(
            tuple(int(x) for x in row)
            for row in proof.stark_proof.fri_proof.first_layer.fri_witness
        )
        stream = []
        folded_evals = {}
        for g, L in enumerate(spec.all_log_sizes):
            qL_raw = [v >> (M - L) for v in raw_all]
            sorted_q = sorted(set(qL_raw))
            ans_map = {}
            for qi, qq in enumerate(qL_raw):
                ans_map[qq] = (
                    int(answers[g].a[bi, qi]),
                    int(answers[g].b[bi, qi]),
                    int(answers[g].c[bi, qi]),
                    int(answers[g].d[bi, qi]),
                )
            query_evals = [ans_map[qq] for qq in sorted_q]
            pairs = rebuild_first_layer_evals(sorted_q, L, query_evals, witness_iter)
            alpha = fs.fri_alphas[M - L]
            alpha_b = QM31(
                alpha.a[bi : bi + 1], alpha.b[bi : bi + 1],
                alpha.c[bi : bi + 1], alpha.d[bi : bi + 1],
            )
            folded_evals[L] = [
                fold_circle_pair(ve, vo, pos0, L, alpha_b)
                for pos0, ve, vo in pairs
            ]
            for pos0, ve, vo in pairs:
                stream.extend(ve)
                stream.extend(vo)
        assert next(witness_iter, None) is None
        folded_evals_all.append(folded_evals)
        fl_per_proof.append(
            expand_pair_paths(
                list(spec.all_log_sizes),
                proof.stark_proof.fri_proof.first_layer.commitment,
                raw_all,
                np.array(stream, np.uint32),
                proof.stark_proof.fri_proof.first_layer.decommitment,
                hash_node_fn=hash_node_fn,
            )
        )
    first_layer_paths = _stack_pair_paths(fl_per_proof)

    # inner layers
    inner_paths = []
    for i in range(spec.n_inner_layers):
        inner_paths.append([])

    for bi, proof in enumerate(proofs):
        raw_all = [int(v) for v in (fs.raw_queries[bi] & np.uint32((1 << M) - 1))]
        folded = {qq >> 1: (0, 0, 0, 0) for qq in raw_all}
        log_size = M
        for i, layer in enumerate(proof.stark_proof.fri_proof.inner_layers):
            alpha = fs.fri_alphas[i]
            alpha_b = QM31(
                alpha.a[bi : bi + 1], alpha.b[bi : bi + 1],
                alpha.c[bi : bi + 1], alpha.d[bi : bi + 1],
            )
            alpha_next = fs.fri_alphas[i + 1]
            alpha_next_b = QM31(
                alpha_next.a[bi : bi + 1], alpha_next.b[bi : bi + 1],
                alpha_next.c[bi : bi + 1], alpha_next.d[bi : bi + 1],
            )
            if log_size in folded_evals_all[bi]:
                a2 = q.q_mul(alpha_b, alpha_b)
                for k, b_val in zip(sorted(folded), folded_evals_all[bi][log_size]):
                    cur = q.q_scalar(*folded[k])
                    folded[k] = _qm31_tuple(
                        q.q_add(q.q_mul(a2, cur), q.q_scalar(*b_val))
                    )
            log_size -= 1
            wit = iter(
                tuple(int(x) for x in row) for row in layer.fri_witness
            )
            new_folded = {}
            decommitmented = {}
            for k in sorted(folded):
                v = folded[k]
                if (k ^ 1) in folded:
                    sibling_v = folded[k ^ 1]
                else:
                    sibling_v = next(wit)
                left_v, right_v = (v, sibling_v) if k & 1 == 0 else (sibling_v, v)
                left_idx = (k >> 1) << 1
                decommitmented[left_idx] = left_v
                decommitmented[left_idx + 1] = right_v
                new_folded[k >> 1] = fold_line_pair(
                    left_v, right_v, left_idx, log_size, alpha_next_b
                )
            assert next(wit, None) is None
            stream = []
            for kk in sorted(decommitmented):
                stream.extend(decommitmented[kk])
            inner_paths[i].append(
                expand_pair_paths(
                    [log_size],
                    layer.commitment,
                    [qq >> (M - log_size) for qq in raw_all],
                    np.array(stream, np.uint32),
                    layer.decommitment,
                    hash_node_fn=hash_node_fn,
                )
            )
            folded = new_folded

        # last layer consistency (host-side sanity; device re-checks)
        log_size -= 1
        coeffs = [tuple(int(x) for x in row)
                  for row in proof.stark_proof.fri_proof.last_layer_poly]
        for idx in sorted(folded):
            px, _ = circle.Coset.half_odds(log_size).at(
                circle.bit_reverse_index(idx, log_size)
            )
            doublings = []
            x = px
            for _ in range(len(coeffs).bit_length() - 1):
                doublings.append(x)
                x = (2 * x * x - 1) % 2147483647

            def fold(vals, factors):
                if len(vals) == 1:
                    return q.q_scalar(*vals[0])
                half = len(vals) // 2
                lhs = fold(vals[:half], factors[1:])
                rhs = fold(vals[half:], factors[1:])
                return q.q_add(lhs, q.q_mul_m31(rhs, np.uint32(factors[0])))

            expected = _qm31_tuple(fold(coeffs, doublings))
            assert folded[idx] == expected, (
                f"last layer mismatch at {idx}: {folded[idx]} vs {expected}"
            )

    inner_layer_paths = tuple(_stack_pair_paths(pp) for pp in inner_paths)

    return pa._replace(
        tree_paths=tuple(tree_paths),
        first_layer_paths=first_layer_paths,
        inner_layer_paths=inner_layer_paths,
    )
