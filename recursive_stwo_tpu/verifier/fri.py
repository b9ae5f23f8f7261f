"""Device-side FRI verification: fold math + hash-planned Merkle checks.

Fold semantics mirror /root/reference/components/recursive/folding/src/lib.rs
(first-layer circle fold :57-90, inner line folds :122-192, last layer
:194-204).  All per-layer Merkle work is routed through
recursive_stwo_tpu.verifier.hashplan; self-track leaf values are the
verifier's own computations, so root matches bind them to the commitments.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core import m31
from ..core import qm31 as q
from ..core.qm31 import QM31
from . import hashplan
from . import points as points_mod
from . import transcript
from .spec import VerifierSpec


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _is_jax(arr):
    return not isinstance(arr, np.ndarray)


def _q_of(arr):
    return QM31(arr[..., 0], arr[..., 1], arr[..., 2], arr[..., 3])


def _q_arr(x: QM31):
    xp = _xp(x.a)
    return xp.stack([x.a, x.b, x.c, x.d], axis=-1)


def _q_swap(bit, a: QM31, b: QM31):
    xp = _xp(a.a)
    c = bit != 0
    left = QM31(*(xp.where(c, y, x) for x, y in zip(a, b)))
    right = QM31(*(xp.where(c, x, y) for x, y in zip(a, b)))
    return left, right


def _bc(x: QM31) -> QM31:
    return QM31(x.a[:, None], x.b[:, None], x.c[:, None], x.d[:, None])


def verify_fri(
    spec: VerifierSpec,
    fs,
    pa,
    answers: List[QM31],
    half_pts: Dict[int, tuple],
):
    """Returns (checks dict name -> (B,) bool, walk data for hashplan)."""
    xp = _xp(pa.commitments)
    checks = {}
    M = spec.max_first_layer_log
    raw = fs.raw_queries
    B, Q = raw.shape
    n_inner = spec.n_inner_layers

    # Batched inversions: first-layer fold y's and inner-layer fold x's.
    y_folds = []
    for L in spec.all_log_sizes:
        qL = transcript.queries_at_log_size(spec, raw, L)
        _, _, y_fold = points_mod.domain_point(half_pts[L], qL)
        y_folds.append(y_fold)
    x_folds = [half_pts[M - 1 - i][0] for i in range(n_inner)]
    inv_all = m31.inv(xp.stack(y_folds + x_folds, axis=0))
    y_inv = {L: inv_all[g] for g, L in enumerate(spec.all_log_sizes)}
    x_inv = inv_all[len(y_folds) :]  # (n_inner, B, Q)

    # ---- first layer circle folds ----
    folded_results: Dict[int, QM31] = {}
    for g, L in enumerate(spec.all_log_sizes):
        qL = transcript.queries_at_log_size(spec, raw, L)
        sib_v = _q_of(pa.first_layer_paths.sibling_columns[L])
        bit0 = qL & np.uint32(1)
        l, r = _q_swap(bit0, answers[g], sib_v)
        f0 = q.q_add(l, r)
        f1 = q.q_mul_m31(q.q_sub(l, r), y_inv[L])
        alpha = fs.fri_alphas[M - L]
        folded_results[L] = q.q_add(f0, q.q_mul(f1, _bc(alpha)))

    # ---- inner layers: one scan over layers ----
    # Stacked per-layer inputs.
    # input-derived zero keeps varying-axes metadata under check_vma
    zeros_q = q.q_zero(raw * np.uint32(0))
    extras, flags, sib_vals, bit0s = [], [], [], []
    a_sq, a_next = [], []
    for i in range(n_inner):
        L_in = M - i  # log size at loop start
        L = M - 1 - i  # layer log size
        extras.append(folded_results.get(L_in, zeros_q))
        flags.append(L_in in folded_results)
        sib_vals.append(_q_of(pa.inner_layer_paths[i].sibling_columns[L]))
        qL = transcript.queries_at_log_size(spec, raw, L)
        bit0s.append(qL & np.uint32(1))
        ai = fs.fri_alphas[i]
        a_sq.append(q.q_mul(ai, ai))
        a_next.append(fs.fri_alphas[i + 1])

    def stack_q(lst):
        return QM31(*(xp.stack([v[i] for v in lst], axis=0) for i in range(4)))

    extras_s = stack_q(extras)
    sib_s = stack_q(sib_vals)
    a_sq_s = stack_q(a_sq)
    a_next_s = stack_q(a_next)
    bit0_s = xp.stack(bit0s, axis=0)
    flag_s = xp.asarray(np.array(flags))

    def body(folded, inp):
        extra, sib_v, asq, anext, bit0, xinv, flag = inp
        fold_in = q.q_add(q.q_mul(folded, _bc(asq)), extra)
        folded = QM31(*(xp.where(flag, fi, fo) for fi, fo in zip(fold_in, folded)))
        self_v = folded  # leaf value committed at this layer
        l, r = _q_swap(bit0, folded, sib_v)
        f0 = q.q_add(l, r)
        f1 = q.q_mul_m31(q.q_sub(l, r), xinv)
        new = q.q_add(f0, q.q_mul(f1, _bc(anext)))
        return new, self_v

    xs = (extras_s, sib_s, a_sq_s, a_next_s, bit0_s, x_inv, flag_s)
    if _is_jax(raw):
        import jax

        folded, self_vals = jax.lax.scan(body, zeros_q, xs)
    else:

        def index_layer(t, i):
            if isinstance(t, QM31):
                return QM31(*(comp[i] for comp in t))
            return t[i]

        folded = zeros_q
        outs = []
        for i in range(n_inner):
            folded, sv = body(folded, tuple(index_layer(t, i) for t in xs))
            outs.append(sv)
        self_vals = stack_q(outs)

    # ---- last layer ----
    F = M - n_inner
    ax, ay = half_pts[F]
    x = m31.sub(m31.mul(ax, ax), m31.mul(ay, ay))
    n_coeffs = 1 << spec.log_last_layer_degree_bound
    if n_coeffs == 1:
        c = pa.last_poly[:, 0]
        expect = QM31(*(c[:, i : i + 1] + xp.zeros((1, Q), xp.uint32) for i in range(4)))
    else:
        doublings = [x]
        for _ in range(spec.log_last_layer_degree_bound - 1):
            sq = m31.mul(doublings[-1], doublings[-1])
            doublings.append(m31.sub(m31.add(sq, sq), np.uint32(1)))
        v = QM31(*(pa.last_poly[:, None, :, i] for i in range(4)))
        for factor in reversed(doublings):
            lhs = QM31(*(comp[..., 0::2] for comp in v))
            rhs = QM31(*(comp[..., 1::2] for comp in v))
            v = q.q_add(lhs, q.q_mul_m31(rhs, factor[..., None]))
        expect = QM31(*(comp[..., 0] for comp in v))

    eq = xp.ones(folded.a.shape, bool)
    for fx, ex in zip(folded, expect):
        eq = eq & (fx == ex)
    checks["fri_last_layer"] = xp.all(eq, axis=1)

    # ---- assemble pair-walk hash jobs ----
    self_cols = {L: _q_arr(answers[g]) for g, L in enumerate(spec.all_log_sizes)}
    walk_jobs = []
    walk_jobs.append(
        dict(
            kind="first",
            depth=M,
            queries=transcript.queries_at_log_size(spec, raw, M),
            sibling_hashes=pa.first_layer_paths.sibling_hashes,
            self_columns=self_cols,
            sibling_columns=dict(pa.first_layer_paths.sibling_columns),
            root=pa.first_layer_commitment,
        )
    )
    for i in range(n_inner):
        L = M - 1 - i
        sv = QM31(*(comp[i] for comp in self_vals))
        walk_jobs.append(
            dict(
                kind=f"inner{i}",
                depth=L,
                queries=transcript.queries_at_log_size(spec, raw, L),
                sibling_hashes=pa.inner_layer_paths[i].sibling_hashes,
                self_columns={L: _q_arr(sv)},
                sibling_columns={L: pa.inner_layer_paths[i].sibling_columns[L]},
                root=pa.inner_commitments[:, i],
            )
        )
    return checks, walk_jobs
