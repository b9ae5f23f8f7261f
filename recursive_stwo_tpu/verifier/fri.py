"""Device-side FRI verification: first-layer circle folds, inner line folds,
pair-path Merkle checks, and the last-layer polynomial evaluation.

Self-track values are always the verifier's own computations (quotient
answers for the first layer, running folds for inner layers); only sibling
values/hashes come from the proof.  Mirrors
/root/reference/components/recursive/folding/src/lib.rs:11-204 and
hints/folding.rs:459-601.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core import m31
from ..core import qm31 as q
from ..core.qm31 import QM31
from .spec import VerifierSpec
from . import merkle, transcript
from . import points as points_mod


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _q_of(arr):  # (B, Q, 4) -> QM31 SoA (B, Q)
    return QM31(arr[..., 0], arr[..., 1], arr[..., 2], arr[..., 3])


def _q_arr(x: QM31):  # QM31 SoA (B, Q) -> (B, Q, 4)
    xp = _xp(x.a)
    return xp.stack([x.a, x.b, x.c, x.d], axis=-1)


def _q_swap(bit, a: QM31, b: QM31):
    xp = _xp(a.a)
    c = bit != 0
    left = QM31(*(xp.where(c, y, x) for x, y in zip(a, b)))
    right = QM31(*(xp.where(c, x, y) for x, y in zip(a, b)))
    return left, right


def fold_circle(self_v: QM31, sib_v: QM31, bit0, y_fold, alpha: QM31) -> QM31:
    """(l+r) + alpha*(l-r)/y with (l, r) = (self, sib) swapped by bit0."""
    l, r = _q_swap(bit0, self_v, sib_v)
    f0 = q.q_add(l, r)
    f1 = q.q_mul_m31(q.q_sub(l, r), m31.inv(y_fold))
    return q.q_add(f0, q.q_mul(f1, _bc(alpha)))


def _bc(x: QM31) -> QM31:
    return QM31(x.a[:, None], x.b[:, None], x.c[:, None], x.d[:, None])


def verify_fri(
    spec: VerifierSpec,
    fs,
    pa,
    answers: List[QM31],
    half_pts: Dict[int, tuple],
) -> list:
    """Returns list of (B,) bool checks (pair-path roots, last layer)."""
    xp = _xp(pa.commitments)
    checks = []
    M = spec.max_first_layer_log
    raw = fs.raw_queries

    # ---- first layer ----
    self_values = {}
    sib_values = {}
    folded_results: Dict[int, QM31] = {}
    for g, L in enumerate(spec.all_log_sizes):
        qL = transcript.queries_at_log_size(spec, raw, L)
        sib_v = _q_of(pa.first_layer_paths.sibling_columns[L])
        self_v = answers[g]
        self_values[L] = _q_arr(self_v)
        sib_values[L] = pa.first_layer_paths.sibling_columns[L]
        _, _, y_fold = points_mod.domain_point(half_pts[L], qL)
        bit0 = qL & np.uint32(1)
        alpha = fs.fri_alphas[M - L]
        folded_results[L] = fold_circle(self_v, sib_v, bit0, y_fold, alpha)

    q_at_max = transcript.queries_at_log_size(spec, raw, M)
    checks.append(
        merkle.verify_pair_paths(
            M,
            list(spec.all_log_sizes),
            q_at_max,
            self_values,
            sib_values,
            pa.first_layer_paths.sibling_hashes,
            pa.first_layer_commitment,
        )
    )

    # ---- inner layers ----
    B, Q = raw.shape
    folded = q.q_zero(xp.zeros((B, Q), xp.uint32))
    log_size = M
    for i in range(spec.n_inner_layers):
        if log_size in folded_results:
            a2 = fs.fri_alphas[i]
            a2 = q.q_mul(a2, a2)
            folded = q.q_add(q.q_mul(folded, _bc(a2)), folded_results[log_size])
        log_size -= 1

        qL = transcript.queries_at_log_size(spec, raw, log_size)
        sib_v = _q_of(pa.inner_layer_paths[i].sibling_columns[log_size])
        x_fold = half_pts[log_size][0]  # A_L(q).x
        bit0 = qL & np.uint32(1)
        l, r = _q_swap(bit0, folded, sib_v)
        f0 = q.q_add(l, r)
        f1 = q.q_mul_m31(q.q_sub(l, r), m31.inv(x_fold))
        new_folded = q.q_add(f0, q.q_mul(f1, _bc(fs.fri_alphas[i + 1])))

        checks.append(
            merkle.verify_pair_paths(
                log_size,
                [log_size],
                qL,
                {log_size: _q_arr(folded)},
                {log_size: pa.inner_layer_paths[i].sibling_columns[log_size]},
                pa.inner_layer_paths[i].sibling_hashes,
                pa.inner_commitments[:, i],
            )
        )
        folded = new_folded

    # ---- last layer ----
    # Evaluate last_poly at x = (2 * A_F(q_F)).x  (F = M - n_inner_layers).
    F = M - spec.n_inner_layers
    ax, ay = half_pts[F]
    x = m31.sub(m31.mul(ax, ax), m31.mul(ay, ay))
    n_coeffs = 1 << spec.log_last_layer_degree_bound
    if n_coeffs == 1:
        c = pa.last_poly[:, 0]
        expect = QM31(
            c[:, 0:1] * xp.ones((1, Q), xp.uint32),
            c[:, 1:2] * xp.ones((1, Q), xp.uint32),
            c[:, 2:3] * xp.ones((1, Q), xp.uint32),
            c[:, 3:4] * xp.ones((1, Q), xp.uint32),
        )
    else:
        doublings = [x]
        for _ in range(spec.log_last_layer_degree_bound - 1):
            xx = doublings[-1]
            sq = m31.mul(xx, xx)
            doublings.append(m31.sub(m31.add(sq, sq), np.uint32(1)))
        # coeffs (B, L, 4) -> QM31 with query axis broadcast: (B, 1, L)
        v = QM31(
            pa.last_poly[:, None, :, 0],
            pa.last_poly[:, None, :, 1],
            pa.last_poly[:, None, :, 2],
            pa.last_poly[:, None, :, 3],
        )
        for factor in reversed(doublings):
            lhs = QM31(*(comp[..., 0::2] for comp in v))
            rhs = QM31(*(comp[..., 1::2] for comp in v))
            v = q.q_add(lhs, q.q_mul_m31(rhs, factor[..., None]))
        expect = QM31(v.a[..., 0], v.b[..., 0], v.c[..., 0], v.d[..., 0])

    eq = xp.ones(folded.a.shape, bool)
    for fx, ex in zip(folded, expect):
        eq = eq & (fx == ex)
    checks.append(xp.all(eq, axis=1))
    return checks
