"""OODS quotient ("FRI answer") evaluation, batched over proofs x queries.

Per first-layer log size L the queried trace rows are combined into one
secure-field quotient value per query:

  answer = sum_batches denom_inv(batch, point) *
           sum_cols (col_val * c - (a * domain_y + b))

with per-(batch, column) line coefficients (a, b, c) built from the sampled
value / sample point and a running alpha = -2u * random_coeff**k chain.

Mirrors /root/reference/components/recursive/answer/src/data_structures.rs
(new_vec grouping :42-63, line coeffs :128-189, accumulation :70-126).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..core import m31
from ..core import qm31 as q
from ..core.m31 import P
from ..core.qm31 import CM31, QM31
from .spec import (
    N_INTERACTION_PLONK,
    N_PREPROCESSED_PLONK,
    N_TRACE_PLONK,
    VerifierSpec,
)
from . import points as points_mod


def column_trace_log(spec: VerifierSpec, tree: int, col: int) -> int:
    """Which trace (plonk/poseidon) a column belongs to, for mask steps."""
    n_plonk = (N_PREPROCESSED_PLONK, N_TRACE_PLONK, N_INTERACTION_PLONK, 0)[tree]
    if tree == 3:
        return spec.composition_log_degree_bound - 1
    return spec.log_size_plonk if col < n_plonk else spec.log_size_poseidon


def group_batches(spec: VerifierSpec, g: int) -> List[Tuple[Tuple[int, int], List[Tuple[int, int]]]]:
    """Sample batches for log-size group g, in first-encounter order.

    Returns [(batch_key, [(local_col_idx, flat_sample_idx), ...]), ...] where
    batch_key is (shift, trace_log) — shift 0 keys the OODS batch.
    """
    batches: List[Tuple[Tuple[int, int], List[Tuple[int, int]]]] = []
    index: Dict[Tuple[int, int], int] = {}
    for local, (tree, col) in enumerate(spec.group_columns[g]):
        shifts = spec.sample_shifts_per_column[tree][col]
        base = spec.sample_offsets[tree][col]
        for si, shift in enumerate(shifts):
            key = (0, 0) if shift == 0 else (shift, column_trace_log(spec, tree, col))
            if key not in index:
                index[key] = len(batches)
                batches.append((key, []))
            batches[index[key]][1].append((local, base + si))
    return batches


def _bc(x: QM31) -> QM31:
    """Broadcast a (B,) QM31 against (B, Q) arrays."""
    return QM31(x.a[:, None], x.b[:, None], x.c[:, None], x.d[:, None])


def _sample(samples_flat, idx: int) -> QM31:
    s = samples_flat[:, idx]
    return QM31(s[:, 0], s[:, 1], s[:, 2], s[:, 3])


def fri_answers_for_group(
    spec: VerifierSpec,
    g: int,
    oods: Tuple[QM31, QM31],
    random_coeff: QM31,
    samples_flat,
    queried_rows,
    dom_x,
    dom_y,
) -> QM31:
    """Quotient values for group g.

    queried_rows: (B, Q, C) uint32 trace values in group column order.
    dom_x/dom_y: (B, Q) domain point coords at this log size.
    Returns QM31 of (B, Q)."""
    batches = group_batches(spec, g)

    # Per-batch sample points (QM31 coords, (B,) SoA).
    batch_points = []
    for (shift, tlog), _ in batches:
        batch_points.append(
            oods if shift == 0 else points_mod.shifted_oods_point(oods, shift, tlog)
        )

    # Line coefficients with the running alpha chain (alpha starts at -2u).
    alpha = QM31(
        np.uint32(0) * random_coeff.a,
        np.uint32(0) * random_coeff.a,
        np.uint32(0) * random_coeff.a + np.uint32(P - 2),
        np.uint32(0) * random_coeff.a,
    )
    line_coeffs = []  # per batch: list of (A, Bc, C) QM31 (B,)
    for bi, ((_, _), cols) in enumerate(batches):
        px, py = batch_points[bi]
        y0 = CM31(py.a, py.b)
        y1 = CM31(py.c, py.d)
        coeffs = []
        for _local, sample_idx in cols:
            v = _sample(samples_flat, sample_idx)
            v0 = CM31(v.a, v.b)
            v1 = CM31(v.c, v.d)
            a = v1
            c = y1
            b = q.c_sub(q.c_mul(v0, y1), q.c_mul(v1, y0))
            coeffs.append(
                (
                    q.q_mul_cm31(alpha, a),
                    q.q_mul_cm31(alpha, b),
                    q.q_mul_cm31(alpha, c),
                )
            )
            alpha = q.q_mul(alpha, random_coeff)
        line_coeffs.append(coeffs)

    # Accumulate per query.
    acc = q.q_zero(dom_x)
    for bi, ((_, _), cols) in enumerate(batches):
        px, py = batch_points[bi]
        prx, pix = CM31(px.a[:, None], px.b[:, None]), CM31(px.c[:, None], px.d[:, None])
        pry, piy = CM31(py.a[:, None], py.b[:, None]), CM31(py.c[:, None], py.d[:, None])
        ta = q.c_mul(CM31(m31.sub(prx.re, dom_x), m31.sub(prx.im, 0 * dom_x)), piy)
        tb = q.c_mul(CM31(m31.sub(pry.re, dom_y), m31.sub(pry.im, 0 * dom_y)), pix)
        denom_inv = q.c_inv(q.c_sub(ta, tb))

        numerator = q.q_zero(dom_x)
        for (local, _), (A, Bc, C) in zip(cols, line_coeffs[bi]):
            val = queried_rows[:, :, local]
            term = q.q_sub(
                q.q_mul_m31(_bc(C), val),
                q.q_add(q.q_mul_m31(_bc(A), dom_y), _bc(Bc)),
            )
            numerator = q.q_add(numerator, term)
        acc = q.q_add(acc, q.q_mul_cm31(numerator, denom_inv))
    return acc
