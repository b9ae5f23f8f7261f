"""Top-level batched verifier for PlonkWithPoseidon circle-STARK proofs.

verify_batch(spec, pa, inputs) runs the full verification — transcript,
PoW, total-sum, composition, 4 commitment-tree decommitments, quotients,
FRI folding — as one jit-compilable function over batched uint32 tensors.
Returns a dict of named (B,) boolean checks plus the conjunction 'ok'.

Equivalent end-to-end behavior to the reference's native
verify_plonk_with_poseidon (stwo) as replayed by its hint+gadget pipeline
(see /root/reference/components/hints/src/*.rs).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..core import qm31 as q
from ..core.qm31 import QM31
from . import composition as composition_mod
from . import fri as fri_mod
from . import merkle, points, quotients, transcript
from .arrays import ProofArrays
from .spec import VerifierSpec

# Default public inputs: wire 1 = one (as in single-proof verification);
# recursive layers also pin wires 2, 3 to i, j.
INPUTS_ONE = ((1, (1, 0, 0, 0)),)
INPUTS_RECURSIVE = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def _q_const(vals, like) -> QM31:
    xp = np if isinstance(like, np.ndarray) else __import__("jax.numpy", fromlist=["x"])
    return QM31(*(like * 0 + np.uint32(v) for v in vals))


def verify_batch(
    spec: VerifierSpec,
    pa: ProofArrays,
    inputs: Sequence[Tuple[int, Tuple[int, int, int, int]]] = INPUTS_ONE,
):
    xp = np if isinstance(pa.commitments, np.ndarray) else None
    if xp is None:
        import jax.numpy as xp  # noqa: F811

    fs = transcript.run_transcript(spec, pa)
    checks = {}

    # proof of work
    checks["pow"] = transcript.pow_check(spec, fs)

    # logup total-sum: sum_i 1/(val_i + idx_i * alpha - z) + sums == 0
    like = fs.z.a
    input_sum = q.q_zero(like)
    for idx, val in inputs:
        term = q.q_sub(
            q.q_add(_q_const(val, like), q.q_mul_m31(fs.alpha, np.uint32(idx))),
            fs.z,
        )
        input_sum = q.q_add(input_sum, q.q_inv(term))
    total = q.q_add(
        q.q_add(input_sum, QM31(*(pa.plonk_total_sum[:, i] for i in range(4)))),
        QM31(*(pa.poseidon_total_sum[:, i] for i in range(4))),
    )
    ok_sum = (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    checks["total_sum"] = ok_sum

    # composition polynomial at the OODS point
    oods = points.oods_point_from_t(fs.oods_t)
    checks["composition"] = composition_mod.composition_check(
        spec,
        pa.samples_flat,
        QM31(*(pa.plonk_total_sum[:, i] for i in range(4))),
        QM31(*(pa.poseidon_total_sum[:, i] for i in range(4))),
        (fs.z, fs.alpha),
        fs.random_coeff,
        oods,
    )

    # commitment-tree decommitments
    half_pts = points.half_index_points(spec, fs.raw_queries, spec.final_fold_log)
    for t in range(4):
        depth = spec.tree_max_domain_log[t]
        qt = transcript.queries_at_log_size(spec, fs.raw_queries, depth)
        checks[f"tree{t}"] = merkle.verify_single_paths(
            depth,
            qt,
            pa.tree_paths[t].sibling_hashes,
            pa.tree_paths[t].columns,
            pa.commitments[:, t],
        )

    # quotients (FRI answers) per first-layer log size
    answers = []
    for g, L in enumerate(spec.all_log_sizes):
        qL = transcript.queries_at_log_size(spec, fs.raw_queries, L)
        dx, dyq, _ = points.domain_point(half_pts[L], qL)
        rows = xp.concatenate(
            [
                pa.tree_paths[t].columns[L]
                for t in range(4)
                if L in pa.tree_paths[t].columns
            ],
            axis=-1,
        )
        answers.append(
            quotients.fri_answers_for_group(
                spec, g, oods, fs.after_sampled_values_random_coeff,
                pa.samples_flat, rows, dx, dyq,
            )
        )

    # FRI folding + last layer
    fri_checks = fri_mod.verify_fri(spec, fs, pa, answers, half_pts)
    checks["fri_first_layer"] = fri_checks[0]
    for i in range(spec.n_inner_layers):
        checks[f"fri_inner{i}"] = fri_checks[1 + i]
    checks["fri_last_layer"] = fri_checks[-1]

    ok = None
    for v in checks.values():
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks
