"""Top-level batched verifier for PlonkWithPoseidon circle-STARK proofs.

verify_batch(spec, pa, inputs) runs the full verification — transcript,
PoW, total-sum, composition, 4 commitment-tree decommitments, quotients,
FRI folding — as one jit-compilable function over batched uint32 tensors.
All Merkle hashing is consolidated into three scans (see hashplan.py).
Returns a dict of named (B,) boolean checks plus the conjunction 'ok'.

Equivalent end-to-end behavior to the reference's native
verify_plonk_with_poseidon (stwo) as replayed by its hint+gadget pipeline
(see /root/reference/components/hints/src/*.rs)."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..core import qm31 as q
from ..core.qm31 import QM31
from . import composition as composition_mod
from . import fri as fri_mod
from . import hashplan, points, quotients, transcript
from .arrays import ProofArrays
from .spec import VerifierSpec

INPUTS_ONE = ((1, (1, 0, 0, 0)),)
INPUTS_RECURSIVE = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def _q_const(vals, like) -> QM31:
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
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )

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

    checks.update(_structural_checks(spec, pa, fs, oods, xp))

    ok = None
    for v in checks.values():
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks


def _structural_checks(spec, pa, fs, oods, xp):
    """Quotients, FRI folding, and all Merkle hash-plan checks — shared by
    the with- and without-poseidon verifiers (everything here is driven by
    the duck-typed spec)."""
    checks, pair_jobs = fold_phase(spec, pa, fs, oods, xp)
    checks.update(hash_phase(spec, pa, fs, pair_jobs, xp))
    return checks


def fold_phase(spec, pa, fs, oods, xp):
    """Quotient ('FRI answers') evaluation + the FRI fold arithmetic.

    Returns (checks, pair_jobs): the fold-consistency checks and the
    assembled per-layer pair-walk jobs the hash phase consumes."""
    checks = {}
    half_pts = points.half_index_points(spec, fs.raw_queries, spec.final_fold_log)
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

    # FRI fold math + walk assembly
    fri_checks, pair_jobs = fri_mod.verify_fri(spec, fs, pa, answers, half_pts)
    checks.update(fri_checks)
    return checks, pair_jobs


def hash_phase(spec, pa, fs, pair_jobs, xp):
    """All Merkle hashing: one packed absorb scan + one leaf batch + one
    packed walk scan (hashplan.py); yields the tree0-3 and FRI-layer root
    checks."""
    checks = {}
    chains = []
    chain_idx = {}

    def add_chain(key, arr):
        chain_idx[key] = len(chains)
        chains.append(arr)

    for t in range(4):
        for L, cols in pa.tree_paths[t].columns.items():
            add_chain(("tree", t, L), cols)
    for j, job in enumerate(pair_jobs):
        for L in job["self_columns"]:
            add_chain(("self", j, L), job["self_columns"][L])
            add_chain(("sib", j, L), job["sibling_columns"][L])

    digests = hashplan.absorb_packed(chains)

    def dig(key):
        return digests[chain_idx[key]]

    leaf_keys = [("tree", t, spec.tree_max_domain_log[t]) for t in range(4)]
    for j, job in enumerate(pair_jobs):
        leaf_keys.append(("self", j, job["depth"]))
        leaf_keys.append(("sib", j, job["depth"]))
    leaf_hashes = hashplan.leaf_rate_many([dig(k) for k in leaf_keys])
    leaf = dict(zip(leaf_keys, leaf_hashes))

    single = []
    for t in range(4):
        depth = spec.tree_max_domain_log[t]
        single.append(
            hashplan.SingleWalk(
                depth=depth,
                queries=transcript.queries_at_log_size(spec, fs.raw_queries, depth),
                sibling_hashes=pa.tree_paths[t].sibling_hashes,
                col_caps={
                    L: dig(("tree", t, L))
                    for L in pa.tree_paths[t].columns
                    if L != depth
                },
                leaf=leaf[("tree", t, depth)],
                root=pa.commitments[:, t],
            )
        )
    pairs = []
    for j, job in enumerate(pair_jobs):
        d = job["depth"]
        pairs.append(
            hashplan.PairWalk(
                depth=d,
                queries=job["queries"],
                sibling_hashes=job["sibling_hashes"],
                self_caps={
                    L: dig(("self", j, L)) for L in job["self_columns"] if L != d
                },
                sib_caps={
                    L: dig(("sib", j, L)) for L in job["sibling_columns"] if L != d
                },
                self_leaf=leaf[("self", j, d)],
                sib_leaf=leaf[("sib", j, d)],
                root=job["root"],
            )
        )
    oks, poks = hashplan.walk_scan(single, pairs)
    for t in range(4):
        checks[f"tree{t}"] = oks[t]
    for j, job in enumerate(pair_jobs):
        checks[f"fri_{job['kind']}"] = poks[j]

    return checks
