"""Batched verifier for PlonkWithoutPoseidon circle-STARK proofs (the
last-layer output system; native mirror of the stwo fork's
`verify_plonk_without_poseidon` consumed at
examples/last-layer/src/main.rs:188-202).

Reuses the generic structural machinery (quotients, FRI folding, Merkle
hash plans) from verify._structural_checks; only the transcript layout,
total-sum statement, and the composition AIR differ."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..core import qm31 as q
from ..core.qm31 import QM31
from . import composition as composition_mod
from . import points, transcript
from .arrays import ProofArrays
from .verify import _q_const, _structural_checks


def verify_batch_np(
    spec,
    pa: ProofArrays,
    inputs: Sequence[Tuple[int, Tuple[int, int, int, int]]] = (),
):
    xp = np if isinstance(pa.commitments, np.ndarray) else None
    if xp is None:
        import jax.numpy as xp  # noqa: F811

    fs = transcript.run_transcript_np(spec, pa)
    checks = {}

    checks["pow"] = transcript.pow_check(spec, fs)

    like = fs.z.a
    input_sum = q.q_zero(like)
    for idx, val in inputs:
        term = q.q_sub(
            q.q_add(_q_const(val, like), q.q_mul_m31(fs.alpha, np.uint32(idx))),
            fs.z,
        )
        input_sum = q.q_add(input_sum, q.q_inv(term))
    total_sum = QM31(*(pa.plonk_total_sum[:, i] for i in range(4)))
    total = q.q_add(input_sum, total_sum)
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )

    oods = points.oods_point_from_t(fs.oods_t)
    checks["composition"] = composition_mod.composition_check_np(
        spec, pa.samples_flat, total_sum,
        (fs.z, fs.alpha), fs.random_coeff, oods,
    )

    checks.update(_structural_checks(spec, pa, fs, oods, xp))

    ok = None
    for v in checks.values():
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks
