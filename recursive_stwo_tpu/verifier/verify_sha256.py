"""Native verifier for Sha256Poseidon31-flavor PlonkWithPoseidon proofs
(framework-defined SHA-256 channel + SHA-256 Merkle trees; see
prover/prove_sha256.py).

Capability mirror of the reference's native
`verify_plonk_with_poseidon::<Sha256Poseidon31MerkleChannel>` used around
the last-layer flow (examples/last-layer/src/main.rs:30-95).  This is
host-side scalar-per-proof work (the flavor is used once per recursion
chain, multi-proofs/src/main.rs:289-295); the batched device pipeline
stays on the Poseidon31 flavor.

Checks: SHA-256 transcript replay, PoW, logup total-sum, composition
identity at the OODS point, and — via `hints.prepare` with the SHA-256
node hash, whose path expansion asserts root equality and replays every
FRI fold down to the last-layer polynomial — all four commitment-tree
decommitments and the FRI chain."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..core import m31
from ..core import qm31 as q
from ..core.qm31 import QM31
from . import composition as composition_mod
from . import hints as hints_mod
from . import points, sha256_merkle
from .spec import VerifierSpec
from .transcript import FSOutput


def _q1(felt4) -> QM31:
    return QM31(*(np.array([int(x)], np.uint32) for x in felt4))


def run_transcript_sha256p31(spec: VerifierSpec, proof) -> FSOutput:
    """Replay the prover's channel interactions (prover/prove.py host flow)
    over the SHA-256 channel; returns a batch-1 FSOutput."""
    from ..prover.prove_sha256 import Sha256ProverChannel

    ch = Sha256ProverChannel()
    sp = proof.stark_proof

    ch.mix_root(sp.commitments[0])
    ch.mix_one_felt([spec.log_size_plonk, 0, 0, 0])
    ch.mix_one_felt([spec.log_size_poseidon, 0, 0, 0])
    ch.mix_root(sp.commitments[1])
    z4, alpha4 = ch.draw_felts()
    ch.mix_two_felts(proof.plonk_total_sum, proof.poseidon_total_sum)
    ch.mix_root(sp.commitments[2])
    rc4 = ch.draw_felt()
    ch.mix_root(sp.commitments[3])
    oods_t4 = ch.draw_felt()

    flat = [s for tree in sp.sampled_values for col in tree for s in col]
    for k in range(0, len(flat), 2):
        chunk = flat[k : k + 2]
        if len(chunk) == 1:
            ch.mix_one_felt(chunk[0])
        else:
            ch.mix_two_felts(chunk[0], chunk[1])
    after4 = ch.draw_felt()

    alphas = []
    ch.mix_root(sp.fri_proof.first_layer.commitment)
    alphas.append(ch.draw_felt())
    for layer in sp.fri_proof.inner_layers:
        ch.mix_root(layer.commitment)
        alphas.append(ch.draw_felt())

    last_poly = sp.fri_proof.last_layer_poly
    for k in range(0, len(last_poly), 2):
        chunk = last_poly[k : k + 2]
        if len(chunk) == 1:
            ch.mix_one_felt(chunk[0])
        else:
            ch.mix_two_felts(chunk[0], chunk[1])

    ch.mix_u64(sp.proof_of_work)
    pow_digest0 = np.array(
        [int.from_bytes(ch.ch.digest[:4], "little")], np.uint32
    )

    raw = []
    while len(raw) < spec.n_queries:
        a, b = ch.draw_felts()
        raw.extend(int(x) for x in a)
        raw.extend(int(x) for x in b)
    raw_queries = np.array([raw[: spec.n_queries]], np.uint32)

    return FSOutput(
        z=_q1(z4),
        alpha=_q1(alpha4),
        random_coeff=_q1(rc4),
        oods_t=_q1(oods_t4),
        after_sampled_values_random_coeff=_q1(after4),
        fri_alphas=tuple(_q1(a) for a in alphas),
        raw_queries=raw_queries,
        pow_digest0=pow_digest0,
    )


def verify_sha256p31_host(
    proof,
    inputs: Sequence[Tuple[int, Tuple[int, int, int, int]]] = (),
):
    """Full host verification of one Sha256Poseidon31-flavor proof.
    Returns the same named-checks dict shape as verify.verify_batch
    (all arrays are batch-1)."""
    spec = VerifierSpec.from_proof(proof)
    fs = run_transcript_sha256p31(spec, proof)

    # Merkle decommitments (all 4 trees + FRI layers) and the complete
    # FRI fold replay happen inside prepare(); every mismatch raises.
    try:
        pa = hints_mod.prepare(
            spec,
            [proof],
            transcript_fn=lambda s, p: fs,
            hash_node_fn=sha256_merkle.hash_node,
        )
        structural_ok = True
    except AssertionError:
        pa = None
        structural_ok = False

    checks = {}
    checks["pow"] = (
        fs.pow_digest0 & np.uint32((1 << spec.pow_bits) - 1)
    ) == 0

    total = q.q_add(
        q.q_add(_input_sum(fs, inputs), _q1(proof.plonk_total_sum)),
        _q1(proof.poseidon_total_sum),
    )
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )

    samples_flat = np.array(
        [
            [tuple(int(x) for x in s) for tree in proof.stark_proof.sampled_values
             for col in tree for s in col]
        ],
        np.uint32,
    )
    oods = points.oods_point_from_t(fs.oods_t)
    checks["composition"] = composition_mod.composition_check(
        spec,
        samples_flat,
        _q1(proof.plonk_total_sum),
        _q1(proof.poseidon_total_sum),
        (fs.z, fs.alpha),
        fs.random_coeff,
        oods,
    )

    checks["merkle_fri"] = np.array([structural_ok])

    ok = None
    for v in checks.values():
        v = np.asarray(v).reshape(1)
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks


# ---------------------------------------------------------------------------
# PlonkWithoutPoseidon flavor (the Sha256MerkleChannel output proof — the
# reference's bitcoin_proof.bin step, examples/last-layer/src/main.rs:194-202)
# ---------------------------------------------------------------------------


def run_transcript_sha256np(spec, proof) -> FSOutput:
    """Replay prove_np's channel interactions over the SHA-256 channel."""
    from ..prover.prove_sha256 import Sha256ProverChannel

    ch = Sha256ProverChannel()
    sp = proof.stark_proof

    ch.mix_root(sp.commitments[0])
    ch.mix_one_felt([spec.log_size, 0, 0, 0])
    ch.mix_root(sp.commitments[1])
    z4, alpha4 = ch.draw_felts()
    ch.mix_one_felt(proof.total_sum)
    ch.mix_root(sp.commitments[2])
    rc4 = ch.draw_felt()
    ch.mix_root(sp.commitments[3])
    oods_t4 = ch.draw_felt()

    flat = [s for tree in sp.sampled_values for col in tree for s in col]
    for k in range(0, len(flat), 2):
        chunk = flat[k : k + 2]
        if len(chunk) == 1:
            ch.mix_one_felt(chunk[0])
        else:
            ch.mix_two_felts(chunk[0], chunk[1])
    after4 = ch.draw_felt()

    alphas = []
    ch.mix_root(sp.fri_proof.first_layer.commitment)
    alphas.append(ch.draw_felt())
    for layer in sp.fri_proof.inner_layers:
        ch.mix_root(layer.commitment)
        alphas.append(ch.draw_felt())

    last_poly = sp.fri_proof.last_layer_poly
    for k in range(0, len(last_poly), 2):
        chunk = last_poly[k : k + 2]
        if len(chunk) == 1:
            ch.mix_one_felt(chunk[0])
        else:
            ch.mix_two_felts(chunk[0], chunk[1])

    ch.mix_u64(sp.proof_of_work)
    pow_digest0 = np.array(
        [int.from_bytes(ch.ch.digest[:4], "little")], np.uint32
    )

    raw = []
    while len(raw) < spec.n_queries:
        a, b = ch.draw_felts()
        raw.extend(int(x) for x in a)
        raw.extend(int(x) for x in b)
    raw_queries = np.array([raw[: spec.n_queries]], np.uint32)

    return FSOutput(
        z=_q1(z4),
        alpha=_q1(alpha4),
        random_coeff=_q1(rc4),
        oods_t=_q1(oods_t4),
        after_sampled_values_random_coeff=_q1(after4),
        fri_alphas=tuple(_q1(a) for a in alphas),
        raw_queries=raw_queries,
        pow_digest0=pow_digest0,
    )


def verify_sha256np_host(
    proof,
    inputs: Sequence[Tuple[int, Tuple[int, int, int, int]]] = (),
):
    """Full host verification of one Sha256MerkleChannel-flavor
    PlonkWithoutPoseidon proof (native mirror of the reference's
    verify_plonk_without_poseidon::<Sha256MerkleChannel>)."""
    from .arrays import from_proofs_np
    from .spec import NoPoseidonVerifierSpec

    spec = NoPoseidonVerifierSpec.for_rows(proof.log_size, proof.config)
    spec.validate(proof)
    fs = run_transcript_sha256np(spec, proof)

    try:
        hints_mod.prepare(
            spec,
            [proof],
            arrays_fn=from_proofs_np,
            transcript_fn=lambda s, p: fs,
            hash_node_fn=sha256_merkle.hash_node,
        )
        structural_ok = True
    except AssertionError:
        structural_ok = False

    checks = {}
    checks["pow"] = (
        fs.pow_digest0 & np.uint32((1 << spec.pow_bits) - 1)
    ) == 0

    total = q.q_add(_input_sum(fs, inputs), _q1(proof.total_sum))
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )

    samples_flat = np.array(
        [
            [tuple(int(x) for x in s) for tree in proof.stark_proof.sampled_values
             for col in tree for s in col]
        ],
        np.uint32,
    )
    oods = points.oods_point_from_t(fs.oods_t)
    checks["composition"] = composition_mod.composition_check_np(
        spec,
        samples_flat,
        _q1(proof.total_sum),
        (fs.z, fs.alpha),
        fs.random_coeff,
        oods,
    )

    checks["merkle_fri"] = np.array([structural_ok])

    ok = None
    for v in checks.values():
        v = np.asarray(v).reshape(1)
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks


# ---------------------------------------------------------------------------
# Device (jit) checks for the SHA-256 flavors: everything except the
# SHA-256 hashing itself.  The SHA transcript replay and Merkle root
# recomputation stay on the host (AVX-512 kernels inside hints.prepare,
# whose path expansion asserts root equality down to the last layer);
# the device program batches pow, total-sum, the composition AIR at the
# OODS point, the quotient ("FRI answer") evaluation and the full FRI
# fold-consistency chain — the same fold_phase the Poseidon31 device
# verifier runs (mirror of verify_plonk_without_poseidon /
# ::<Sha256Poseidon31MerkleChannel>, examples/last-layer/src/main.rs:188-202).
# ---------------------------------------------------------------------------

from functools import lru_cache


def _input_sum(fs, inputs):
    """sum_i 1/((val_i + alpha*idx_i) - z), batched: one q_inv over the
    stacked (n_inputs, B) terms instead of one per input (the bitcoin
    proof has 264 public inputs)."""
    like = fs.z.a
    if not inputs:
        return q.q_zero(like)
    xp = np if isinstance(like, np.ndarray) else None
    if xp is None:
        import jax.numpy as xp  # noqa: F811
    idxs = np.array([i for i, _ in inputs], np.uint32)[:, None]
    vals = np.array([v for _, v in inputs], np.uint32)
    term = QM31(
        *(
            m31.sub(
                m31.add(
                    vals[:, k : k + 1],
                    m31.mul(fs.alpha[k][None, :], idxs),
                ),
                fs.z[k][None, :],
            )
            for k in range(4)
        )
    )
    inv = q.q_inv(term)  # (n, B)
    comps = []
    for c in inv:
        acc = c
        while acc.shape[0] > 1:
            half = acc.shape[0] // 2
            lo = m31.add(acc[:half], acc[half : 2 * half])
            if acc.shape[0] % 2:
                lo = xp.concatenate([lo, acc[-1:]], axis=0)
            acc = lo
        comps.append(acc[0])
    return QM31(*comps)


def device_checks_p31(spec, pa, fs, inputs):
    """Jittable batch checks for Sha256Poseidon31 PlonkWithPoseidon proofs
    (no Merkle hashing: roots were enforced during host preparation)."""
    import jax.numpy as xp

    from .verify import fold_phase

    checks = {}
    checks["pow"] = (
        fs.pow_digest0 & np.uint32((1 << spec.pow_bits) - 1)
    ) == 0
    plonk_sum = QM31(*(pa.plonk_total_sum[:, i] for i in range(4)))
    poseidon_sum = QM31(*(pa.poseidon_total_sum[:, i] for i in range(4)))
    total = q.q_add(q.q_add(_input_sum(fs, inputs), plonk_sum), poseidon_sum)
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )
    oods = points.oods_point_from_t(fs.oods_t)
    checks["composition"] = composition_mod.composition_check(
        spec, pa.samples_flat, plonk_sum, poseidon_sum,
        (fs.z, fs.alpha), fs.random_coeff, oods,
    )
    fold_checks, _ = fold_phase(spec, pa, fs, oods, xp)
    checks.update(fold_checks)
    ok = None
    for v in checks.values():
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks


def device_checks_np(spec, pa, fs, inputs):
    """Jittable batch checks for Sha256MerkleChannel PlonkWithoutPoseidon
    proofs — the bitcoin_proof shape (FRI(0,9,8), 264 public inputs)."""
    import jax.numpy as xp

    from .verify import fold_phase

    checks = {}
    checks["pow"] = (
        fs.pow_digest0 & np.uint32((1 << spec.pow_bits) - 1)
    ) == 0
    total_sum = QM31(*(pa.plonk_total_sum[:, i] for i in range(4)))
    total = q.q_add(_input_sum(fs, inputs), total_sum)
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )
    oods = points.oods_point_from_t(fs.oods_t)
    checks["composition"] = composition_mod.composition_check_np(
        spec, pa.samples_flat, total_sum,
        (fs.z, fs.alpha), fs.random_coeff, oods,
    )
    fold_checks, _ = fold_phase(spec, pa, fs, oods, xp)
    checks.update(fold_checks)
    ok = None
    for v in checks.values():
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks


@lru_cache(maxsize=None)
def _jit_device_checks(spec, inputs, np_flavor: bool):
    import jax

    fn = device_checks_np if np_flavor else device_checks_p31
    return jax.jit(lambda pa, fs: fn(spec, pa, fs, inputs)["ok"])


def _tile_fs(fs: FSOutput, batch: int):
    import jax.tree as jt

    return jt.map(
        lambda x: np.ascontiguousarray(
            np.broadcast_to(np.asarray(x), (batch,) + np.asarray(x).shape[1:])
        ),
        fs,
    )


@lru_cache(maxsize=None)
def _jit_composition(spec, np_flavor: bool):
    """Composition-only jit, pinned to the CPU backend: the check is a
    fixed ~2000-op scalar formula; a CPU executable runs it in ~1 ms
    where batch-1 numpy paid per-op overhead (50-65 ms) and a batch-1
    TPU dispatch paid the tunnel round trip (~100 ms).  Batched device
    verification of this flavor uses device_checks_* instead."""
    import jax

    if np_flavor:
        def run(samples_flat, total, z, alpha, rcoeff, oods_t):
            oods = points.oods_point_from_t(oods_t)
            return composition_mod.composition_check_np(
                spec, samples_flat, total, (z, alpha), rcoeff, oods
            )
    else:
        def run(samples_flat, psum, qsum, z, alpha, rcoeff, oods_t):
            oods = points.oods_point_from_t(oods_t)
            return composition_mod.composition_check(
                spec, samples_flat, psum, qsum, (z, alpha), rcoeff, oods
            )

    cpu = jax.devices("cpu")[0]
    jfn = jax.jit(run)

    def call(*args):
        # pin inputs AND execution to the host CPU backend (numpy in)
        args = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), cpu), args
        )
        with jax.default_device(cpu):
            return jfn(*args)

    return call


def verify_sha256p31(proof, inputs=()):
    """Fast-path verification of one Sha256Poseidon31 proof: host SHA
    transcript + native path expansion (which asserts every Merkle root
    and the full FRI fold chain down to the last-layer polynomial), host
    pow + total-sum, and a composition-only device program."""
    import jax
    import jax.numpy as jnp

    spec = VerifierSpec.from_proof(proof)
    fs = run_transcript_sha256p31(spec, proof)
    checks = {}
    try:
        pa = hints_mod.prepare(
            spec, [proof],
            transcript_fn=lambda s, p: fs,
            hash_node_fn=sha256_merkle.hash_node,
        )
        checks["merkle_fri"] = np.array([True])
    except AssertionError:
        return {"ok": np.array([False]), "merkle_fri": np.array([False])}

    checks["pow"] = (
        fs.pow_digest0 & np.uint32((1 << spec.pow_bits) - 1)
    ) == 0
    plonk_sum = QM31(*(pa.plonk_total_sum[:, i] for i in range(4)))
    poseidon_sum = QM31(*(pa.poseidon_total_sum[:, i] for i in range(4)))
    total = q.q_add(
        q.q_add(_input_sum(fs, inputs), plonk_sum), poseidon_sum
    )
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )
    fn = _jit_composition(spec, False)
    checks["composition"] = np.asarray(
        fn(pa.samples_flat, plonk_sum, poseidon_sum, fs.z, fs.alpha,
           fs.random_coeff, fs.oods_t)
    )
    ok = None
    for v in checks.values():
        v = np.asarray(v).reshape(1)
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks


def verify_sha256np(proof, inputs=()):
    """Fast-path verification of one Sha256MerkleChannel
    PlonkWithoutPoseidon proof (bitcoin_proof): same split as
    verify_sha256p31."""
    import jax
    import jax.numpy as jnp

    from .arrays import from_proofs_np
    from .spec import NoPoseidonVerifierSpec

    spec = NoPoseidonVerifierSpec.for_rows(proof.log_size, proof.config)
    spec.validate(proof)
    fs = run_transcript_sha256np(spec, proof)
    checks = {}
    try:
        pa = hints_mod.prepare(
            spec, [proof],
            arrays_fn=from_proofs_np,
            transcript_fn=lambda s, p: fs,
            hash_node_fn=sha256_merkle.hash_node,
        )
        checks["merkle_fri"] = np.array([True])
    except AssertionError:
        return {"ok": np.array([False]), "merkle_fri": np.array([False])}

    checks["pow"] = (
        fs.pow_digest0 & np.uint32((1 << spec.pow_bits) - 1)
    ) == 0
    total_sum = QM31(*(pa.plonk_total_sum[:, i] for i in range(4)))
    total = q.q_add(_input_sum(fs, inputs), total_sum)
    checks["total_sum"] = (
        (total.a == 0) & (total.b == 0) & (total.c == 0) & (total.d == 0)
    )
    fn = _jit_composition(spec, True)
    checks["composition"] = np.asarray(
        fn(pa.samples_flat, total_sum, fs.z, fs.alpha, fs.random_coeff,
           fs.oods_t)
    )
    ok = None
    for v in checks.values():
        v = np.asarray(v).reshape(1)
        ok = v if ok is None else (ok & v)
    checks["ok"] = ok
    return checks
