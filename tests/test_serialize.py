"""bincode writer round-trip: serialize(parse(bytes)) is byte-identical
for every checked-in fixture (closing the proof format loop — the
reference both reads and writes .bin proofs,
/root/reference/examples/single-proof/src/main.rs:24-27,100-105)."""

import os

import numpy as np

from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.proof.serialize import (
    serialize_plonk_with_poseidon_proof,
)

TESTDATA = os.path.join(
    os.path.dirname(__file__), "..", "recursive_stwo_tpu", "testdata"
)


def _roundtrip(name: str, hash_mode: str):
    with open(os.path.join(TESTDATA, name), "rb") as f:
        data = f.read()
    proof = parse_plonk_with_poseidon_proof(data, hash_mode=hash_mode)
    out = serialize_plonk_with_poseidon_proof(proof, hash_mode=hash_mode)
    assert out == data, f"{name}: round-trip differs at byte " + str(
        next(i for i, (a, b) in enumerate(zip(out, data)) if a != b)
        if out[: min(len(out), len(data))] != data[: min(len(out), len(data))]
        else f"length {len(out)} vs {len(data)}"
    )


def test_small_proof_roundtrip():
    _roundtrip("small_proof.bin", "m31x8")


def test_recursive_16_15_roundtrip():
    _roundtrip("recursive_proof_16_15.bin", "m31x8")


def test_hybrid_hash_roundtrip():
    _roundtrip("hybrid_hash.bin", "bytes32")


def test_parse_of_serialized_prover_output():
    """A framework-generated proof (pickled containers) survives
    serialize -> parse with every array bit-identical."""
    import pickle

    pkl = os.path.join(TESTDATA, "recursive_proof_16_15.bin.pkl")
    if not os.path.exists(pkl):
        with open(os.path.join(TESTDATA, "recursive_proof_16_15.bin"), "rb") as f:
            proof = parse_plonk_with_poseidon_proof(f.read())
    else:
        with open(pkl, "rb") as f:
            proof = pickle.load(f)
    data = serialize_plonk_with_poseidon_proof(proof)
    again = parse_plonk_with_poseidon_proof(data)
    assert again.log_size_plonk == proof.log_size_plonk
    assert np.array_equal(
        again.stark_proof.commitments, proof.stark_proof.commitments
    )
    assert again.stark_proof.proof_of_work == proof.stark_proof.proof_of_work
    assert np.array_equal(
        again.stark_proof.fri_proof.last_layer_poly,
        proof.stark_proof.fri_proof.last_layer_poly,
    )


def test_without_poseidon_roundtrip():
    """Self-consistent bincode for the last-layer (without-poseidon)
    proof: a tiny prove_np proof survives serialize -> parse -> serialize
    byte-identically (the reference's bitcoin_proof.bin format,
    last-layer/src/main.rs:196-200)."""
    import numpy as np

    from recursive_stwo_tpu.cs.system import Mode, PlonkWithoutPoseidonCS
    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.proof.serialize import (
        serialize_plonk_without_poseidon_proof,
    )
    from recursive_stwo_tpu.proof.parse import (
        parse_plonk_without_poseidon_proof,
    )
    from recursive_stwo_tpu.prover.prove_np import prove_np

    cs = PlonkWithoutPoseidonCS()
    a = cs.new_qm31((5, 0, 0, 0), Mode.PUBLIC_INPUT)
    b = cs.new_qm31((7, 0, 0, 0), Mode.WITNESS)
    c = cs.mul(a, b)
    cs.mul(c, c)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    proof = prove_np(
        cs.generate_trace(),
        PcsConfig(pow_bits=5, fri_config=FriConfig(1, 1, 4)),
    )
    data = serialize_plonk_without_poseidon_proof(proof)
    again = parse_plonk_without_poseidon_proof(data)
    assert again.log_size == proof.log_size
    assert np.array_equal(again.total_sum, np.asarray(proof.total_sum))
    assert serialize_plonk_without_poseidon_proof(again) == data


def test_np_small_fixture_verifies():
    """The committed without-poseidon bench fixture
    (testdata/np_small.bin): byte-identical round-trip, full batched
    verification, and a corrupted sampled value is rejected (fast-tier
    coverage of the verify_plonk_without_poseidon mirror,
    /root/reference/examples/last-layer/src/main.rs:188-202)."""
    from recursive_stwo_tpu.proof.parse import (
        parse_plonk_without_poseidon_proof,
    )
    from recursive_stwo_tpu.proof.serialize import (
        serialize_plonk_without_poseidon_proof,
    )
    from recursive_stwo_tpu.verifier import hints, transcript
    from recursive_stwo_tpu.verifier.arrays import from_proofs_np
    from recursive_stwo_tpu.verifier.spec import NoPoseidonVerifierSpec
    from recursive_stwo_tpu.verifier.verify import INPUTS_RECURSIVE
    from recursive_stwo_tpu.verifier.verify_np import verify_batch_np

    with open(os.path.join(TESTDATA, "np_small.bin"), "rb") as f:
        data = f.read()
    proof = parse_plonk_without_poseidon_proof(data)
    assert serialize_plonk_without_poseidon_proof(proof) == data

    spec = NoPoseidonVerifierSpec.for_rows(proof.log_size, proof.config)
    pa = hints.prepare(
        spec, [proof],
        arrays_fn=from_proofs_np,
        transcript_fn=transcript.run_transcript_np,
    )
    checks = verify_batch_np(spec, pa, INPUTS_RECURSIVE)
    assert bool(np.asarray(checks["ok"]).all())

    bad = np.asarray(pa.samples_flat).copy()
    bad[0, 0, 0] ^= 1
    checks_bad = verify_batch_np(spec, pa._replace(samples_flat=bad),
                                 INPUTS_RECURSIVE)
    assert not bool(np.asarray(checks_bad["ok"]).all())
