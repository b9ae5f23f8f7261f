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
