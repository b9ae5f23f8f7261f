"""Device-path verification of the REAL last-layer artifacts (the chain's
level-14 Sha256Poseidon31 proof and the bitcoin Sha256MerkleChannel
output proof), plus corruption rejection.

Mirror of the reference's native checks around the last layer
(examples/last-layer/src/main.rs:30-95, 188-202).  SHA-256 transcript +
Merkle expansion run on the host (root-asserting AVX-512 kernels); pow,
total-sum, composition, quotients and FRI folds run in the jitted device
program (verify_sha256.device_checks_*)."""

import copy
import os
import pickle

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "examples", "data")
LVL14 = os.path.join(DATA, "level14-1.pkl")
BTC = os.path.join(DATA, "bitcoin_proof.pkl")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (os.path.exists(LVL14) and os.path.exists(BTC)),
        reason="chain artifacts not on disk",
    ),
]

INNER3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _btc_inputs():
    from recursive_stwo_tpu.recursion.pipeline import build_last_circuit
    from recursive_stwo_tpu.verifier import sha256_merkle
    from recursive_stwo_tpu.verifier.verify_sha256 import (
        run_transcript_sha256p31,
    )

    lvl14 = _load(LVL14)
    cs_last, _ = build_last_circuit(
        lvl14, list(INNER3),
        transcript_fn=lambda s, pa: run_transcript_sha256p31(s, lvl14),
        hash_node_fn=sha256_merkle.hash_node,
    )
    return tuple(
        (i + 1, tuple(int(x) for x in cs_last.value(i + 1)))
        for i in range(cs_last.num_input)
    )


def test_sha256p31_device_accepts_level14():
    from recursive_stwo_tpu.verifier.verify_sha256 import verify_sha256p31

    r = verify_sha256p31(_load(LVL14), INNER3)
    assert np.asarray(r["ok"]).all()


def test_sha256p31_device_rejects_corrupt_sample():
    from recursive_stwo_tpu.verifier.verify_sha256 import verify_sha256p31

    bad = copy.deepcopy(_load(LVL14))
    sv = bad.stark_proof.sampled_values
    col = sv[2][0]
    col[0] = tuple((int(x) + 1) % ((1 << 31) - 1) for x in col[0])
    r = verify_sha256p31(bad, INNER3)
    assert not np.asarray(r["ok"]).all()


def test_bitcoin_device_accepts_real_artifact():
    from recursive_stwo_tpu.verifier.verify_sha256 import verify_sha256np

    r = verify_sha256np(_load(BTC), _btc_inputs())
    assert np.asarray(r["ok"]).all()


def test_bitcoin_device_rejects_corruption():
    from recursive_stwo_tpu.verifier.verify_sha256 import verify_sha256np

    inputs = _btc_inputs()
    bad = copy.deepcopy(_load(BTC))
    fw = np.asarray(
        bad.stark_proof.fri_proof.first_layer.fri_witness, np.uint32
    ).copy()
    fw.flat[0] = (int(fw.flat[0]) + 1) % ((1 << 31) - 1)
    bad.stark_proof.fri_proof.first_layer.fri_witness = fw
    r = verify_sha256np(bad, inputs)
    assert not np.asarray(r["ok"]).all()

    # wrong public input -> total-sum check fails on device
    wrong = list(inputs)
    idx, val = wrong[5]
    wrong[5] = (idx, ((val[0] + 1) % ((1 << 31) - 1),) + val[1:])
    r2 = verify_sha256np(_load(BTC), tuple(wrong))
    assert not np.asarray(r2["ok"]).all()
