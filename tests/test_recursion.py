"""End-to-end in-circuit recursive verifier tests (the reference's dominant
test pattern: build the gadget circuit, finalize, and check every native
cross-assert along the way — SURVEY.md §4 tier 3)."""

import numpy as np
import pytest

from recursive_stwo_tpu.models.flagship import load_fixture
from recursive_stwo_tpu.recursion.pipeline import build_verifier_circuit

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def small_circuit():
    proof, _ = load_fixture("small_proof")
    return build_verifier_circuit(proof, [(1, (1, 0, 0, 0))])


def test_single_proof_circuit_size_parity(small_circuit):
    """The reference's single-proof example produces a proof named
    recursive_proof_16_15 (log_plonk=16); our circuit must land in the
    same power-of-two bucket."""
    cs, results = small_circuit
    assert len(cs.a_wire) == 1 << 16
    assert len(cs.flow_wires) % 16 == 0
    # poseidon invocations consistent with a log-15 poseidon trace
    assert len(cs.flow_wires) <= 1 << 15


def test_single_proof_circuit_checks(small_circuit):
    cs, results = small_circuit
    # finalization ran in the fixture; re-run the checks explicitly
    cs.check_arithmetics()
    cs.check_poseidon_invocations()
    trace = cs.generate_trace()
    assert trace["a_val_0"].shape == (1 << 16,)
    # the four logup multiplicity columns exist and balance per wire
    assert trace["mult_a"].shape == (1 << 16,)


def test_wrong_public_input_rejected():
    proof, _ = load_fixture("small_proof")
    with pytest.raises(AssertionError):
        build_verifier_circuit(proof, [(1, (2, 0, 0, 0))])


def test_corrupted_nonce_rejected():
    import copy

    proof, _ = load_fixture("small_proof")
    proof = copy.deepcopy(proof)
    proof.stark_proof.proof_of_work ^= 1
    with pytest.raises(AssertionError):
        # PoW constraint fails inside the fiat-shamir stage
        build_verifier_circuit(proof, [(1, (1, 0, 0, 0))])
