"""Last-layer (PlonkWithoutPoseidon, public-input) verifier circuit tests."""

import numpy as np
import pytest

from recursive_stwo_tpu.models.flagship import load_fixture
from recursive_stwo_tpu.recursion.pipeline import build_last_circuit


@pytest.fixture(scope="module")
def last_circuit():
    proof, _ = load_fixture("small_proof")
    return build_last_circuit(proof, [(1, (1, 0, 0, 0))])


def test_last_circuit_builds(last_circuit):
    cs, results = last_circuit
    n = len(cs.a_wire)
    assert n & (n - 1) == 0
    # public inputs: 3 pinned + t + hash(2) + sums(2) + z + alpha + coeffs(2)
    # + packed queries + fri alphas + packed decommit columns + pair columns
    assert cs.num_input > 100
    cs.check_arithmetics()
    trace = cs.generate_trace()
    assert trace["op1"].shape == (n,)


def test_last_circuit_public_input_packing(last_circuit):
    from recursive_stwo_tpu.recursion.last import pack_columns

    assert pack_columns([1, 2]) == [(1, 2, 0, 0)]
    assert pack_columns([1, 2, 3, 4, 5]) == [(1, 2, 3, 4), (5, 0, 0, 0)]
    p = pack_columns(list(range(1, 12)))
    assert len(p) == 2  # hashed


def test_last_circuit_wrong_inner_inputs():
    proof, _ = load_fixture("small_proof")
    with pytest.raises(AssertionError):
        # default (1,1),(2,i),(3,j) inner inputs don't match small_proof's
        build_last_circuit(proof, None)
