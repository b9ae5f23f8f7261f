"""CI-runnable reduced recursion chain: two levels at small configs.

Level 1 verifies the small_proof fixture inside a with-poseidon circuit
and proves the aggregate; level 2 verifies that SELF-GENERATED proof
in-circuit (the recursion step proper: every cross-assert in the gadget
stages runs against the framework's own prover output) and proves again.
Miniature of examples/recursion_chain.py, which mirrors the reference's
14-level chain (/root/reference/examples/multi-proofs/src/main.rs:172-295);
the full chain log lives in docs/chain_log.jsonl.
"""

import numpy as np

from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.prover.prove import prove
from recursive_stwo_tpu.recursion.pipeline import build_verifier_circuit
from recursive_stwo_tpu.verifier import hints, verify
from recursive_stwo_tpu.verifier.spec import VerifierSpec

import pytest

pytestmark = pytest.mark.slow

FIXTURES = "/root/reference/components/test_data"
INPUTS_ONE = ((1, (1, 0, 0, 0)),)
INPUTS3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))
L1_CONFIG = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 2, 8))
L2_CONFIG = PcsConfig(pow_bits=5, fri_config=FriConfig(2, 3, 6))


def _native_verify(proof, inputs):
    spec = VerifierSpec.from_proof(proof)
    pa = hints.prepare(spec, [proof])
    checks = verify.verify_batch(spec, pa, inputs)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing


def test_two_level_chain():
    with open(f"{FIXTURES}/small_proof.bin", "rb") as f:
        base = parse_plonk_with_poseidon_proof(f.read())

    # level 1: verify the stwo fixture in-circuit, prove, re-verify natively
    cs1, _ = build_verifier_circuit(base, list(INPUTS_ONE))
    level1 = prove(cs1.generate_trace(), L1_CONFIG)
    _native_verify(level1, INPUTS3)

    # level 2: verify OUR OWN proof in-circuit (all gadget-stage
    # cross-asserts run against the framework prover's transcript), prove,
    # re-verify
    cs2, _ = build_verifier_circuit(level1, list(INPUTS3))
    assert len(cs2.a_wire) > 1 << 14
    level2 = prove(cs2.generate_trace(), L2_CONFIG)
    _native_verify(level2, INPUTS3)
