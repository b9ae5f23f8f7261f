"""Stage-level prove round-trips — the reference's dominant test pattern.

Each in-circuit verifier stage (as a prefix: fiat_shamir; +composition;
+answer; +folding) is built over the small_proof fixture, finalized, proved
with the framework prover at a small FRI config, and re-verified with the
framework verifier.  Mirrors e.g.
/root/reference/components/recursive/fiat_shamir/src/lib.rs:217-234 and
/root/reference/components/recursive/folding/src/lib.rs:286-303.
"""

import numpy as np
import pytest

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
# cheap output config: blowup 2, 8 queries, tiny PoW — the round-trip tests
# the circuit/prover/verifier loop, not production soundness parameters
OUT_CONFIG = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 2, 8))


@pytest.fixture(scope="module")
def small_proof():
    with open(f"{FIXTURES}/small_proof.bin", "rb") as f:
        return parse_plonk_with_poseidon_proof(f.read())


@pytest.mark.parametrize(
    "stage", ["fiat_shamir", "composition", "answer", "folding"]
)
def test_stage_prove_roundtrip(small_proof, stage):
    cs, _ = build_verifier_circuit(
        small_proof, list(INPUTS_ONE), through_stage=stage
    )
    proof = prove(cs.generate_trace(), OUT_CONFIG)
    spec = VerifierSpec.from_proof(proof)
    pa = hints.prepare(spec, [proof])
    # the output proof's public inputs are the circuit's own input wires
    inputs = tuple(
        (i + 1, tuple(int(x) for x in cs.value(i + 1)))
        for i in range(cs.num_input)
    )
    checks = verify.verify_batch(spec, pa, inputs)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, (stage, failing)
