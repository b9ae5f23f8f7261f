"""Round-trip tests for the PlonkWithoutPoseidon prover/verifier pair
(prove_plonk_without_poseidon / verify_plonk_without_poseidon parity;
reference consumption site: examples/last-layer/src/main.rs:188-202)."""

import numpy as np
import pytest

from recursive_stwo_tpu.cs.system import Mode, PlonkWithoutPoseidonCS
from recursive_stwo_tpu.gadgets.fields import QM31Var
from recursive_stwo_tpu.gadgets.poseidon import Poseidon2Half
from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.prover.prove_np import prove_np
from recursive_stwo_tpu.verifier import hints, transcript
from recursive_stwo_tpu.verifier.arrays import from_proofs_np
from recursive_stwo_tpu.verifier.spec import NoPoseidonVerifierSpec
from recursive_stwo_tpu.verifier.verify import INPUTS_RECURSIVE
from recursive_stwo_tpu.verifier.verify_np import verify_batch_np

import pytest

pytestmark = pytest.mark.slow

CONFIG = PcsConfig(
    pow_bits=5,
    fri_config=FriConfig(
        log_last_layer_degree_bound=2, log_blowup_factor=2, n_queries=8
    ),
)


def _build_circuit():
    """Exercises every without-poseidon gate type: the emulated Poseidon
    permutation (m4 / pow5m4 / pow5 / hadamard / grandsum) plus plain
    arithmetic rows."""
    cs = PlonkWithoutPoseidonCS()
    left = Poseidon2Half.new_witness(cs, tuple(range(1, 9)))
    right = Poseidon2Half.new_witness(cs, tuple(range(9, 17)))
    rate = Poseidon2Half.permute_get_rate(left, right)
    rate.equalverify(rate)
    x = QM31Var.new_witness(cs, (5, 6, 7, 8))
    y = (x * x) + x
    y.equalverify(y)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    return cs


@pytest.fixture(scope="module")
def np_proof():
    cs = _build_circuit()
    trace = cs.generate_trace()
    proof = prove_np(trace, CONFIG)
    return proof


def test_np_prove_verify_roundtrip(np_proof):
    spec = NoPoseidonVerifierSpec.for_rows(np_proof.log_size, CONFIG)
    spec.validate(np_proof)
    pa = hints.prepare(
        spec, [np_proof],
        arrays_fn=from_proofs_np,
        transcript_fn=transcript.run_transcript_np,
    )
    checks = verify_batch_np(spec, pa, INPUTS_RECURSIVE)
    for name, v in checks.items():
        assert np.asarray(v).all(), f"check failed: {name}"


def test_np_rejects_corrupted_samples(np_proof):
    spec = NoPoseidonVerifierSpec.for_rows(np_proof.log_size, CONFIG)
    bad_tree = [c.copy() for c in np_proof.stark_proof.sampled_values[1]]
    bad_tree[0] = bad_tree[0].copy()
    bad_tree[0][0, 0] ^= 1
    sv = list(np_proof.stark_proof.sampled_values)
    sv[1] = bad_tree
    bad = np_proof._replace if hasattr(np_proof, "_replace") else None
    import dataclasses

    bad_sp = dataclasses.replace(np_proof.stark_proof, sampled_values=sv) \
        if dataclasses.is_dataclass(np_proof.stark_proof) else \
        np_proof.stark_proof._replace(sampled_values=sv)
    bad_proof = dataclasses.replace(np_proof, stark_proof=bad_sp) \
        if dataclasses.is_dataclass(np_proof) else \
        np_proof._replace(stark_proof=bad_sp)

    failed = False
    try:
        pa = hints.prepare(
            spec, [bad_proof],
            arrays_fn=from_proofs_np,
            transcript_fn=transcript.run_transcript_np,
        )
        checks = verify_batch_np(spec, pa, INPUTS_RECURSIVE)
        failed = not bool(np.asarray(checks["ok"]).all())
    except (AssertionError, StopIteration):
        # hint expansion rejects: transcript shift exhausts the witness
        failed = True
    assert failed, "corrupted proof was accepted"


def test_np_rejects_wrong_inputs(np_proof):
    spec = NoPoseidonVerifierSpec.for_rows(np_proof.log_size, CONFIG)
    pa = hints.prepare(
        spec, [np_proof],
        arrays_fn=from_proofs_np,
        transcript_fn=transcript.run_transcript_np,
    )
    checks = verify_batch_np(spec, pa, ((1, (1, 0, 0, 0)),))
    assert not bool(np.asarray(checks["total_sum"]).all())


def test_np_verify_jitted_batch(np_proof):
    """Jitted batched device-path verification of without-poseidon proofs
    (mirror of verify_plonk_without_poseidon,
    examples/last-layer/src/main.rs:188-202): one compiled program checks a
    replicated batch, and a corrupted lane fails while the others pass."""
    import jax
    import jax.numpy as jnp

    spec = NoPoseidonVerifierSpec.for_rows(np_proof.log_size, CONFIG)
    pa = hints.prepare(
        spec, [np_proof] * 4,
        arrays_fn=from_proofs_np,
        transcript_fn=transcript.run_transcript_np,
    )
    paj = jax.tree.map(jnp.asarray, pa)
    fn = jax.jit(
        lambda a: verify_batch_np(spec, a, INPUTS_RECURSIVE)["ok"]
    )
    ok = np.asarray(fn(paj))
    assert ok.shape == (4,) and ok.all()

    # corrupt one lane's sampled values: only that lane must fail
    bad = np.asarray(pa.samples_flat).copy()
    bad[2, 0, 0] ^= 1
    pa_bad = pa._replace(samples_flat=bad)
    ok2 = np.asarray(fn(jax.tree.map(jnp.asarray, pa_bad)))
    assert not ok2[2] and ok2[[0, 1, 3]].all()
