"""SHA-256 channel/Merkle flavor tests: the framework-defined
Sha256Poseidon31 with-poseidon flavor (prove_sha256p31 /
verify_sha256p31_host) used by recursion-chain level 14 and the
last-layer flow (reference: examples/multi-proofs/src/main.rs:289-295,
examples/last-layer/src/main.rs:30-95)."""

import hashlib

import numpy as np
import pytest

from recursive_stwo_tpu.core import sha256 as core_sha
from recursive_stwo_tpu.cs import scalar
from recursive_stwo_tpu.cs.system import PlonkWithPoseidonCS
from recursive_stwo_tpu.gadgets.fields import QM31Var
from recursive_stwo_tpu.gadgets.poseidon import Poseidon2Half
from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.prover.commit import Sha256CommittedTree
from recursive_stwo_tpu.prover.prove_sha256 import (
    Sha256ProverChannel,
    prove_sha256p31,
)
from recursive_stwo_tpu.verifier import hints, sha256_merkle
from recursive_stwo_tpu.verifier.verify_sha256 import verify_sha256p31_host

import pytest

pytestmark = pytest.mark.slow

P = (1 << 31) - 1
INPUTS3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def test_sha256_words_matches_hashlib():
    rng = np.random.default_rng(0)
    for K in (1, 8, 16, 17, 40):
        w = rng.integers(0, 2**32, size=(4, K), dtype=np.uint64).astype(
            np.uint32
        )
        got = core_sha.sha256_words(w)
        for i in range(4):
            want = core_sha.digest_to_words(
                hashlib.sha256(core_sha.words_to_bytes(w[i])).digest()
            )
            assert np.array_equal(got[i], want)


def test_sha256_tree_roundtrip_via_expansion():
    rng = np.random.default_rng(1)
    cols = {
        6: rng.integers(0, P, (5, 64)).astype(np.uint32),
        4: rng.integers(0, P, (3, 16)).astype(np.uint32),
    }
    tree = Sha256CommittedTree(cols)
    raw = [int(v) for v in rng.integers(0, 64, 9)]
    values, dec = tree.decommit(raw)
    sib, columns = hints.expand_single_paths(
        6, raw, values, tree.n_columns_per_log_size(), dec, tree.root,
        hash_node_fn=sha256_merkle.hash_node,
    )
    for qi, qq in enumerate(raw):
        assert np.array_equal(columns[6][qi], cols[6][:, qq])
        assert np.array_equal(columns[4][qi], cols[4][:, qq >> 2])
    # wrong hasher must not reproduce the root
    with pytest.raises(AssertionError):
        hints.expand_single_paths(
            6, raw, values, tree.n_columns_per_log_size(), dec, tree.root
        )


def test_sha256_grind_pow():
    ch = Sha256ProverChannel()
    ch.mix_one_felt([7, 0, 0, 0])
    nonce = ch.grind_pow(10, batch=1 << 10)
    assert ch.ch.verify_pow_nonce(10, nonce)
    probe = ch.ch.clone()
    probe.mix_u64(nonce)
    assert probe.trailing_zeros() >= 10


def _pow_circuit():
    cs = PlonkWithPoseidonCS()
    a = (123456789, 987654321, 555, 2**30)
    b = scalar.q_pow(a, 100)
    av = QM31Var.new_witness(cs, a)
    bv = QM31Var.new_witness(cs, b)
    av.pow(100).equalverify(bv)
    left = Poseidon2Half.new_witness(cs, list(range(8)))
    right = Poseidon2Half.new_witness(cs, list(range(8, 16)))
    Poseidon2Half.permute_get_rate(left, right)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    return cs


def test_sha256p31_prove_verify_roundtrip():
    cs = _pow_circuit()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 2, 8))
    proof = prove_sha256p31(cs.generate_trace(), config)
    checks = verify_sha256p31_host(proof, INPUTS3)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing


def test_sha256p31_rejects_corruption():
    cs = _pow_circuit()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 2, 8))
    proof = prove_sha256p31(cs.generate_trace(), config)

    # corrupt one queried value -> merkle_fri must fail
    import copy

    bad = copy.deepcopy(proof)
    qv = bad.stark_proof.queried_values[1]
    qv[0] = (int(qv[0]) + 1) % P
    checks = verify_sha256p31_host(bad, INPUTS3)
    assert not bool(np.asarray(checks["merkle_fri"])[0])
    assert not bool(np.asarray(checks["ok"])[0])

    # corrupt the nonce -> pow must fail
    bad2 = copy.deepcopy(proof)
    bad2.stark_proof.proof_of_work += 1
    checks2 = verify_sha256p31_host(bad2, INPUTS3)
    assert not bool(np.asarray(checks2["pow"])[0])
    assert not bool(np.asarray(checks2["ok"])[0])


def test_sha256_last_layer_flow_miniature():
    """Full last-layer SHA-256 flow in miniature: sha256p31 input proof ->
    native verify -> last circuit (packed public inputs from the SHA-256
    transcript) -> prove under Sha256MerkleChannel flavor -> native verify
    (examples/last_layer.py is the full-size version; reference flow
    examples/last-layer/src/main.rs:30-202)."""
    from recursive_stwo_tpu.prover.commit import Sha256CommittedTree
    from recursive_stwo_tpu.prover.prove_np import prove_np
    from recursive_stwo_tpu.recursion.pipeline import build_last_circuit
    from recursive_stwo_tpu.verifier.verify_sha256 import (
        run_transcript_sha256p31,
        verify_sha256np_host,
    )

    cs_in = _pow_circuit()
    in_config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 2, 8))
    proof = prove_sha256p31(cs_in.generate_trace(), in_config)
    checks = verify_sha256p31_host(proof, INPUTS3)
    assert bool(np.asarray(checks["ok"])[0]), checks

    cs, _ = build_last_circuit(
        proof,
        list(INPUTS3),
        transcript_fn=lambda s, pa: run_transcript_sha256p31(s, proof),
        hash_node_fn=sha256_merkle.hash_node,
    )
    out_config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 2, 8))
    out = prove_np(
        cs.generate_trace(), out_config,
        channel=Sha256ProverChannel(), tree_cls=Sha256CommittedTree,
    )
    inputs = tuple(
        (i + 1, tuple(int(x) for x in cs.value(i + 1)))
        for i in range(cs.num_input)
    )
    out_checks = verify_sha256np_host(out, inputs)
    failing = [k for k, v in out_checks.items()
               if not bool(np.asarray(v)[0])]
    assert not failing, failing
