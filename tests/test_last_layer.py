"""Last-layer (PlonkWithoutPoseidon, public-input) verifier circuit tests."""

import numpy as np
import pytest

from recursive_stwo_tpu.models.flagship import load_fixture
from recursive_stwo_tpu.recursion.pipeline import build_last_circuit

import pytest

pytestmark = pytest.mark.slow


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


# ---------------------------------------------------------------------------
# negative tests: corrupted public inputs must trip the specific equalverify
# (ref: last/answer/src/lib.rs:393-474 round-trip + packing rules
#  merkle_proofs.rs:120-163)
# ---------------------------------------------------------------------------

def _last_setup(proof):
    from recursive_stwo_tpu.recursion import last as last_mod
    from recursive_stwo_tpu.verifier import hints as hints_mod
    from recursive_stwo_tpu.verifier import transcript
    from recursive_stwo_tpu.verifier.spec import VerifierSpec

    spec = VerifierSpec.from_proof(proof)
    pa = hints_mod.prepare(spec, [proof])
    fs = transcript.run_transcript(spec, pa)
    tree_columns = [
        {lvl: np.asarray(v)[0] for lvl, v in pa.tree_paths[t].columns.items()}
        for t in range(4)
    ]
    return last_mod, spec, pa, fs, tree_columns


def test_corrupted_packed_decommit_column_rejected():
    """Flipping one raw column opening makes the witness disagree with the
    packed public input: the decompose/equalverify in
    LastSinglePathMerkleProofVar must fail."""
    from recursive_stwo_tpu.cs.system import PlonkWithoutPoseidonCS
    from recursive_stwo_tpu.recursion.answer import AnswerResults  # noqa: F401

    proof, _ = load_fixture("small_proof")
    last_mod, spec, pa, fs, tree_columns = _last_setup(proof)

    cs = PlonkWithoutPoseidonCS()
    fs_input = last_mod.LastFiatShamirInput(spec, proof, fs)
    fs_input_var = last_mod.LastFiatShamirInputVar(cs, fs_input)

    # corrupt one opening of tree 1 (public input side)
    bad_columns = [dict(d) for d in tree_columns]
    lvl = sorted(bad_columns[1].keys())[0]
    arr = np.asarray(bad_columns[1][lvl]).copy()
    arr[0, 0] ^= 1
    bad_columns[1][lvl] = arr

    decommit_input_var = last_mod.LastDecommitInputVar(
        cs, bad_columns, spec.n_queries
    )
    proof_var = last_mod.LastProofVar(cs, proof)
    fs_results = last_mod.LastFiatShamirResults.compute(
        proof_var, fs_input_var, [(1, (1, 0, 0, 0))]
    )
    with pytest.raises(AssertionError):
        last_mod.LastAnswerResults.compute(
            spec, fs_results, decommit_input_var, tree_columns, proof_var, None
        )


def test_corrupted_pair_proof_column_rejected():
    """Flipping a first-layer pair-proof self column (public input) must
    fail the fri-answer equalverify in LastFoldingResults."""
    from recursive_stwo_tpu.cs.system import PlonkWithoutPoseidonCS

    proof, _ = load_fixture("small_proof")
    last_mod, spec, pa, fs, tree_columns = _last_setup(proof)

    cs = PlonkWithoutPoseidonCS()
    fs_input = last_mod.LastFiatShamirInput(spec, proof, fs)
    fs_input_var = last_mod.LastFiatShamirInputVar(cs, fs_input)
    decommit_input_var = last_mod.LastDecommitInputVar(
        cs, tree_columns, spec.n_queries
    )

    # corrupt one self-column QM31 of the first-layer pair paths
    flp = pa.first_layer_paths
    lvl = sorted(flp.self_columns.keys())[0]
    bad_self = dict(flp.self_columns)
    arr = np.asarray(bad_self[lvl]).copy()
    arr[0, 0, 0] ^= 1
    bad_self[lvl] = arr
    bad_flp = flp._replace(self_columns=bad_self)

    first_layer_vars = last_mod.alloc_pair_inputs(cs, bad_flp, spec.n_queries)
    inner_layer_vars = [
        last_mod.alloc_pair_inputs(cs, pp, spec.n_queries)
        for pp in pa.inner_layer_paths
    ]
    proof_var = last_mod.LastProofVar(cs, proof)
    fs_results = last_mod.LastFiatShamirResults.compute(
        proof_var, fs_input_var, [(1, (1, 0, 0, 0))]
    )
    last_mod.LastCompositionCheck.compute(
        spec, fs_results.lookup_elements, fs_results.random_coeff,
        fs_results.oods_point, proof_var,
    )
    answer_results = last_mod.LastAnswerResults.compute(
        spec, fs_results, decommit_input_var, tree_columns, proof_var, None
    )
    with pytest.raises(AssertionError):
        last_mod.LastFoldingResults.compute(
            spec, proof_var, fs_results, answer_results,
            first_layer_vars, inner_layer_vars,
        )


def test_last_circuit_prove_roundtrip():
    """Prove the full last-layer circuit with the without-poseidon prover at
    a small config and re-verify (CI version of examples/last_layer.py;
    ref: /root/reference/examples/last-layer/src/main.rs:96-202)."""
    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.prover.prove_np import prove_np
    from recursive_stwo_tpu.verifier import hints, transcript
    from recursive_stwo_tpu.verifier.arrays import from_proofs_np
    from recursive_stwo_tpu.verifier.spec import NoPoseidonVerifierSpec
    from recursive_stwo_tpu.verifier.verify_np import verify_batch_np

    proof, _ = load_fixture("small_proof")
    cs, _ = build_last_circuit(proof, [(1, (1, 0, 0, 0))])
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 1, 8))
    out = prove_np(cs.generate_trace(), config)
    spec = NoPoseidonVerifierSpec.for_rows(out.log_size, config)
    spec.validate(out)
    inputs = tuple(
        (i + 1, tuple(int(x) for x in cs.value(i + 1)))
        for i in range(cs.num_input)
    )
    pa = hints.prepare(
        spec, [out],
        arrays_fn=from_proofs_np,
        transcript_fn=transcript.run_transcript_np,
    )
    checks = verify_batch_np(spec, pa, inputs)
    failing = [
        k for k, v in checks.items() if not bool(np.asarray(v).all())
    ]
    assert not failing, failing
