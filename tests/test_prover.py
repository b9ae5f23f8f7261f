"""Prover tests: FFT semantics, commit round-trips, and the full
prove -> verify loop against the framework's stwo-bit-exact verifier."""

import numpy as np
import pytest

from recursive_stwo_tpu.core import circle as cc
from recursive_stwo_tpu.core.qm31 import QM31
from recursive_stwo_tpu.cs import scalar
from recursive_stwo_tpu.cs.system import PlonkWithPoseidonCS
from recursive_stwo_tpu.gadgets.fields import QM31Var
from recursive_stwo_tpu.gadgets.poseidon import Poseidon2Half
from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.prover import circle_fft as cf
from recursive_stwo_tpu.prover import fri as pfri
from recursive_stwo_tpu.prover.commit import CommittedTree
from recursive_stwo_tpu.prover.prove import prove
from recursive_stwo_tpu.verifier import hints, verify
from recursive_stwo_tpu.verifier.spec import VerifierSpec

import pytest

pytestmark = pytest.mark.slow

P = (1 << 31) - 1
INPUTS3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def test_circle_fft_roundtrip_and_basis():
    rng = np.random.default_rng(0)
    for log in (3, 6):
        n = 1 << log
        vals = rng.integers(0, P, n).astype(np.uint32)
        coeffs = cf.interpolate(vals)
        assert np.array_equal(cf.evaluate(coeffs), vals)
        # basis product spot checks
        x, y = cf.domain_points_bit_reversed(log)
        facs = [y.astype(object), x.astype(object)]
        cx = x.astype(object)
        for _ in range(log - 2):
            cx = (2 * cx * cx - 1) % P
            facs.append(cx)
        for r in (0, n // 2, n - 1):
            expect = 0
            for j in range(n):
                term = int(coeffs[j])
                for k in range(log):
                    if (j >> k) & 1:
                        term = term * int(facs[k][r]) % P
                expect = (expect + term) % P
            assert expect == int(vals[r])
        # LDE preserves coefficients
        lde = cf.evaluate_lde(vals, log + 2)
        back = cf.interpolate(lde)
        assert np.array_equal(back[:n], coeffs) and not back[n:].any()


def test_commit_roundtrip_via_verifier_expansion():
    rng = np.random.default_rng(1)
    cols = {
        6: rng.integers(0, P, (5, 64)).astype(np.uint32),
        4: rng.integers(0, P, (3, 16)).astype(np.uint32),
    }
    tree = CommittedTree(cols)
    raw = [int(v) for v in rng.integers(0, 64, 9)]
    values, dec = tree.decommit(raw)
    sib, columns = hints.expand_single_paths(
        6, raw, values, tree.n_columns_per_log_size(), dec, tree.root
    )
    for qi, qq in enumerate(raw):
        assert np.array_equal(columns[6][qi], cols[6][:, qq])
        assert np.array_equal(columns[4][qi], cols[4][:, qq >> 2])


def test_line_interpolate_matches_verifier_eval():
    rng = np.random.default_rng(2)
    log = 4
    n = 1 << log
    coeffs = rng.integers(0, P, (n, 4)).astype(np.uint32)
    coset = cc.Coset.half_odds(log)
    xs = [coset.at(cc.bit_reverse_index(i, log))[0] for i in range(n)]
    evals = np.array([pfri.line_eval_at(coeffs, x) for x in xs], np.uint32)
    back = pfri.line_interpolate(
        QM31(*(evals[:, k].copy() for k in range(4))), log
    )
    assert np.array_equal(back, coeffs)


def _pow_circuit():
    cs = PlonkWithPoseidonCS()
    a = (123456789, 987654321, 555, 2**30)
    b = scalar.q_pow(a, 100)
    av = QM31Var.new_witness(cs, a)
    bv = QM31Var.new_witness(cs, b)
    av.pow(100).equalverify(bv)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    return cs


@pytest.mark.parametrize(
    "fri_cfg", [(0, 5, 16), (1, 2, 8)], ids=["fri-0-5-16", "fri-1-2-8"]
)
def test_prove_verify_roundtrip(fri_cfg):
    cs = _pow_circuit()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(*fri_cfg))
    proof = prove(cs.generate_trace(), config)
    spec = VerifierSpec.from_proof(proof)
    pa = hints.prepare(spec, [proof])
    checks = verify.verify_batch(spec, pa, INPUTS3)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing


def test_prove_poseidon_circuit():
    cs = PlonkWithPoseidonCS()
    left = Poseidon2Half.new_witness(cs, list(range(8)))
    right = Poseidon2Half.new_witness(cs, list(range(8, 16)))
    out = Poseidon2Half.permute_get_rate(left, right)
    out2 = Poseidon2Half.permute_get_rate(out, right)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(0, 3, 8))
    proof = prove(cs.generate_trace(), config)
    spec = VerifierSpec.from_proof(proof)
    pa = hints.prepare(spec, [proof])
    checks = verify.verify_batch(spec, pa, INPUTS3)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing


def test_corrupted_trace_rejected():
    cs = _pow_circuit()
    trace = cs.generate_trace()
    trace["a_val_0"] = trace["a_val_0"].copy()
    trace["a_val_0"][5] ^= 1
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(0, 5, 16))
    proof = prove(trace, config)
    spec = VerifierSpec.from_proof(proof)
    try:
        pa = hints.prepare(spec, [proof])
        checks = verify.verify_batch(spec, pa, INPUTS3)
        rejected = not bool(np.asarray(checks["ok"])[0])
    except AssertionError:
        # rejection during hint expansion is equally acceptable
        rejected = True
    assert rejected, "corrupted trace was accepted by the verifier"
