"""Device prover kernels are bit-exact twins of the numpy host kernels.

The device module (prover/device.py) runs the same math under jax jit
(Pallas-accelerated on TPU); here it executes on the CPU backend, which
exercises identical code paths minus the Pallas dispatch.
"""

import numpy as np
import pytest

from recursive_stwo_tpu.prover import circle_fft, commit, device
from recursive_stwo_tpu.prover.prove import (
    _basis_at_point,
    _factors_at_point,
    _sample_columns_host,
)

pytestmark = pytest.mark.slow

P = (1 << 31) - 1
rng = np.random.default_rng(7)


def _rand(*shape):
    return rng.integers(0, P, size=shape, dtype=np.uint32)


@pytest.mark.parametrize("log_size,cols", [(6, 3), (10, 10)])
def test_fft_roundtrip_matches_host(log_size, cols):
    vals = _rand(cols, 1 << log_size)
    coeffs_host = circle_fft.interpolate(vals)
    coeffs_dev = device.interpolate(vals)
    np.testing.assert_array_equal(coeffs_host, coeffs_dev)
    np.testing.assert_array_equal(
        circle_fft.evaluate(coeffs_host), device.evaluate(coeffs_dev)
    )
    np.testing.assert_array_equal(
        circle_fft.evaluate_lde(vals, log_size + 2),
        device.evaluate_lde(vals, log_size + 2),
    )


def test_merkle_levels_match_host():
    # mixed-size columns: 5 cols at log 13 (device side), 3 at log 9,
    # 9 at log 5 (host tail)
    columns = {13: _rand(5, 1 << 13), 9: _rand(3, 1 << 9), 5: _rand(9, 1 << 5)}
    tree = commit.CommittedTree(columns)  # host path (device disabled on CPU)
    dev_levels = device.merkle_levels(columns)
    assert len(dev_levels) == len(tree.levels)
    for a, b in zip(tree.levels, dev_levels):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("log_size", [5, 12])
def test_sample_columns_matches_host(log_size):
    coeffs = _rand(7, 1 << log_size)
    p4 = (
        tuple(int(x) for x in _rand(4)),
        tuple(int(x) for x in _rand(4)),
    )
    host = _sample_columns_host(coeffs, _basis_at_point(log_size, p4))
    dev = device.sample_columns(coeffs, _factors_at_point(log_size, p4))
    np.testing.assert_array_equal(host, dev)


def _assert_proofs_equal(a, b):
    assert a.log_size_plonk == b.log_size_plonk
    assert a.log_size_poseidon == b.log_size_poseidon
    np.testing.assert_array_equal(a.plonk_total_sum, b.plonk_total_sum)
    np.testing.assert_array_equal(a.poseidon_total_sum, b.poseidon_total_sum)
    sa, sb = a.stark_proof, b.stark_proof
    np.testing.assert_array_equal(sa.commitments, sb.commitments)
    for ta, tb in zip(sa.sampled_values, sb.sampled_values):
        for ca, cb in zip(ta, tb):
            np.testing.assert_array_equal(ca, cb)
    assert sa.proof_of_work == sb.proof_of_work
    for qa, qb in zip(sa.queried_values, sb.queried_values):
        np.testing.assert_array_equal(qa, qb)
    for da, db in zip(sa.decommitments, sb.decommitments):
        np.testing.assert_array_equal(da.hash_witness, db.hash_witness)
    fa, fb = sa.fri_proof, sb.fri_proof
    np.testing.assert_array_equal(
        fa.first_layer.fri_witness, fb.first_layer.fri_witness
    )
    np.testing.assert_array_equal(
        fa.first_layer.decommitment.hash_witness,
        fb.first_layer.decommitment.hash_witness,
    )
    np.testing.assert_array_equal(
        fa.first_layer.commitment, fb.first_layer.commitment
    )
    assert len(fa.inner_layers) == len(fb.inner_layers)
    for la, lb in zip(fa.inner_layers, fb.inner_layers):
        np.testing.assert_array_equal(la.fri_witness, lb.fri_witness)
        np.testing.assert_array_equal(
            la.decommitment.hash_witness, lb.decommitment.hash_witness
        )
        np.testing.assert_array_equal(la.commitment, lb.commitment)
    np.testing.assert_array_equal(fa.last_layer_poly, fb.last_layer_poly)


def test_prove_device_bit_exact_vs_host():
    """The device-resident pipeline emits byte-identical proofs to the
    numpy host prover (CPU backend here; same code path as TPU minus
    Pallas dispatch)."""
    import jax

    from recursive_stwo_tpu.cs import scalar
    from recursive_stwo_tpu.cs.system import PlonkWithPoseidonCS
    from recursive_stwo_tpu.gadgets.fields import QM31Var
    from recursive_stwo_tpu.gadgets.poseidon import Poseidon2Half
    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.prover.device_prove import prove_device
    from recursive_stwo_tpu.prover.prove import prove

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
    trace = cs.generate_trace()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 3, 9))

    host_proof = prove(trace, config)
    with jax.default_device(jax.devices("cpu")[0]):
        dev_proof = prove_device(trace, config)
    _assert_proofs_equal(host_proof, dev_proof)
