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
