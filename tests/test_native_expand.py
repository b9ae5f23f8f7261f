"""Native (C++) hint-preparation path: bit-exactness vs the numpy twin and
corruption rejection.

The C++ kernels (native/pathexpand.cpp) mirror verifier/hints.py's
expand_single_paths_batched / expand_pair_paths_batched and the fused FRI
fold pipeline (reference semantics: hints/decommit.rs:44-183,
hints/folding.rs:296-601)."""

import copy

import numpy as np
import pytest

from recursive_stwo_tpu.models.flagship import load_fixture
from recursive_stwo_tpu.utils import native
from recursive_stwo_tpu.verifier import hints

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels unavailable"
)


def _prepare_both(name, batch=2):
    proof, spec = load_fixture(name)
    proofs = [proof] * batch
    pa_native = hints.prepare(spec, proofs)
    avail = native.available
    native.available = lambda: False
    try:
        pa_numpy = hints.prepare(spec, proofs)
    finally:
        native.available = avail
    return pa_native, pa_numpy


@pytest.mark.parametrize("name", ["small_proof", "recursive_proof_16_15"])
def test_native_prepare_bit_exact(name):
    import jax

    pa_native, pa_numpy = _prepare_both(name)
    ln, lp = jax.tree.leaves(pa_native), jax.tree.leaves(pa_numpy)
    assert len(ln) == len(lp)
    for a, b in zip(ln, lp):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_native_rejects_corrupted_hash_witness():
    proof, spec = load_fixture("small_proof")
    bad = copy.deepcopy(proof)
    hw = np.asarray(
        bad.stark_proof.decommitments[0].hash_witness, np.uint32
    ).copy()
    hw.flat[0] ^= 1
    bad.stark_proof.decommitments[0].hash_witness = hw
    with pytest.raises(AssertionError):
        hints.prepare(spec, [bad])


def test_native_rejects_corrupted_fri_witness():
    proof, spec = load_fixture("small_proof")
    bad = copy.deepcopy(proof)
    fw = np.asarray(
        bad.stark_proof.fri_proof.first_layer.fri_witness, np.uint32
    ).copy()
    fw.flat[0] = (fw.flat[0] + 1) % ((1 << 31) - 1)
    bad.stark_proof.fri_proof.first_layer.fri_witness = fw
    with pytest.raises(AssertionError):
        hints.prepare(spec, [bad])


def test_native_rejects_truncated_hash_witness():
    proof, spec = load_fixture("small_proof")
    bad = copy.deepcopy(proof)
    hw = np.asarray(
        bad.stark_proof.decommitments[0].hash_witness, np.uint32
    ).reshape(-1, 8)
    bad.stark_proof.decommitments[0].hash_witness = hw[:-1]
    with pytest.raises(AssertionError):
        hints.prepare(spec, [bad])


@pytest.mark.parametrize("name", ["small_proof", "recursive_proof_16_15"])
def test_native_prepare_dict_order_identical(name):
    """Dict INSERTION ORDER must match the numpy twin, not just sorted
    values: the circuit layer allocates witness wires by iterating
    .items(), so a different order silently changes every proof the
    recursion chain emits (caught as a level-10/13 artifact mismatch)."""
    pa_native, pa_numpy = _prepare_both(name, batch=1)
    for t in range(4):
        assert list(pa_native.tree_paths[t].columns) == list(
            pa_numpy.tree_paths[t].columns
        )
    assert list(pa_native.first_layer_paths.self_columns) == list(
        pa_numpy.first_layer_paths.self_columns
    )
    assert list(pa_native.first_layer_paths.sibling_columns) == list(
        pa_numpy.first_layer_paths.sibling_columns
    )
    for a, b in zip(pa_native.inner_layer_paths, pa_numpy.inner_layer_paths):
        assert list(a.self_columns) == list(b.self_columns)
