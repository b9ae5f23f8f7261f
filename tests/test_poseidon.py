"""Poseidon2 permutation KATs (vector from the reference implementation,
/root/reference/primitives/poseidon31/src/implementation.rs:156-173)."""

import numpy as np

from recursive_stwo_tpu.core import poseidon2

EXPECTED = [
    260776483, 1182896747, 1656699352, 746018898, 102875940, 1812541025,
    515874083, 755063943, 1682438524, 1265420601, 238640995, 200799880,
    1659717477, 2080202267, 1269806256, 1287849264,
]


def test_poseidon2_kat_numpy():
    state = np.arange(16, dtype=np.uint32)
    out = poseidon2.permute(state)
    assert out.tolist() == EXPECTED


def test_poseidon2_kat_batched():
    state = np.tile(np.arange(16, dtype=np.uint32), (7, 3, 1))
    out = poseidon2.permute(state)
    assert (out == np.array(EXPECTED, np.uint32)).all()


def test_poseidon2_kat_jax():
    import jax
    import jax.numpy as jnp

    state = jnp.tile(jnp.arange(16, dtype=jnp.uint32), (4, 1))
    out = jax.jit(poseidon2.permute)(state)
    assert np.asarray(out)[0].tolist() == EXPECTED
