"""Poseidon2 permutation KATs (vector from the reference implementation,
/root/reference/primitives/poseidon31/src/implementation.rs:156-173)."""

import numpy as np
import pytest

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


def test_pallas_kernel_body_bit_exact():
    """The Pallas Poseidon2-16 kernel body is bit-exact vs the scalar
    permute (kernel function run directly on CPU arrays; the compiled
    path runs on real TPU in bench.py)."""
    import jax.numpy as jnp

    from recursive_stwo_tpu.core import poseidon2
    from recursive_stwo_tpu.ops import poseidon_pallas

    class FakeRef:
        def __init__(self, arrs):
            self.arrs = list(arrs)

        def __getitem__(self, i):
            return self.arrs[i]

        def __setitem__(self, i, v):
            self.arrs[i] = v

    rng = np.random.default_rng(7)
    xn = rng.integers(0, 2**31 - 1, size=(256, 16)).astype(np.uint32)
    lanes = [jnp.asarray(xn[:, i].reshape(2, 128)) for i in range(16)]
    in_ref = FakeRef(lanes)
    out_ref = FakeRef([None] * 16)
    poseidon_pallas._kernel(in_ref, out_ref)
    out = np.stack([np.asarray(a).reshape(-1) for a in out_ref.arrs], axis=1)
    assert np.array_equal(out, poseidon2.permute(xn))


@pytest.mark.slow
def test_pallas_build4_interpret_bit_exact():
    """The 4-D lane-major Pallas kernel (grid + BlockSpec index_map +
    _View ref squeeze) is bit-exact vs the scalar permute, via
    interpret=True on CPU random (L, 16, R, 128) states.  Slow tier:
    interpret-mode pallas costs ~30 s to trace on CPU."""
    import jax.numpy as jnp

    from recursive_stwo_tpu.ops import poseidon_pallas

    L, R = 2, 16
    rng = np.random.default_rng(11)
    xn = rng.integers(0, 2**31 - 1, size=(L, 16, R, 128)).astype(np.uint32)
    fn = poseidon_pallas._build4(L, R, 8, interpret=True)
    out = np.asarray(fn(jnp.asarray(xn)))
    # lane-major (L, 16, R, 128) -> states (L, R, 128, 16) for the ref
    ref = poseidon2.permute(np.moveaxis(xn, 1, -1))
    assert np.array_equal(np.moveaxis(out, 1, -1), ref)
