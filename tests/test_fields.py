"""Bit-exactness tests for M31/CM31/QM31 against python-int ground truth."""

import numpy as np
import pytest

from recursive_stwo_tpu.core import m31, qm31

P = 2147483647
R = 2  # u**2 = 2 + i


def _rand(rng, n):
    return rng.integers(0, P, size=n, dtype=np.uint32)


def test_m31_ops_match_python_ints():
    rng = np.random.default_rng(0)
    a = _rand(rng, 4096)
    b = _rand(rng, 4096)
    ai = a.astype(object)
    bi = b.astype(object)

    np.testing.assert_array_equal(m31.add(a, b).astype(object), (ai + bi) % P)
    np.testing.assert_array_equal(m31.sub(a, b).astype(object), (ai - bi) % P)
    np.testing.assert_array_equal(m31.neg(a).astype(object), (-ai) % P)
    np.testing.assert_array_equal(m31.mul(a, b).astype(object), (ai * bi) % P)


def test_m31_edge_cases():
    vals = np.array([0, 1, 2, P - 1, P - 2, 1 << 30, (1 << 30) - 1], dtype=np.uint32)
    for a in vals:
        for b in vals:
            assert int(m31.add(a, b)) == (int(a) + int(b)) % P
            assert int(m31.sub(a, b)) == (int(a) - int(b)) % P
            assert int(m31.mul(a, b)) == (int(a) * int(b)) % P


def test_m31_inv():
    rng = np.random.default_rng(1)
    a = _rand(rng, 1024)
    a[0] = 1
    a[1] = P - 1
    got = m31.mul(a, m31.inv(a))
    np.testing.assert_array_equal(got, np.ones_like(a))


def test_qm31_mul_vs_reference_tower():
    # (a+bi) + (c+di)u with u^2 = 2+i, i^2 = -1; compare against a slow
    # python-int model.
    rng = np.random.default_rng(2)

    def py_cmul(x, y):
        return ((x[0] * y[0] - x[1] * y[1]) % P, (x[0] * y[1] + x[1] * y[0]) % P)

    def py_cadd(x, y):
        return ((x[0] + y[0]) % P, (x[1] + y[1]) % P)

    def py_qmul(x, y):
        p, q = (x[0], x[1]), (x[2], x[3])
        r, s = (y[0], y[1]), (y[2], y[3])
        pr = py_cmul(p, r)
        qs = py_cmul(q, s)
        rqs = py_cmul((2, 1), qs)
        first = py_cadd(pr, rqs)
        second = py_cadd(py_cmul(p, s), py_cmul(q, r))
        return (first[0], first[1], second[0], second[1])

    for _ in range(200):
        xv = tuple(int(v) for v in rng.integers(0, P, 4))
        yv = tuple(int(v) for v in rng.integers(0, P, 4))
        x = qm31.q_scalar(*xv)
        y = qm31.q_scalar(*yv)
        assert qm31.q_to_tuple(qm31.q_mul(x, y)) == py_qmul(xv, yv)


def test_qm31_inv_pow_shift():
    rng = np.random.default_rng(3)
    for _ in range(50):
        xv = tuple(int(v) for v in rng.integers(1, P, 4))
        x = qm31.q_scalar(*xv)
        assert qm31.q_to_tuple(qm31.q_mul(x, qm31.q_inv(x))) == (1, 0, 0, 0)
        # pow vs repeated multiplication
        acc = qm31.q_one()
        for _ in range(13):
            acc = qm31.q_mul(acc, x)
        assert qm31.q_to_tuple(qm31.q_pow(x, 13)) == qm31.q_to_tuple(acc)
        # shift_by_{i,j,ij} equal multiplication by the basis elements
        assert qm31.q_to_tuple(qm31.q_shift_by_i(x)) == qm31.q_to_tuple(
            qm31.q_mul(x, qm31.q_scalar(0, 1, 0, 0))
        )
        assert qm31.q_to_tuple(qm31.q_shift_by_j(x)) == qm31.q_to_tuple(
            qm31.q_mul(x, qm31.q_scalar(0, 0, 1, 0))
        )
        assert qm31.q_to_tuple(qm31.q_shift_by_ij(x)) == qm31.q_to_tuple(
            qm31.q_mul(x, qm31.q_scalar(0, 0, 0, 1))
        )


def test_fields_under_jax_jit():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    a = rng.integers(0, P, 256, dtype=np.uint32)
    b = rng.integers(0, P, 256, dtype=np.uint32)

    fn = jax.jit(lambda x, y: m31.mul(x, y))
    got = np.asarray(fn(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, m31.mul(a, b))
