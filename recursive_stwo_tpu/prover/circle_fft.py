"""Circle FFT over M31 (stwo basis), array-first.

A circle polynomial of log_size n is represented by 2^n coefficients in the
stwo FFT basis: b_{j}(p) = y^{j_0} * x^{j_1} * pi(x)^{j_2} * ... *
pi^{n-2}(x)^{j_{n-1}} where j_k are the bits of the coefficient index and
pi(x) = 2x^2 - 1.  Evaluations live on CanonicCoset(n).circle_domain() in
bit-reversed index order (the commitment layout the verifier's query
machinery addresses — verifier/points.py:domain_point).

All transforms are vectorized over leading axes (columns), numpy/jax
agnostic, and work on uint32 M31 limbs; QM31 values transform limb-wise
(the FFT is M31-linear).

Self-describing validation: evaluate == pointwise basis evaluation, and
interpolate . evaluate == identity (tests/test_prover_fft.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..core import circle as ccircle
from ..core import m31


@lru_cache(maxsize=None)
def domain_points_bit_reversed(log_size: int):
    """(x, y) uint32 arrays of the circle domain in bit-reversed order."""
    dom = ccircle.CanonicCoset(log_size).circle_domain()
    n = 1 << log_size
    br = ccircle.bit_reverse_indices(log_size)
    half = dom.half_coset
    order = np.uint64(1) << np.uint64(31)
    idx = (
        np.uint64(half.initial_index)
        + br.astype(np.uint64) * np.uint64(half.step_index)
    ) % order
    conj = br >= (n // 2)
    idx_conj = (
        np.uint64(half.initial_index)
        + (br - n // 2).astype(np.uint64) * np.uint64(half.step_index)
    ) % order
    idx = np.where(conj, (order - idx_conj) % order, idx)
    return ccircle.apoints_at_indices(idx)


@lru_cache(maxsize=None)
def _twiddles(log_size: int):
    """Per-layer folding twiddles for the bit-reversed layout.

    layer 0 pairs (2k, 2k+1): conjugate points, twiddle = y of the even
    element; layer k>0 pairs 2^k apart: twiddle = x after (k-1) doublings.
    Returns list of uint32 arrays, layer k has 2^(log_size-1-k) entries
    indexed by the group's position.
    """
    x, y = domain_points_bit_reversed(log_size)
    n = 1 << log_size
    out = [y[0:n:2].copy()]
    cur_x = x[0:n:2].copy()
    for _ in range(1, log_size):
        t = cur_x[0 : len(cur_x) : 2].copy()
        out.append(t)
        sq = m31.mul(t, t)
        cur_x = m31.sub(m31.add(sq, sq), np.uint32(1))
    return out


@lru_cache(maxsize=None)
def _inv_twiddles(log_size: int):
    return [m31.inv(t) for t in _twiddles(log_size)]


def _native_fft():
    from ..utils import native

    return native if native.fft_available() else None


def interpolate(values):
    """Evaluations (..., 2^n) in bit-reversed domain order -> coefficients
    (..., 2^n) in the stwo FFT basis (natural index order)."""
    values = np.asarray(values, dtype=np.uint32)
    n = values.shape[-1]
    log_size = n.bit_length() - 1
    assert 1 << log_size == n
    itw = _inv_twiddles(log_size)
    nat = _native_fft()
    if nat is not None and values.size >= 1 << 18:
        return nat.m31_fft_interpolate(
            values, itw, int(m31.inv(np.uint32(1 << log_size)))
        )

    v = values
    for layer in range(log_size):
        step = 1 << layer
        shape = v.shape[:-1] + (n // (2 * step), 2, step)
        g = v.reshape(shape)
        a, b = g[..., 0, :], g[..., 1, :]
        t = itw[layer].reshape((n // (2 * step), 1))
        f0 = m31.add(a, b)
        f1 = m31.mul(m31.sub(a, b), t)
        v = np.stack([f0, f1], axis=-2).reshape(v.shape)
    # scale by 1/2^log_size; the layering already leaves coefficients in
    # natural basis-index order (empirically verified vs basis products)
    inv2n = m31.inv(np.uint32(1 << log_size))
    return m31.mul(v, inv2n)


def evaluate(coeffs):
    """Coefficients (..., 2^n) -> evaluations (..., 2^n) in bit-reversed
    domain order (inverse of `interpolate`)."""
    coeffs = np.asarray(coeffs, dtype=np.uint32)
    n = coeffs.shape[-1]
    log_size = n.bit_length() - 1
    assert 1 << log_size == n
    tw = _twiddles(log_size)
    nat = _native_fft()
    if nat is not None and coeffs.size >= 1 << 18:
        return nat.m31_fft_evaluate(coeffs, tw)

    v = coeffs
    for layer in reversed(range(log_size)):
        step = 1 << layer
        shape = v.shape[:-1] + (n // (2 * step), 2, step)
        g = v.reshape(shape)
        f0, f1 = g[..., 0, :], g[..., 1, :]
        t = tw[layer].reshape((n // (2 * step), 1))
        tf1 = m31.mul(f1, t)
        a = m31.add(f0, tf1)
        b = m31.sub(f0, tf1)
        v = np.stack([a, b], axis=-2).reshape(v.shape)
    return v


def extend(coeffs, target_log_size: int):
    """Zero-pad coefficients of log n to log `target_log_size` (the stwo
    basis is nested: basis(n) is a prefix of basis(m) for m > n)."""
    coeffs = np.asarray(coeffs, dtype=np.uint32)
    n = coeffs.shape[-1]
    target = 1 << target_log_size
    assert target >= n
    pad = np.zeros(coeffs.shape[:-1] + (target - n,), np.uint32)
    return np.concatenate([coeffs, pad], axis=-1)


def evaluate_lde(values, lde_log_size: int):
    """Evaluations on log n -> evaluations on the larger domain."""
    return evaluate(extend(interpolate(values), lde_log_size))


# -- traced twins (jax arrays in jit context; twiddles enter as numpy
#    constants and are lifted by the tracer) -------------------------------

def interpolate_traced(values):
    import jax.numpy as jnp

    n = values.shape[-1]
    log_size = n.bit_length() - 1
    itw = _inv_twiddles(log_size)
    v = values
    for layer in range(log_size):
        step = 1 << layer
        g = v.reshape(v.shape[:-1] + (n // (2 * step), 2, step))
        a, b = g[..., 0, :], g[..., 1, :]
        t = itw[layer].reshape((n // (2 * step), 1))
        v = jnp.stack(
            [m31.add(a, b), m31.mul(m31.sub(a, b), t)], axis=-2
        ).reshape(v.shape)
    return m31.mul(v, m31.inv(np.uint32(1 << log_size)))


def evaluate_traced(coeffs):
    import jax.numpy as jnp

    n = coeffs.shape[-1]
    log_size = n.bit_length() - 1
    tw = _twiddles(log_size)
    v = coeffs
    for layer in reversed(range(log_size)):
        step = 1 << layer
        g = v.reshape(v.shape[:-1] + (n // (2 * step), 2, step))
        f0, f1 = g[..., 0, :], g[..., 1, :]
        t = tw[layer].reshape((n // (2 * step), 1))
        tf1 = m31.mul(f1, t)
        v = jnp.stack([m31.add(f0, tf1), m31.sub(f0, tf1)], axis=-2).reshape(
            v.shape
        )
    return v


def extend_traced(coeffs, target_log_size: int):
    import jax.numpy as jnp

    n = coeffs.shape[-1]
    target = 1 << target_log_size
    assert target >= n
    if target == n:
        return coeffs
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, target - n)]
    return jnp.pad(coeffs, pad)


def eval_basis_at_point(log_size: int, px, py, q_ops):
    """All 2^log_size basis values at an extension-field point.

    q_ops: module with q_mul/q_one etc. (core.qm31 wrappers); px, py are
    QM31 scalars.  Returns list of QM31 (ordered by coefficient index).
    Used for OODS evaluation: f(p) = sum_j c_j * b_j(p)."""
    factors = [py, px]
    x = px
    for _ in range(log_size - 2):
        sq = q_ops.q_mul(x, x)
        x = q_ops.q_sub(q_ops.q_add(sq, sq), q_ops.q_one(x.a))
        factors.append(x)
    factors = factors[:log_size]

    vals = [q_ops.q_one(px.a)]
    for f in factors:
        vals = vals + [q_ops.q_mul(v, f) for v in vals]
    return vals


def eval_at_point(coeffs4, px, py):
    """Evaluate a QM31-coefficient poly (n, 4) at a QM31 point; returns a
    4-tuple.  Horner-free: basis product accumulation, O(n)."""
    from ..core import qm31 as q

    coeffs4 = np.asarray(coeffs4, dtype=np.uint32)
    n = coeffs4.shape[0]
    log_size = n.bit_length() - 1
    if n == 1:
        return tuple(int(v) for v in coeffs4[0])
    basis = eval_basis_at_point(log_size, px, py, q)
    acc = q.q_zero(px.a)
    for j in range(n):
        c = q.QM31(*(np.uint32(coeffs4[j, k]) for k in range(4)))
        acc = q.q_add(acc, q.q_mul(c, basis[j]))
    return tuple(int(np.asarray(v)) for v in acc)
