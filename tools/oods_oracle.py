"""OODS-only oracle: test a candidate oods_t against the structural part of
the poseidon preprocessed columns (IS_FIRST / IS_LAST), scanning the unknown
invocation count I.

sample(col) = <interpolate(to_domain_order(col)), basis(pt)>
            = <to_domain_order(col), W>          W = evaluate(basis)/2^m
(the evaluate butterflies are exactly interpolate's transpose).

Usage as a library: find_I(log_size, t4, sampled_is_first, sampled_is_last)
returns the matching I or None — a 2^-248 joint filter on oods_t.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recursive_stwo_tpu.core import m31
from recursive_stwo_tpu.core.qm31 import QM31
from recursive_stwo_tpu.prover import air, circle_fft
from recursive_stwo_tpu.verifier import points as points_mod

P = 2147483647
ROWS_PER_INV = 6


def _q(t):
    return QM31(*(np.array([x], np.uint32) for x in t))


def basis_array(log_size: int, pt: tuple) -> np.ndarray:
    """(n, 4) uint32 basis values at QM31 point pt=(px4, py4), vectorized."""
    from recursive_stwo_tpu.core import qm31 as q

    px, py = _q(pt[0]), _q(pt[1])
    factors = [py, px]
    x = px
    for _ in range(max(0, log_size - 2)):
        sq = q.q_mul(x, x)
        one = q.q_one(x.a)
        x = q.q_sub(q.q_add(sq, sq), one)
        factors.append(x)
    factors = factors[:log_size]

    vals = np.zeros((1, 4), np.uint32)
    vals[0, 0] = 1
    for f in factors:
        cur = QM31(vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3])
        fb = QM31(*(np.broadcast_to(np.asarray(v), cur.a.shape) for v in f))
        prod = q.q_mul(cur, fb)
        new = np.stack([prod.a, prod.b, prod.c, prod.d], axis=1).astype(np.uint32)
        vals = np.concatenate([vals, new], axis=0)
    return vals  # (2^log_size, 4)


def _interpolate_transpose(x: np.ndarray) -> np.ndarray:
    """Apply interpolate^T: evaluate-shaped butterflies with the INVERSE
    twiddles (interpolate's own scalars), plus the 1/2^m scaling."""
    x = np.asarray(x, np.uint32)
    n = x.shape[-1]
    log_size = n.bit_length() - 1
    itw = circle_fft._inv_twiddles(log_size)
    v = m31.mul(x, m31.inv(np.uint32(n)))
    for layer in reversed(range(log_size)):
        step = 1 << layer
        shape = v.shape[:-1] + (n // (2 * step), 2, step)
        g = v.reshape(shape)
        f0, f1 = g[..., 0, :], g[..., 1, :]
        t = itw[layer].reshape((n // (2 * step), 1))
        tf1 = m31.mul(f1, t)
        a = m31.add(f0, tf1)
        b = m31.sub(f0, tf1)
        v = np.stack([a, b], axis=-2).reshape(v.shape)
    return v


def trace_order_weights(log_size: int, pt: tuple) -> np.ndarray:
    """(4, n) Lagrange weights in TRACE (coset) row order."""
    b = basis_array(log_size, pt)  # (n, 4)
    W = _interpolate_transpose(b.T.copy())  # (4, n) bit-reversed order
    return np.stack([air.from_domain_order(W[k]) for k in range(4)])


def oods_point(t4):
    oq = points_mod.oods_point_from_t(_q(t4))
    (px, py) = oq
    return (
        tuple(int(np.asarray(v)[0]) for v in px),
        tuple(int(np.asarray(v)[0]) for v in py),
    )


def find_I(log_size: int, t4, sampled_is_first, sampled_is_last):
    """Scan I; return list of matching I (usually empty or singleton)."""
    pt = oods_point(t4)
    Wt = trace_order_weights(log_size, pt).astype(np.uint64)  # (4, n)
    R = 1 << log_size
    n_max = R // ROWS_PER_INV

    # prefix sums of Wt over rows 6r (IS_FIRST real rows) / 6r+5 (IS_LAST)
    w_first = Wt[:, 0 : ROWS_PER_INV * n_max : ROWS_PER_INV]
    w_last = Wt[:, 5 : ROWS_PER_INV * n_max : ROWS_PER_INV]
    c_first = np.cumsum(w_first, axis=1) % P  # (4, n_max) sum r<I -> [:, I-1]
    c_last = np.cumsum(w_last, axis=1) % P
    # suffix sums over all rows >= j for j = 6I
    rev = np.cumsum(Wt[:, ::-1].astype(np.uint64), axis=1)[:, ::-1] % P
    suffix_at_6I = np.zeros((4, n_max + 1), np.uint64)
    for I in range(1, n_max + 1):
        if ROWS_PER_INV * I < R:
            suffix_at_6I[:, I] = rev[:, ROWS_PER_INV * I]

    Is = np.arange(1, n_max + 1)
    sf = (c_first[:, Is - 1] + suffix_at_6I[:, Is]) % P  # (4, n_max)
    sl = (c_last[:, Is - 1] + suffix_at_6I[:, Is]) % P

    tf = np.asarray(sampled_is_first, np.uint64)[:, None]
    tl = np.asarray(sampled_is_last, np.uint64)[:, None]
    hit = np.all(sf == tf, axis=0) & np.all(sl == tl, axis=0)
    return [int(i) for i in Is[np.nonzero(hit)[0]]]


def _selftest():
    """Validate weights + scan on recursive_proof_16_15 (known oods)."""
    from recursive_stwo_tpu.models.flagship import load_fixture
    from recursive_stwo_tpu.verifier import transcript
    from recursive_stwo_tpu.verifier.arrays import from_proofs

    proof, spec = load_fixture("recursive_proof_16_15")
    pa = from_proofs(spec, [proof])
    fs = transcript.run_transcript(spec, pa)
    t4 = tuple(int(np.asarray(v)[0]) for v in fs.oods_t)

    # weights correctness on random data
    rng = np.random.default_rng(0)
    v = rng.integers(0, P, size=1 << 10, dtype=np.uint32)
    pt = oods_point(t4)
    b = basis_array(10, pt)
    coeffs = circle_fft.interpolate(v)
    ref = np.zeros(4, np.uint64)
    for k in range(4):
        ref[k] = int(np.sum(m31.mul(coeffs, b[:, k]).astype(np.uint64)) % P)
    W = _interpolate_transpose(b.T.copy())
    got = np.array([int(np.sum(m31.mul(v, W[k]).astype(np.uint64)) % P)
                    for k in range(4)], np.uint64)
    assert np.array_equal(ref, got), (ref, got)
    print("weight identity ok")

    lq = proof.log_size_poseidon
    sv = proof.stark_proof.sampled_values
    is_first = sv[0][10][0]  # first poseidon preprocessed column sample
    is_last = sv[0][11][0]
    hits = find_I(lq, t4, is_first, is_last)
    print("recursive_proof_16_15: I candidates =", hits)


if __name__ == "__main__":
    _selftest()
