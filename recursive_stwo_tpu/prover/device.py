"""Device (TPU) execution path for the prover's hot kernels.

The host prover (`prove.py`) is a numpy program; on a 2-core host the LDE
FFTs and Merkle commits of a 2^21-point trace take minutes.  This module
provides bit-identical device implementations of exactly those kernels —
circle FFT evaluate/interpolate, Merkle level hashing (via the Pallas
Poseidon2-16 kernel for large levels), and OODS column sampling — with a
numpy-in / numpy-out contract so `prove()` is backend-agnostic.

Dispatch: `enabled()` is controlled by RSTPU_DEVICE_PROVER ("1" force on,
"0" force off, unset = auto: on when the default jax backend is an
accelerator).  All functions fall back to their `circle_fft`/`commit`
numpy twins when disabled, so tests exercise both paths.

Semantics mirror (and are tested bit-exact against):
  * circle FFT        — circle_fft.evaluate/interpolate (stwo basis,
                        reference layout per
                        /root/reference primitives/circle usage)
  * Merkle hashing    — commit._hash_leaf_level/_hash_node_level
                        (stwo Poseidon31MerkleHasher semantics,
                        /root/reference/primitives/merkle/src/lib.rs:9-181)
  * column sampling   — prove._basis_at_point/_sample_columns
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, List

import numpy as np

from ..core import m31
from . import circle_fft

P = 0x7FFFFFFF

# below this level size the Merkle tail runs on host (native C++ kernel):
# tiny batches underutilize the device and eager small-dispatch overhead
# dominates.
_HOST_TAIL_STATES = 1 << 11


def enabled() -> bool:
    flag = os.environ.get("RSTPU_DEVICE_PROVER", "")
    if flag == "1":
        return True
    if flag == "0":
        return False
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - jax always present in CI
        return False


@lru_cache(maxsize=1)
def _jnp():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the FFT/Merkle jits specialize per
    # (log_size, n_cols) and would otherwise recompile every process
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
            ),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
    except Exception:
        pass
    return jnp


# --------------------------------------------------------------------------
# circle FFT
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _evaluate_jit(log_size: int):
    import jax

    jnp = _jnp()
    tws = tuple(jnp.asarray(t) for t in circle_fft._twiddles(log_size))
    n = 1 << log_size

    @jax.jit
    def run(coeffs):
        v = coeffs
        for layer in reversed(range(log_size)):
            step = 1 << layer
            g = v.reshape(v.shape[:-1] + (n // (2 * step), 2, step))
            f0, f1 = g[..., 0, :], g[..., 1, :]
            t = tws[layer].reshape((n // (2 * step), 1))
            tf1 = m31.mul(f1, t)
            v = jnp.stack(
                [m31.add(f0, tf1), m31.sub(f0, tf1)], axis=-2
            ).reshape(v.shape)
        return v

    return run


@lru_cache(maxsize=None)
def _interpolate_jit(log_size: int):
    import jax

    jnp = _jnp()
    itws = tuple(jnp.asarray(t) for t in circle_fft._inv_twiddles(log_size))
    n = 1 << log_size
    inv2n = np.uint32(m31.inv(np.uint32(n)))

    @jax.jit
    def run(values):
        v = values
        for layer in range(log_size):
            step = 1 << layer
            g = v.reshape(v.shape[:-1] + (n // (2 * step), 2, step))
            a, b = g[..., 0, :], g[..., 1, :]
            t = itws[layer].reshape((n // (2 * step), 1))
            v = jnp.stack(
                [m31.add(a, b), m31.mul(m31.sub(a, b), t)], axis=-2
            ).reshape(v.shape)
        return m31.mul(v, inv2n)

    return run


def evaluate(coeffs: np.ndarray) -> np.ndarray:
    """Device twin of circle_fft.evaluate (numpy in/out)."""
    coeffs = np.asarray(coeffs, np.uint32)
    log_size = coeffs.shape[-1].bit_length() - 1
    return np.asarray(_evaluate_jit(log_size)(coeffs))


def interpolate(values: np.ndarray) -> np.ndarray:
    """Device twin of circle_fft.interpolate (numpy in/out)."""
    values = np.asarray(values, np.uint32)
    log_size = values.shape[-1].bit_length() - 1
    return np.asarray(_interpolate_jit(log_size)(values))


def evaluate_lde(values: np.ndarray, lde_log_size: int) -> np.ndarray:
    return evaluate(circle_fft.extend(interpolate(values), lde_log_size))


# --------------------------------------------------------------------------
# Merkle level hashing
# --------------------------------------------------------------------------


def _hash_columns_into(digest, columns, jnp):
    """Absorb (n_cols, N) M31 columns into (N, 8) running digests."""
    from ..core import poseidon2

    n_cols = columns.shape[0]
    for ci in range(0, n_cols, 8):
        chunk = columns[ci : ci + 8].T  # (N, <=8)
        if chunk.shape[1] < 8:
            chunk = jnp.pad(chunk, ((0, 0), (0, 8 - chunk.shape[1])))
        digest = poseidon2.permute(
            jnp.concatenate([chunk, digest], axis=1)
        )[:, 8:]
    return digest


def merkle_levels(columns_by_log: Dict[int, np.ndarray]) -> List[np.ndarray]:
    """All tree levels, leaf level first (numpy out).

    Level hashing is identical to commit._hash_leaf_level /
    _hash_node_level; large levels run on device (Pallas Poseidon), the
    small top-of-tree tail runs through the host kernels.
    """
    import jax

    from ..core import poseidon2
    from . import commit

    jnp = _jnp()
    max_log = max(columns_by_log)
    levels: List = []

    cols_dev = {
        L: jnp.asarray(c)
        for L, c in columns_by_log.items()
        if (1 << L) >= _HOST_TAIL_STATES
    }

    leaf_cols = columns_by_log[max_log]
    on_device = (1 << max_log) >= _HOST_TAIL_STATES
    if on_device:
        cols = cols_dev[max_log]
        digest = _hash_columns_into(
            jnp.zeros((cols.shape[1], 8), jnp.uint32), cols, jnp
        )
        h = poseidon2.permute(
            jnp.concatenate([jnp.zeros_like(digest), digest], axis=1)
        )[:, :8]
    else:
        h = commit._hash_leaf_level(np.asarray(leaf_cols, np.uint32))
    levels.append(h)

    for L in range(max_log - 1, -1, -1):
        n = 1 << L
        if on_device and n < _HOST_TAIL_STATES:
            # switch the remaining tail to the host path
            for i, lv in enumerate(levels):
                levels[i] = np.asarray(lv)
            h = levels[-1]
            on_device = False
        cols = columns_by_log.get(L)
        if on_device:
            pairs = h.reshape(n, 16)
            hh = poseidon2.permute(pairs)[:, :8]
            if cols is not None and cols.shape[0]:
                digest = _hash_columns_into(
                    jnp.zeros((n, 8), jnp.uint32), cols_dev[L], jnp
                )
                hh = poseidon2.permute(
                    jnp.concatenate([hh, digest], axis=1)
                )[:, :8]
            h = hh
        else:
            h = commit._hash_node_level(
                np.asarray(h),
                None if cols is None else np.asarray(cols, np.uint32),
            )
        levels.append(h)

    return [np.asarray(lv) for lv in jax.device_get(levels)]


# --------------------------------------------------------------------------
# OODS column sampling
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _sample_jit(log_size: int):
    """(C, 2^log_size) M31 coeffs x (log_size, 4) QM31 factors -> (C, 4)."""
    import jax

    from ..core import qm31 as q

    jnp = _jnp()
    n = 1 << log_size

    @jax.jit
    def run(coeffs, factors):
        # basis by repeated doubling: vals_{k+1} = [vals_k, vals_k * f_k]
        vals = q.QM31(
            jnp.ones(1, jnp.uint32),
            *(jnp.zeros(1, jnp.uint32) for _ in range(3)),
        )
        for k in range(log_size):
            f = q.QM31(*(factors[k, i] for i in range(4)))
            scaled = q.q_mul(vals, f)
            vals = q.QM31(
                *(
                    jnp.concatenate([a, b])
                    for a, b in zip(vals, scaled)
                )
            )
        out = []
        for limb in vals:  # (n,) per QM31 limb
            prod = m31.mul(coeffs, limb[None, :])  # (C, n)
            while prod.shape[-1] > 1:
                half = prod.shape[-1] // 2
                prod = m31.add(prod[..., :half], prod[..., half:])
            out.append(prod[..., 0])
        return jnp.stack(out, axis=-1)  # (C, 4)

    return run


def sample_columns(coeffs: np.ndarray, factors4: np.ndarray) -> np.ndarray:
    """Device twin of prove._sample_columns(coeffs, basis(factors))."""
    coeffs = np.asarray(coeffs, np.uint32)
    log_size = coeffs.shape[-1].bit_length() - 1
    if coeffs.shape[-1] == 1:
        # degenerate constant poly: sample = coeff itself in limb 0
        out = np.zeros((coeffs.shape[0], 4), np.uint32)
        out[:, 0] = coeffs[:, 0]
        return out
    return np.asarray(
        _sample_jit(log_size)(coeffs, np.asarray(factors4, np.uint32))
    )
