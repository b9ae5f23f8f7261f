"""ctypes loader for the native host kernels (native/poseidon31.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back silently to the pure-numpy implementations when no compiler is
available.  The device (TPU) path never goes through here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "poseidon31.cpp"
)
_LIB = os.path.join(os.path.dirname(_SRC), "libposeidon31.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(
                _LIB
            ) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-o", _LIB, _SRC,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.poseidon2_permute_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_uint64,
            ]
            lib.poseidon2_digest_chain.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.poseidon2_grind.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_uint32,
                ctypes.c_uint64,
            ]
            lib.poseidon2_grind.restype = ctypes.c_uint64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def permute_batch(states: np.ndarray) -> np.ndarray:
    """In-place-free permutation of (..., 16) uint32 states via C++."""
    lib = _load()
    assert lib is not None
    out = np.ascontiguousarray(states, dtype=np.uint32).copy()
    flat = out.reshape(-1, 16)
    lib.poseidon2_permute_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        flat.shape[0],
    )
    return out


def grind(digest: np.ndarray, bits: int, start: int = 0) -> int:
    lib = _load()
    assert lib is not None
    d = np.ascontiguousarray(digest, dtype=np.uint32)
    return int(
        lib.poseidon2_grind(
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), bits, start
        )
    )


# ---------------------------------------------------------------------------
# SHA-256 kernels (native/sha256.cpp): AVX-512 16-way vertical SIMD with a
# scalar fallback.  SHA-NI is deliberately disabled (-mno-sha): this image's
# hypervisor traps those instructions ~20x slower than plain scalar code.
# ---------------------------------------------------------------------------

_SHA_SRC = os.path.join(os.path.dirname(_SRC), "sha256.cpp")
_SHA_LIB = os.path.join(os.path.dirname(_SRC), "libsha256.so")
_sha_lib = None
_sha_tried = False
_u32p = ctypes.POINTER(ctypes.c_uint32)


def _load_sha():
    global _sha_lib, _sha_tried
    with _lock:
        if _sha_tried:
            return _sha_lib
        _sha_tried = True
        try:
            if not os.path.exists(_SHA_LIB) or os.path.getmtime(
                _SHA_LIB
            ) < os.path.getmtime(_SHA_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-mno-sha", "-fopenmp",
                        "-shared", "-fPIC", "-o", _SHA_LIB, _SHA_SRC,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SHA_LIB)
            lib.sha256_words_batch.argtypes = [
                _u32p, ctypes.c_uint64, ctypes.c_uint64, _u32p
            ]
            lib.sha256_leaf_level.argtypes = [
                _u32p, ctypes.c_uint64, ctypes.c_uint64, _u32p
            ]
            lib.sha256_node_level.argtypes = [
                _u32p, _u32p, ctypes.c_uint64, ctypes.c_uint64, _u32p
            ]
            lib.sha256_grind.argtypes = [_u32p, ctypes.c_uint32, ctypes.c_uint64]
            lib.sha256_grind.restype = ctypes.c_uint64
            _sha_lib = lib
        except Exception:
            _sha_lib = None
        return _sha_lib


def sha_available() -> bool:
    return _load_sha() is not None


def sha256_words_batch(words: np.ndarray) -> np.ndarray:
    """(N, K) uint32 BE words -> (N, 8) digests."""
    lib = _load_sha()
    assert lib is not None
    w = np.ascontiguousarray(words, np.uint32)
    n, k = w.shape
    out = np.empty((n, 8), np.uint32)
    lib.sha256_words_batch(
        w.ctypes.data_as(_u32p), n, k, out.ctypes.data_as(_u32p)
    )
    return out


def sha256_leaf_level(columns: np.ndarray) -> np.ndarray:
    """(n_cols, N) column-major leaves -> (N, 8) digests."""
    lib = _load_sha()
    assert lib is not None
    cols = np.ascontiguousarray(columns, np.uint32)
    n_cols, N = cols.shape
    out = np.empty((N, 8), np.uint32)
    lib.sha256_leaf_level(
        cols.ctypes.data_as(_u32p), n_cols, N, out.ctypes.data_as(_u32p)
    )
    return out


def sha256_node_level(
    children: np.ndarray, columns: np.ndarray | None
) -> np.ndarray:
    """children (2N, 8) + optional (n_cols, N) columns -> (N, 8)."""
    lib = _load_sha()
    assert lib is not None
    ch = np.ascontiguousarray(children, np.uint32)
    N = ch.shape[0] // 2
    out = np.empty((N, 8), np.uint32)
    if columns is not None and columns.shape[0]:
        cols = np.ascontiguousarray(columns, np.uint32)
        lib.sha256_node_level(
            ch.ctypes.data_as(_u32p), cols.ctypes.data_as(_u32p),
            cols.shape[0], N, out.ctypes.data_as(_u32p),
        )
    else:
        lib.sha256_node_level(
            ch.ctypes.data_as(_u32p), None, 0, N, out.ctypes.data_as(_u32p)
        )
    return out


def sha256_grind(digest_words: np.ndarray, bits: int, start: int = 0) -> int:
    lib = _load_sha()
    assert lib is not None
    d = np.ascontiguousarray(digest_words, np.uint32)
    return int(lib.sha256_grind(d.ctypes.data_as(_u32p), bits, start))
