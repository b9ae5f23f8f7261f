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
