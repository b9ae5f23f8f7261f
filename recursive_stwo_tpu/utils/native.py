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


def _set_omp_threads():
    """Pin OpenMP to one thread unless overridden.

    Measured on this 2-vCPU host: a parallel-region wakeup costs ~8 ms
    (hypervisor scheduling of the second vCPU) and the second thread never
    wins even on 64k-permutation batches (16.4 ms vs 12.4 ms single).  The
    8 ms tax per native call was the dominant cost of host hint prep."""
    n = os.environ.get("RSTPU_OMP_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", n)
    try:
        ctypes.CDLL("libgomp.so.1").omp_set_num_threads(int(n))
    except Exception:
        pass


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            _set_omp_threads()
            if not os.path.exists(_LIB) or os.path.getmtime(
                _LIB
            ) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-mno-sha", "-fopenmp",
                        "-shared", "-fPIC", "-o", _LIB, _SRC,
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
            lib.poseidon2_leaf_level.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.poseidon2_node_level.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
            ]
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


# ---------------------------------------------------------------------------
# M31 circle-FFT butterflies (native/m31fft.cpp) — host path for huge LDEs
# ---------------------------------------------------------------------------

_FFT_SRC = os.path.join(os.path.dirname(_SRC), "m31fft.cpp")
_FFT_LIB = os.path.join(os.path.dirname(_SRC), "libm31fft.so")
_fft_lib = None
_fft_tried = False
_u64p = ctypes.POINTER(ctypes.c_uint64)


def _load_fft():
    global _fft_lib, _fft_tried
    with _lock:
        if _fft_tried:
            return _fft_lib
        _fft_tried = True
        try:
            if not os.path.exists(_FFT_LIB) or os.path.getmtime(
                _FFT_LIB
            ) < os.path.getmtime(_FFT_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-mno-sha", "-fopenmp",
                        "-shared", "-fPIC", "-o", _FFT_LIB, _FFT_SRC,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_FFT_LIB)
            lib.m31_fft_evaluate.argtypes = [
                _u32p, ctypes.c_uint64, ctypes.c_uint64, _u32p, _u64p,
                ctypes.c_uint32,
            ]
            lib.m31_fft_interpolate.argtypes = [
                _u32p, ctypes.c_uint64, ctypes.c_uint64, _u32p, _u64p,
                ctypes.c_uint32, ctypes.c_uint32,
            ]
            _fft_lib = lib
        except Exception:
            _fft_lib = None
        return _fft_lib


def fft_available() -> bool:
    return _load_fft() is not None


def _binop(fn_name: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load_fft()
    assert lib is not None
    fn = getattr(lib, fn_name)
    if not getattr(lib, "_" + fn_name + "_sig", False):
        fn.argtypes = [_u32p, _u32p, ctypes.c_uint64, _u32p]
        setattr(lib, "_" + fn_name + "_sig", True)
    fa = np.ascontiguousarray(a, np.uint32)
    fb = np.ascontiguousarray(b, np.uint32)
    out = np.empty(fa.shape, np.uint32)
    fn(
        fa.ctypes.data_as(_u32p), fb.ctypes.data_as(_u32p),
        fa.size, out.ctypes.data_as(_u32p),
    )
    return out


def m31_mul_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise (a*b) mod P for same-shape uint32 arrays."""
    return _binop("m31_mul_batch", a, b)


def m31_add_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _binop("m31_add_batch", a, b)


def m31_sub_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _binop("m31_sub_batch", a, b)


def m31_inv_batch(a: np.ndarray) -> np.ndarray:
    """Elementwise a^(p-2) mod P (bit-exact with core/m31.inv numpy)."""
    lib = _load_fft()
    assert lib is not None
    if not hasattr(lib, "_inv_sig"):
        lib.m31_inv_batch.argtypes = [_u32p, ctypes.c_uint64, _u32p]
        lib._inv_sig = True
    flat = np.ascontiguousarray(a, np.uint32)
    out = np.empty(flat.shape, np.uint32)
    lib.m31_inv_batch(
        flat.ctypes.data_as(_u32p), flat.size, out.ctypes.data_as(_u32p)
    )
    return out


def _twiddle_blob(tw_list):
    off = np.zeros(len(tw_list), np.uint64)
    pos = 0
    for i, t in enumerate(tw_list):
        off[i] = pos
        pos += len(t)
    blob = np.concatenate([np.asarray(t, np.uint32) for t in tw_list])
    return blob, off


def m31_fft_evaluate(coeffs: np.ndarray, tw_list) -> np.ndarray:
    """(rows, n) coefficients -> evaluations; bit-exact with
    circle_fft.evaluate."""
    lib = _load_fft()
    assert lib is not None
    v = np.ascontiguousarray(coeffs, np.uint32).copy()
    v2 = v.reshape(-1, v.shape[-1])
    blob, off = _twiddle_blob(tw_list)
    lib.m31_fft_evaluate(
        v2.ctypes.data_as(_u32p), v2.shape[0], v2.shape[1],
        blob.ctypes.data_as(_u32p), off.ctypes.data_as(_u64p),
        len(tw_list),
    )
    return v


def m31_fft_interpolate(values: np.ndarray, itw_list, inv2n: int) -> np.ndarray:
    lib = _load_fft()
    assert lib is not None
    v = np.ascontiguousarray(values, np.uint32).copy()
    v2 = v.reshape(-1, v.shape[-1])
    blob, off = _twiddle_blob(itw_list)
    lib.m31_fft_interpolate(
        v2.ctypes.data_as(_u32p), v2.shape[0], v2.shape[1],
        blob.ctypes.data_as(_u32p), off.ctypes.data_as(_u64p),
        len(itw_list), np.uint32(inv2n),
    )
    return v


def points_at_indices(idx: np.ndarray, gx: np.ndarray, gy: np.ndarray):
    """Vectorized circle point_at_index (native); idx uint64, gx/gy the 31
    generator-power coordinates."""
    lib = _load_fft()
    assert lib is not None
    if not hasattr(lib, "_points_sig"):
        lib.m31_points_at_indices.argtypes = [
            _u64p, ctypes.c_uint64, _u32p, _u32p, ctypes.c_uint32,
            _u32p, _u32p,
        ]
        lib._points_sig = True
    idx = np.ascontiguousarray(idx, np.uint64)
    gx = np.ascontiguousarray(gx, np.uint32)
    gy = np.ascontiguousarray(gy, np.uint32)
    out_x = np.empty(idx.shape, np.uint32)
    out_y = np.empty(idx.shape, np.uint32)
    lib.m31_points_at_indices(
        idx.ctypes.data_as(_u64p), idx.size,
        gx.ctypes.data_as(_u32p), gy.ctypes.data_as(_u32p), len(gx),
        out_x.ctypes.data_as(_u32p), out_y.ctypes.data_as(_u32p),
    )
    return out_x, out_y


def poseidon_leaf_level(columns: np.ndarray) -> np.ndarray:
    """(n_cols, N) -> (N, 8) Poseidon Merkle leaf digests (AVX-512)."""
    lib = _load()
    assert lib is not None
    cols = np.ascontiguousarray(columns, np.uint32)
    n_cols, N = cols.shape
    out = np.empty((N, 8), np.uint32)
    lib.poseidon2_leaf_level(
        cols.ctypes.data_as(_u32p), n_cols, N, out.ctypes.data_as(_u32p)
    )
    return out


def poseidon_node_level(
    children: np.ndarray, columns: np.ndarray | None
) -> np.ndarray:
    """children (2N, 8) + optional (n_cols, N) columns -> (N, 8)."""
    lib = _load()
    assert lib is not None
    ch = np.ascontiguousarray(children, np.uint32)
    N = ch.shape[0] // 2
    out = np.empty((N, 8), np.uint32)
    if columns is not None and columns.shape[0]:
        cols = np.ascontiguousarray(columns, np.uint32)
        lib.poseidon2_node_level(
            ch.ctypes.data_as(_u32p), cols.ctypes.data_as(_u32p),
            cols.shape[0], N, out.ctypes.data_as(_u32p),
        )
    else:
        lib.poseidon2_node_level(
            ch.ctypes.data_as(_u32p), None, 0, N, out.ctypes.data_as(_u32p)
        )
    return out
