"""Pallas TPU kernel for the Poseidon2-16 permutation over M31.

Layout: the 16 state lanes live in separate VMEM rows ("lane-major",
(16, R, 128)), so every field op — including the MDS16 external matrix and
the internal diagonal — is a pure elementwise VPU op on (R_blk, 128) tiles
held in vector registers across all 22 unrolled rounds.  No cross-lane
shuffles, no HBM round-trips between rounds; round constants are baked in
as scalars.

M31 arithmetic matches core/m31.py bit-for-bit (16-bit limb multiply, all
intermediates < 2**32).  Structure mirrors core/poseidon2.py
(reference scalar spec: /root/reference/primitives/poseidon31/src/
implementation.rs:108-149).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..core.poseidon2 import (
    FIRST_FOUR_ROUND_RC,
    LAST_FOUR_ROUNDS_RC,
    MAT_DIAG16_M_1,
    PARTIAL_ROUNDS_RC,
)

P = 0x7FFFFFFF
# rows of 128 lanes per kernel instance (16*32*128*4B = 256 KiB/buf at 32);
# overridable for block-size sweeps
import os as _os

def _r_blk_override() -> int:
    v = int(_os.environ.get("RSTPU_PALLAS_RBLK", "32"))
    if v <= 0 or v % 8:
        raise ValueError(
            f"RSTPU_PALLAS_RBLK must be a positive multiple of 8, got {v}"
        )
    return v


R_BLK = _r_blk_override()


def _kernel(in_ref, out_ref):
    import jax.numpy as jnp

    u32 = jnp.uint32

    def add(a, b):
        # select-based conditional reduce: 1 add + 1 cmp + 1 select, no
        # u32 multiply (the mask-multiply form costs a VPU int-mul per add
        # — 1,360 of them per permutation)
        s = a + b
        return jnp.where(s >= u32(P), s - u32(P), s)

    def dbl(a):
        return add(a, a)

    def mul(a, b):
        # staged partial reductions: every intermediate stays < 2**32
        # (bit-exact mirror of core/m31.py::mul)
        a0 = a & u32(0xFFFF)
        a1 = a >> u32(16)
        b0 = b & u32(0xFFFF)
        b1 = b >> u32(16)
        m0 = a0 * b0
        m1 = a0 * b1 + a1 * b0
        m3 = a1 * b1
        t0 = (m0 & u32(P)) + (m0 >> u32(31))
        t1 = ((m1 & u32(0x7FFF)) << u32(16)) + (m1 >> u32(15))
        t1 = (t1 & u32(P)) + (t1 >> u32(31))
        r = t0 + t1
        r = (r & u32(P)) + (r >> u32(31))
        r = r + m3 + m3
        r = (r & u32(P)) + (r >> u32(31))
        return jnp.where(r >= u32(P), r - u32(P), r)

    def mul_pow2(a, k):
        # x * 2^k mod p == 31-bit rotation (canonical in, canonical out)
        return ((a << u32(k)) & u32(P)) + (a >> u32(31 - k))

    def sq(a):
        # squaring needs 3 16-bit partial products (a0*a0, a0*a1, a1*a1)
        # instead of mul's 4 — pow5 is 142 invocations per permutation, so
        # the saved multiplies are the kernel's hottest op.  Reduction
        # chain identical to mul (m1 = 2*a0*a1 < 2**32: a0 < 2**16,
        # a1 < 2**15 for canonical 31-bit inputs).
        a0 = a & u32(0xFFFF)
        a1 = a >> u32(16)
        m0 = a0 * a0
        m1 = (a0 * a1) << u32(1)
        m3 = a1 * a1
        t0 = (m0 & u32(P)) + (m0 >> u32(31))
        t1 = ((m1 & u32(0x7FFF)) << u32(16)) + (m1 >> u32(15))
        t1 = (t1 & u32(P)) + (t1 >> u32(31))
        r = t0 + t1
        r = (r & u32(P)) + (r >> u32(31))
        r = r + m3 + m3
        r = (r & u32(P)) + (r >> u32(31))
        return jnp.where(r >= u32(P), r - u32(P), r)

    def pow5(a):
        return mul(sq(sq(a)), a)

    def mds16(s):
        t = [None] * 16
        for g in range(4):
            x0, x1, x2, x3 = s[4 * g : 4 * g + 4]
            t0 = add(x0, x1)
            t1 = add(x2, x3)
            t2 = add(dbl(x1), t1)
            t3 = add(dbl(x3), t0)
            t4 = add(dbl(dbl(t1)), t3)
            t5 = add(dbl(dbl(t0)), t2)
            t[4 * g + 0] = add(t3, t5)
            t[4 * g + 1] = t5
            t[4 * g + 2] = add(t2, t4)
            t[4 * g + 3] = t4
        out = []
        for pos in range(4):
            ssum = add(add(t[pos], t[4 + pos]), add(t[8 + pos], t[12 + pos]))
            out.append(ssum)
        return [add(t[i], out[i % 4]) for i in range(16)]

    s = [in_ref[i] for i in range(16)]
    s = mds16(s)

    for r in range(4):
        rc = FIRST_FOUR_ROUND_RC[r]
        s = mds16([pow5(add(s[i], jnp.full(s[i].shape, np.uint32(rc[i]),
                                           jnp.uint32))) for i in range(16)])
    # internal diagonal = [3, 4, 8, ..., 2**16]: lane 0 is x+2x, lanes 1..15
    # are 31-bit rotations (x * 2^(i+1) mod p)
    for r in range(14):
        rc = int(PARTIAL_ROUNDS_RC[r])
        s0 = pow5(add(s[0], jnp.full(s[0].shape, np.uint32(rc), jnp.uint32)))
        s = [s0] + s[1:]
        total = s[0]
        for i in range(1, 16):
            total = add(total, s[i])
        s = [add(total, add(dbl(s[0]), s[0]))] + [
            add(total, mul_pow2(s[i], i + 1)) for i in range(1, 16)
        ]
    for r in range(4):
        rc = LAST_FOUR_ROUNDS_RC[r]
        s = mds16([pow5(add(s[i], jnp.full(s[i].shape, np.uint32(rc[i]),
                                           jnp.uint32))) for i in range(16)])

    for i in range(16):
        out_ref[i] = s[i]


@lru_cache(maxsize=None)
def _build(n_rows: int, r_blk: int, interpret: bool = False):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows // r_blk,)
    spec = pl.BlockSpec((16, r_blk, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((16, n_rows, 128), jax.numpy.uint32),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )
    return fn


def permute_lane_major(state_t):
    """(16, R, 128) uint32 -> (16, R, 128), R a multiple of 8."""
    n_rows = state_t.shape[1]
    r_blk = R_BLK if n_rows % R_BLK == 0 else 8
    return _build(n_rows, r_blk)(state_t)


def _kernel4(in_ref, out_ref):
    # (1, 16, r_blk, 128) block: squeeze the lane dim and reuse _kernel's
    # body via the same ref indexing convention
    class _View:
        def __init__(self, ref):
            self._ref = ref

        def __getitem__(self, i):
            return self._ref[0, i]

        def __setitem__(self, i, v):
            self._ref[0, i] = v

    _kernel(_View(in_ref), _View(out_ref))


@lru_cache(maxsize=None)
def _build4(n_lanes: int, n_rows: int, r_blk: int, interpret: bool = False):
    """Pallas permute over (L, 16, R, 128) lane-major states: grid
    (L, R//r_blk), so wiring code can keep a leading walk-lane axis
    without any transpose before the kernel."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_lanes, n_rows // r_blk)
    spec = pl.BlockSpec((1, 16, r_blk, 128), lambda l, i: (l, 0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel4,
        out_shape=jax.ShapeDtypeStruct(
            (n_lanes, 16, n_rows, 128), jax.numpy.uint32
        ),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )


def permute_state4(state):
    """(L, 16, R, 128) uint32 -> same shape; R a multiple of 8."""
    L, _, R, _ = state.shape
    r_blk = R_BLK if R % R_BLK == 0 else 8
    return _build4(L, R, r_blk)(state)


def permute(state):
    """Drop-in Poseidon2-16 permute for (..., 16) jax uint32 arrays."""
    import jax.numpy as jnp

    shape = state.shape
    flat = state.reshape(-1, 16)
    B = flat.shape[0]
    chunk = 128 * 8
    Bp = -(-B // chunk) * chunk
    if Bp != B:
        flat = jnp.concatenate(
            [flat, jnp.zeros((Bp - B, 16), jnp.uint32)], axis=0
        )
    t = flat.T.reshape(16, Bp // 128, 128)
    out = permute_lane_major(t)
    out = out.reshape(16, Bp).T
    return out[:B].reshape(shape)


@lru_cache(maxsize=1)
def available() -> bool:
    """True when the computation will be lowered for an accelerator.

    Respects an active `jax.default_device` context (pallas_call has no CPU
    lowering, so tracing must fall back to the scan path when the program
    is being staged for the host backend)."""
    import os

    if os.environ.get("RSTPU_NO_PALLAS"):
        return False
    try:
        import jax

        default = jax.config.jax_default_device
        if default is not None:
            return default.platform not in ("cpu",)
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False
