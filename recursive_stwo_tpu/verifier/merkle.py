"""Batched Merkle path verification (Poseidon31 hasher) for the device.

Walks are *segmented scans*: the few levels that absorb column openings are
unrolled, and the contiguous column-free stretches run as `lax.scan` over
stacked sibling hashes — so the traced program stays O(permutation body)
per walk instead of O(depth * permutation body).

Node hashing semantics mirror /root/reference/primitives/merkle/src/lib.rs;
the dual-track pair walk mirrors SinglePairMerkleProofVar::verify
(/root/reference/components/recursive/data_structures/src/lib.rs:400-464).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core import poseidon2


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _is_jax(arr):
    return not isinstance(arr, np.ndarray)


def permute_rate(left8, right8):
    xp = _xp(left8)
    return poseidon2.permute(xp.concatenate([left8, right8], axis=-1))[..., :8]


def permute_capacity(left8, right8):
    xp = _xp(left8)
    return poseidon2.permute(xp.concatenate([left8, right8], axis=-1))[..., 8:]


def hash_columns_capacity(cols):
    """Absorb (..., n) M31 columns in chunks of 8 into the capacity half."""
    xp = _xp(cols)
    n = cols.shape[-1]
    digest = xp.zeros(cols.shape[:-1] + (8,), xp.uint32)
    if n == 0:
        return digest
    for ci in range((n + 7) // 8):
        part = cols[..., 8 * ci : 8 * ci + 8]
        if part.shape[-1] < 8:
            pad = xp.zeros(cols.shape[:-1] + (8 - part.shape[-1],), xp.uint32)
            part = xp.concatenate([part, pad], axis=-1)
        digest = permute_capacity(part, digest)
    return digest


def hash_leaf(cols):
    xp = _xp(cols)
    digest = hash_columns_capacity(cols)
    return permute_rate(xp.zeros_like(digest), digest)


def _swap(bit, a, b):
    xp = _xp(a)
    c = (bit != 0)[..., None]
    return xp.where(c, b, a), xp.where(c, a, b)


def _pair_step(cur, sib, bit):
    left, right = _swap(bit, cur, sib)
    return permute_rate(left, right)


def _scan_levels(cur, sibs, bits):
    """Fold a run of column-free levels.  sibs (B,Q,k,8), bits (B,Q,k)."""
    k = sibs.shape[2]
    if k == 0:
        return cur
    if not _is_jax(cur):
        for i in range(k):
            cur = _pair_step(cur, sibs[:, :, i], bits[:, :, i])
        return cur
    import jax

    sib_t = _xp(cur).moveaxis(sibs, 2, 0)  # (k, B, Q, 8)
    bit_t = _xp(cur).moveaxis(bits, 2, 0)  # (k, B, Q)

    def body(carry, inp):
        sib, bit = inp
        return _pair_step(carry, sib, bit), None

    cur, _ = jax.lax.scan(body, cur, (sib_t, bit_t))
    return cur


def _level_bits(queries, depth):
    """(B, Q, depth) bit i of each query."""
    xp = _xp(queries)
    shifts = np.arange(depth, dtype=np.uint32)
    return (queries[..., None] >> xp.asarray(shifts)) & np.uint32(1)


def verify_single_paths(
    depth: int,
    queries,
    sibling_hashes,
    columns: Dict[int, object],
    root,
):
    """Walk (B, Q) paths to the root; returns (B,) bool."""
    xp = _xp(sibling_hashes)
    bits = _level_bits(queries, depth)
    cur = hash_leaf(columns[depth])

    data_steps = sorted(depth - 1 - h for h in columns if h != depth)
    pos = 0
    for step in data_steps:
        cur = _scan_levels(
            cur, sibling_hashes[:, :, pos:step], bits[:, :, pos:step]
        )
        h = depth - 1 - step
        cur = _pair_step(cur, sibling_hashes[:, :, step], bits[:, :, step])
        cur = permute_rate(cur, hash_columns_capacity(columns[h]))
        pos = step + 1
    cur = _scan_levels(cur, sibling_hashes[:, :, pos:depth], bits[:, :, pos:depth])
    return xp.all(cur == root[:, None, :], axis=(1, 2))


def verify_pair_paths(
    depth: int,
    data_levels,
    queries,
    self_values: Dict[int, object],
    sibling_values: Dict[int, object],
    sibling_hashes,
    root,
):
    """Dual-track pair-path walk; self-track values are the verifier's own
    computations, so the root match binds them to the commitment.

    sibling_hashes (B, Q, depth-1, 8) indexed by consumed order."""
    xp = _xp(sibling_hashes)
    data_levels = sorted(data_levels, reverse=True)
    assert data_levels[0] == depth
    bits = _level_bits(queries, depth)

    self_hash = hash_leaf(self_values[depth])
    sib_hash = hash_leaf(sibling_values[depth])

    def uniform_run(self_hash, sib_hash, start, stop):
        """Steps [start, stop) with no data levels: node=hash(pair),
        sibling from proof (when another step follows)."""
        if start >= stop:
            return self_hash, sib_hash
        # last consumed sibling index is stop-2 if stop==depth else stop-1
        if not _is_jax(self_hash):
            for i in range(start, stop):
                self_hash = _pair_step(self_hash, sib_hash, bits[:, :, i])
                if i != depth - 1:
                    sib_hash = sibling_hashes[:, :, i]
            return self_hash, sib_hash
        import jax

        n_scan = stop - start
        # scan consumes sibling_hashes[i] as the *next* sibling; for the final
        # step of the whole walk there is none — feed a dummy and ignore.
        idxs = [min(i, sibling_hashes.shape[2] - 1) for i in range(start, stop)]
        sib_t = xp.moveaxis(sibling_hashes[:, :, xp.asarray(idxs)], 2, 0)
        bit_t = xp.moveaxis(bits[:, :, start:stop], 2, 0)

        def body(carry, inp):
            s_h, sb_h = carry
            nxt_sib, bit = inp
            s_h = _pair_step(s_h, sb_h, bit)
            return (s_h, nxt_sib), None

        (self_hash, sib_hash), _ = jax.lax.scan(
            body, (self_hash, sib_hash), (sib_t, bit_t)
        )
        return self_hash, sib_hash

    pos = 0  # current step
    si = 0  # sibling_hashes consumed
    for lvl in data_levels[1:]:
        step = depth - 1 - lvl
        # uniform steps [pos, step): each consumes one sibling hash
        self_hash, sib_hash = uniform_run(self_hash, sib_hash, pos, step)
        si += step - pos
        # data step
        node = _pair_step(self_hash, sib_hash, bits[:, :, step])
        self_hash = permute_rate(node, hash_columns_capacity(self_values[lvl]))
        sib_col = hash_columns_capacity(sibling_values[lvl])
        sib_hash = permute_rate(sibling_hashes[:, :, si], sib_col)
        si += 1
        pos = step + 1
    self_hash, sib_hash = uniform_run(self_hash, sib_hash, pos, depth)
    return xp.all(self_hash == root[:, None, :], axis=(1, 2))
