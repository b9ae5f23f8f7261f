"""Hash planning: every Poseidon-Merkle hash in the verifier is routed into
a handful of big batched scans.

The verifier needs ~40 logically distinct hash walks (4 commitment trees,
1 FRI first layer, N inner layers, plus dozens of column-absorb chains).
Executing each as its own op chain bloats the traced program and launches
many small kernels.  Instead we:

  1. absorb_many   — ALL column-capacity absorb chains, padded to the max
                     chunk count, as ONE scan with per-chain active masks;
  2. leaf_rate_many — all leaf finalizations in ONE batched permutation;
  3. single_walks  — all single-path tree walks, padded to max depth, as ONE
                     scan (2 permutations per step, data levels masked);
  4. pair_walks    — all dual-track FRI pair walks as ONE scan (3
                     permutations per step).

Hash semantics mirror /root/reference/primitives/merkle/src/lib.rs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core import poseidon2


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _is_jax(arr):
    return not isinstance(arr, np.ndarray)


def _permute(state):
    return poseidon2.permute(state)


def absorb_many(chains: List[object]) -> List[object]:
    """Capacity-absorb many (B, Q, n_i) column chains at once.

    Returns per-chain capacity digests (B, Q, 8)."""
    xp = _xp(chains[0])
    B, Q = chains[0].shape[:2]
    n_chunks = [(c.shape[-1] + 7) // 8 for c in chains]
    D = max(n_chunks)
    W = len(chains)

    stacked = xp.zeros((D, W, B, Q, 8), xp.uint32)
    active = np.zeros((D, W), bool)
    for w, c in enumerate(chains):
        n = c.shape[-1]
        pad = (-n) % 8
        if pad:
            c = xp.concatenate(
                [c, xp.zeros(c.shape[:-1] + (pad,), xp.uint32)], axis=-1
            )
        c = c.reshape(B, Q, -1, 8)
        k = c.shape[2]
        if _is_jax(stacked):
            stacked = stacked.at[:k, w].set(xp.moveaxis(c, 2, 0))
        else:
            stacked[:k, w] = np.moveaxis(c, 2, 0)
        active[:k, w] = True

    digest = xp.zeros((W, B, Q, 8), xp.uint32)

    def body(digest, inp):
        chunk, act = inp
        new = _permute(xp.concatenate([chunk, digest], axis=-1))[..., 8:]
        mask = act[:, None, None, None]
        return xp.where(mask, new, digest), None

    if _is_jax(digest):
        import jax

        digest, _ = jax.lax.scan(body, digest, (stacked, xp.asarray(active)))
    else:
        for t in range(D):
            digest, _ = body(digest, (stacked[t], active[t]))
    return [digest[w] for w in range(W)]


def leaf_rate_many(digests: List[object]) -> List[object]:
    """hash_node(None, cols) finalization = rate(permute([0^8 | cap]));
    one batched permutation for all leaves."""
    xp = _xp(digests[0])
    stacked = xp.stack(digests, axis=0)  # (W, B, Q, 8)
    state = xp.concatenate([xp.zeros_like(stacked), stacked], axis=-1)
    return list(_permute(state)[..., :8])


@dataclass
class SingleWalk:
    depth: int
    queries: object  # (B, Q) positions at depth
    sibling_hashes: object  # (B, Q, depth, 8)
    col_caps: Dict[int, object]  # level h -> (B, Q, 8) capacity digest
    leaf: object  # (B, Q, 8) leaf hash
    root: object  # (B, 8)


def single_walks(walks: List[SingleWalk]) -> List[object]:
    """All single-path walks as one scan; returns per-walk (B,) ok."""
    xp = _xp(walks[0].leaf)
    B, Q = walks[0].leaf.shape[:2]
    D = max(w.depth for w in walks)
    W = len(walks)

    bits = xp.zeros((D, W, B, Q), xp.uint32)
    sibs = xp.zeros((D, W, B, Q, 8), xp.uint32)
    caps = xp.zeros((D, W, B, Q, 8), xp.uint32)
    has_col = np.zeros((D, W), bool)
    active = np.zeros((D, W), bool)

    def setv(tgt, sl, val):
        if _is_jax(tgt):
            return tgt.at[sl].set(val)
        tgt[sl] = val
        return tgt

    for w, wk in enumerate(walks):
        d = wk.depth
        shifts = xp.asarray(np.arange(d, dtype=np.uint32))
        b = (wk.queries[..., None] >> shifts) & np.uint32(1)  # (B,Q,d)
        bits = setv(bits, (slice(0, d), w), xp.moveaxis(b, 2, 0))
        sibs = setv(sibs, (slice(0, d), w), xp.moveaxis(wk.sibling_hashes, 2, 0))
        active[:d, w] = True
        for h, cap in wk.col_caps.items():
            step = d - 1 - h
            caps = setv(caps, (step, w), cap)
            has_col[step, w] = True

    cur = xp.stack([w.leaf for w in walks], axis=0)  # (W, B, Q, 8)

    def body(cur, inp):
        bit, sib, cap, hc, act = inp
        c = (bit != 0)[..., None]
        left = xp.where(c, sib, cur)
        right = xp.where(c, cur, sib)
        node = _permute(xp.concatenate([left, right], axis=-1))[..., :8]
        withcol = _permute(xp.concatenate([node, cap], axis=-1))[..., :8]
        new = xp.where(hc[:, None, None, None], withcol, node)
        return xp.where(act[:, None, None, None], new, cur), None

    if _is_jax(cur):
        import jax

        cur, _ = jax.lax.scan(
            body, cur, (bits, sibs, caps, xp.asarray(has_col), xp.asarray(active))
        )
    else:
        for t in range(D):
            cur, _ = body(cur, (bits[t], sibs[t], caps[t], has_col[t], active[t]))

    return [
        xp.all(cur[w] == wk.root[:, None, :], axis=(1, 2))
        for w, wk in enumerate(walks)
    ]


@dataclass
class PairWalk:
    depth: int
    queries: object  # (B, Q) at depth
    sibling_hashes: object  # (B, Q, depth-1, 8), consumed in step order
    self_caps: Dict[int, object]  # level -> (B, Q, 8) (verifier-computed)
    sib_caps: Dict[int, object]
    self_leaf: object  # (B, Q, 8)
    sib_leaf: object  # (B, Q, 8)
    root: object  # (B, 8)


def pair_walks(walks: List[PairWalk]) -> List[object]:
    """All dual-track pair walks as one scan; returns per-walk (B,) ok."""
    xp = _xp(walks[0].self_leaf)
    B, Q = walks[0].self_leaf.shape[:2]
    D = max(w.depth for w in walks)
    W = len(walks)

    bits = xp.zeros((D, W, B, Q), xp.uint32)
    sibp = xp.zeros((D, W, B, Q, 8), xp.uint32)
    scaps = xp.zeros((D, W, B, Q, 8), xp.uint32)
    bcaps = xp.zeros((D, W, B, Q, 8), xp.uint32)
    has_col = np.zeros((D, W), bool)
    active = np.zeros((D, W), bool)

    def setv(tgt, sl, val):
        if _is_jax(tgt):
            return tgt.at[sl].set(val)
        tgt[sl] = val
        return tgt

    for w, wk in enumerate(walks):
        d = wk.depth
        shifts = xp.asarray(np.arange(d, dtype=np.uint32))
        b = (wk.queries[..., None] >> shifts) & np.uint32(1)
        bits = setv(bits, (slice(0, d), w), xp.moveaxis(b, 2, 0))
        k = wk.sibling_hashes.shape[2]  # d-1
        sibp = setv(sibp, (slice(0, k), w), xp.moveaxis(wk.sibling_hashes, 2, 0))
        active[:d, w] = True
        for h, cap in wk.self_caps.items():
            if h == d:
                continue  # leaf level handled by self_leaf
            step = d - 1 - h
            scaps = setv(scaps, (step, w), cap)
            bcaps = setv(bcaps, (step, w), wk.sib_caps[h])
            has_col[step, w] = True

    self_h = xp.stack([w.self_leaf for w in walks], axis=0)
    sib_h = xp.stack([w.sib_leaf for w in walks], axis=0)

    def body(carry, inp):
        s_h, b_h = carry
        bit, sp, scap, bcap, hc, act = inp
        c = (bit != 0)[..., None]
        left = xp.where(c, b_h, s_h)
        right = xp.where(c, s_h, b_h)
        node = _permute(xp.concatenate([left, right], axis=-1))[..., :8]
        with_col = _permute(xp.concatenate([node, scap], axis=-1))[..., :8]
        new_self = xp.where(hc[:, None, None, None], with_col, node)
        sib_comb = _permute(xp.concatenate([sp, bcap], axis=-1))[..., :8]
        new_sib = xp.where(hc[:, None, None, None], sib_comb, sp)
        am = act[:, None, None, None]
        return (xp.where(am, new_self, s_h), xp.where(am, new_sib, b_h)), None

    if _is_jax(self_h):
        import jax

        (self_h, _), _ = jax.lax.scan(
            body,
            (self_h, sib_h),
            (bits, sibp, scaps, bcaps, xp.asarray(has_col), xp.asarray(active)),
        )
    else:
        carry = (self_h, sib_h)
        for t in range(D):
            carry, _ = body(
                carry, (bits[t], sibp[t], scaps[t], bcaps[t], has_col[t], active[t])
            )
        self_h = carry[0]

    return [
        xp.all(self_h[w] == wk.root[:, None, :], axis=(1, 2))
        for w, wk in enumerate(walks)
    ]
