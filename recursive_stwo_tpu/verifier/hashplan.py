"""Hash planning: every Poseidon-Merkle hash in the verifier is routed into
two big batched scans with near-minimal permutation counts.

The verifier needs ~40 logically distinct hash walks (4 commitment trees,
1 FRI first layer, N inner layers, plus dozens of column-absorb chains) of
different depths.  Earlier designs stacked them on a "walk" axis padded to
the maximum depth and ran fixed 2-3 permutations per step, wasting ~3x the
minimal work on masked lanes (inner FRI layers have no mid-walk columns,
shallow walks idle while deep ones finish).

Every walk compiles into a straight-line program of generic micro-ops —
each op is exactly ONE 16-wide permutation with selectable input wiring —
and the programs are bin-packed into a small number of scan lanes.  A walk
occupies contiguous steps of one lane; its carry starts from per-step
inputs (no reset steps) and its final digest is scattered into a per-walk
table at its last step, compared against the commitment roots once after
the scan.  Total permutation count equals the sum of per-walk minimal
counts, independent of depth skew.

All scan tensors are kept in the Pallas kernel's lane-major layout
(walk-lane, 16-word, row, 128) for the whole scan, so no step transposes
states on the way into or out of the permutation (ops/poseidon_pallas.py
`permute_state4`); the only transposes are the one-time packing of the
witness streams.  The (B, Q) proof/query axes are flattened into the
(row, 128) tile axes.

Op wiring (one permutation P(l || r) per step, rate half kept):
  node     l,r = bit-ordered (carry_s | in_a at walk start,
                              carry_b | in_b sibling hash)
  selfcol  l,r = carry_s, in_a (column capacity digest)
  sibcol   l,r = in_a (sibling subtree hash), in_b (sibling capacity);
           result written to carry_b (dual-track FRI pair walks)

Column-chain absorption (digest = P(chunk || digest) capacity half) is the
same trick in a second scan (`absorb_packed`), since walk steps consume
its outputs as inputs.

Hash semantics mirror /root/reference/primitives/merkle/src/lib.rs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from ..core import poseidon2


def _lanes_default() -> int:
    """Scan lanes: more lanes = fewer scan steps (less per-step dispatch /
    wiring overhead) at the cost of bin-packing slack permutations.
    Swept on the v5e: see docs/perf.md."""
    return int(os.environ.get("RSTPU_HASH_LANES", "4"))


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _is_jax(arr):
    return not isinstance(arr, np.ndarray)


# ---------------------------------------------------------------------------
# Lane-major layout helpers: (B, Q, 8) values <-> (8, R, 128) tiles
# ---------------------------------------------------------------------------

def _n_rows(B: int, Q: int) -> int:
    """Rows of 128 states covering B*Q states, padded so the Pallas grid
    divides evenly (multiples of 8 rows)."""
    rows = -(-(B * Q) // 128)
    return -(-rows // 8) * 8


def _to_lm(arr, R: int):
    """(B, Q, 8) -> (8, R, 128) zero-padded lane-major tile."""
    xp = _xp(arr)
    B, Q, _ = arr.shape
    flat = arr.reshape(B * Q, 8).T
    pad = R * 128 - B * Q
    if pad:
        flat = xp.concatenate(
            [flat, xp.zeros((8, pad), xp.uint32)], axis=1
        )
    return flat.reshape(8, R, 128)


def _bits_lm(bits, R: int):
    """(B, Q) -> (R, 128) zero-padded."""
    xp = _xp(bits)
    B, Q = bits.shape
    flat = bits.reshape(B * Q)
    pad = R * 128 - B * Q
    if pad:
        flat = xp.concatenate([flat, xp.zeros((pad,), xp.uint32)])
    return flat.reshape(R, 128)


def _from_lm(lm, B: int, Q: int):
    """(8, R, 128) -> (8, B, Q) (reshape + slice, no transpose)."""
    return lm.reshape(8, -1)[:, : B * Q].reshape(8, B, Q)


def _permute4(state):
    """(L, 16, R, 128) permute; Pallas on accelerators, moveaxis fallback
    through the scan-based permutation elsewhere (bit-identical)."""
    if _is_jax(state):
        from ..ops import poseidon_pallas as pp

        if pp.available():
            return pp.permute_state4(state)
        import jax.numpy as jnp

        return jnp.moveaxis(
            poseidon2.permute(jnp.moveaxis(state, 1, -1)), -1, 1
        )
    return np.moveaxis(poseidon2.permute(np.moveaxis(state, 1, -1)), -1, 1)


# ---------------------------------------------------------------------------
# Packed column-capacity absorption
# ---------------------------------------------------------------------------

def absorb_packed(chains: List[object], lanes: int = 0) -> List[object]:
    """Capacity-absorb many (B, Q, n_i) column chains; one permutation per
    8-column chunk TOTAL (packed into `lanes` scan lanes), not per chunk
    slot padded to the deepest chain.  Returns per-chain lane-major
    (8, R, 128) capacity digests."""
    lanes = lanes or _lanes_default()
    xp = _xp(chains[0])
    B, Q = chains[0].shape[:2]
    R = _n_rows(B, Q)
    C = len(chains)

    # chunk each chain into lane-major (8, R, 128) blocks
    chunked: List[List[object]] = []
    for c in chains:
        n = c.shape[-1]
        pad = (-n) % 8
        if pad:
            c = xp.concatenate(
                [c, xp.zeros(c.shape[:-1] + (pad,), xp.uint32)], axis=-1
            )
        c = c.reshape(B, Q, -1, 8)
        chunked.append([_to_lm(c[:, :, k], R) for k in range(c.shape[2])])

    # greedy pack chains (contiguous) into lanes
    order = sorted(range(C), key=lambda i: -len(chunked[i]))
    lane_prog: List[List[tuple]] = [[] for _ in range(lanes)]
    for ci in order:
        ln = min(range(lanes), key=lambda l: len(lane_prog[l]))
        for k, chunk in enumerate(chunked[ci]):
            last = k == len(chunked[ci]) - 1
            lane_prog[ln].append((chunk, k == 0, ci if last else C))
    T = max(len(p) for p in lane_prog) if lane_prog else 0

    chunk_in = xp.zeros((T, lanes, 8, R, 128), xp.uint32)
    start = np.zeros((T, lanes), bool)
    out_id = np.full((T, lanes), C, np.int32)
    for ln, prog in enumerate(lane_prog):
        for t, (chunk, is_start, oid) in enumerate(prog):
            if _is_jax(chunk_in):
                chunk_in = chunk_in.at[t, ln].set(chunk)
            else:
                chunk_in[t, ln] = chunk
            start[t, ln] = is_start
            out_id[t, ln] = oid

    # seed the carries from an input tensor so varying-axes metadata
    # propagates under shard_map check_vma; a zero-width chain has no
    # chunks, so fall back to a zero slice of the raw chain tensor
    first = next((cl[0] for cl in chunked if cl), None)
    if first is None:
        first = _to_lm(
            xp.zeros((B, Q, 8), xp.uint32)
            + xp.zeros_like(chains[0], shape=(B, Q, 1)),
            R,
        )
    seed = first[None] * xp.uint32(0)  # (1, 8, R, 128)
    carry = xp.zeros((lanes, 8, R, 128), xp.uint32) + seed
    table = xp.zeros((C, 8, R, 128), xp.uint32) + seed

    def body(state, inp):
        carry, table = state
        chunk, st, oid = inp
        cap = xp.where(st[:, None, None, None], xp.zeros_like(carry), carry)
        out = _permute4(xp.concatenate([chunk, cap], axis=1))[:, 8:]
        if _is_jax(table):
            table = table.at[oid].set(out, mode="drop")
        else:
            for ln in range(lanes):
                if oid[ln] < C:
                    table[oid[ln]] = out[ln]
        return (out, table), None

    if _is_jax(carry):
        import jax

        (carry, table), _ = jax.lax.scan(
            body,
            (carry, table),
            (chunk_in, xp.asarray(start), xp.asarray(out_id)),
        )
    else:
        state = (carry, table)
        for t in range(T):
            state, _ = body(state, (chunk_in[t], start[t], out_id[t]))
        table = state[1]
    return [table[ci] for ci in range(C)]


def leaf_rate_many(digests: List[object]) -> List[object]:
    """hash_node(None, cols) finalization = rate(permute([0^8 | cap]));
    one batched permutation for all leaves.  Lane-major in and out."""
    xp = _xp(digests[0])
    stacked = xp.stack(digests, axis=0)  # (W, 8, R, 128)
    state = xp.concatenate([xp.zeros_like(stacked), stacked], axis=1)
    return list(_permute4(state)[:, :8])


# ---------------------------------------------------------------------------
# Unified packed walk scan
# ---------------------------------------------------------------------------

@dataclass
class SingleWalk:
    depth: int
    queries: object  # (B, Q) positions at depth
    sibling_hashes: object  # (B, Q, depth, 8)
    col_caps: Dict[int, object]  # level h -> (8, R, 128) capacity digest
    leaf: object  # (8, R, 128) leaf hash (lane-major)
    root: object  # (B, 8)


@dataclass
class PairWalk:
    depth: int
    queries: object  # (B, Q) at depth
    sibling_hashes: object  # (B, Q, depth-1, 8), consumed in step order
    self_caps: Dict[int, object]  # level -> (8, R, 128) (verifier-computed)
    sib_caps: Dict[int, object]
    self_leaf: object  # (8, R, 128)
    sib_leaf: object  # (8, R, 128)
    root: object  # (B, 8)


# micro-op input selectors
_A_CARRY_S, _A_IN = 0, 1
_B_CARRY_B, _B_IN_A, _B_IN_B = 0, 1, 2


def _single_prog(wk: SingleWalk, wi: int, R: int) -> List[dict]:
    """Straight-line micro-op program for a single-path walk."""
    d = wk.depth
    col_at = {d - 1 - h: cap for h, cap in wk.col_caps.items()}
    sib_lm = [_to_lm(wk.sibling_hashes[:, :, t], R) for t in range(d)]
    steps = []
    for t in range(d):
        steps.append(dict(
            a_sel=_A_IN if t == 0 else _A_CARRY_S,
            b_sel=_B_IN_B,
            in_a=wk.leaf if t == 0 else None,
            in_b=sib_lm[t],
            bit=_bits_lm((wk.queries >> np.uint32(t)) & np.uint32(1), R),
            swap=True, write_b=False, walk=wi,
        ))
        if t in col_at:
            steps.append(dict(
                a_sel=_A_CARRY_S, b_sel=_B_IN_A,
                in_a=col_at[t], in_b=None, bit=None,
                swap=False, write_b=False, walk=wi,
            ))
    steps[-1]["last"] = True
    return steps


def _pair_prog(wk: PairWalk, wi: int, R: int) -> List[dict]:
    """Dual-track FRI pair walk.  The sibling track value entering node
    step t is: sib_leaf (t=0), the raw per-step sibling hash (no columns
    at t-1), or P(sibling hash || sibling capacity) written to carry_b by
    a sibcol op (columns at t-1)."""
    d = wk.depth
    col_at = {d - 1 - h: (cap, wk.sib_caps[h])
              for h, cap in wk.self_caps.items()}
    sib_lm = [
        _to_lm(wk.sibling_hashes[:, :, t], R)
        for t in range(wk.sibling_hashes.shape[2])
    ]
    steps = []
    for t in range(d):
        if t == 0:
            b_sel, in_b = _B_IN_B, wk.sib_leaf
        elif (t - 1) in col_at:
            b_sel, in_b = _B_CARRY_B, None
        else:
            b_sel, in_b = _B_IN_B, sib_lm[t - 1]
        steps.append(dict(
            a_sel=_A_IN if t == 0 else _A_CARRY_S,
            b_sel=b_sel,
            in_a=wk.self_leaf if t == 0 else None,
            in_b=in_b,
            bit=_bits_lm((wk.queries >> np.uint32(t)) & np.uint32(1), R),
            swap=True, write_b=False, walk=wi,
        ))
        if t in col_at:
            scap, bcap = col_at[t]
            steps.append(dict(
                a_sel=_A_CARRY_S, b_sel=_B_IN_A,
                in_a=scap, in_b=None, bit=None,
                swap=False, write_b=False, walk=wi,
            ))
            steps.append(dict(
                a_sel=_A_IN, b_sel=_B_IN_B,
                in_a=sib_lm[t], in_b=bcap, bit=None,
                swap=False, write_b=True, walk=wi,
            ))
    steps[-1]["last"] = True
    return steps


def walk_scan(
    singles: List[SingleWalk], pairs: List[PairWalk], lanes: int = 0
):
    """Run every walk; returns (single_oks, pair_oks) of (B,) bools.

    Total permutations = sum over walks of (depth + column ops) — the
    minimum — bin-packed into `lanes` scan lanes of near-equal length.
    Each walk's final carry digest is scattered into a per-walk table;
    root equality is one batched compare after the scan."""
    lanes = lanes or _lanes_default()
    all_walks = list(singles) + list(pairs)
    NW = len(all_walks)
    xp = _xp(all_walks[0].queries)
    B, Q = all_walks[0].queries.shape[:2]
    R = _n_rows(B, Q)

    progs = [
        _single_prog(wk, wi, R) for wi, wk in enumerate(singles)
    ] + [
        _pair_prog(wk, wi + len(singles), R) for wi, wk in enumerate(pairs)
    ]

    order = sorted(range(NW), key=lambda i: -len(progs[i]))
    lane_prog: List[List[dict]] = [[] for _ in range(lanes)]
    for wi in order:
        ln = min(range(lanes), key=lambda l: len(lane_prog[l]))
        lane_prog[ln].extend(progs[wi])
    T = max(len(p) for p in lane_prog)

    in_a = xp.zeros((T, lanes, 8, R, 128), xp.uint32)
    in_b = xp.zeros((T, lanes, 8, R, 128), xp.uint32)
    bits = xp.zeros((T, lanes, R, 128), xp.uint32)
    a_is_in = np.zeros((T, lanes), bool)
    b_is_ina = np.zeros((T, lanes), bool)
    b_is_inb = np.zeros((T, lanes), bool)
    swapf = np.zeros((T, lanes), bool)
    wbf = np.zeros((T, lanes), bool)
    dig_id = np.full((T, lanes), NW, np.int32)

    def setv(tgt, sl, val):
        if _is_jax(tgt):
            return tgt.at[sl].set(val)
        tgt[sl] = val
        return tgt

    for ln, prog in enumerate(lane_prog):
        for t, s in enumerate(prog):
            if s["in_a"] is not None:
                in_a = setv(in_a, (t, ln), s["in_a"])
            if s["in_b"] is not None:
                in_b = setv(in_b, (t, ln), s["in_b"])
            if s["bit"] is not None:
                bits = setv(bits, (t, ln), s["bit"])
            a_is_in[t, ln] = s["a_sel"] == _A_IN
            b_is_ina[t, ln] = s["b_sel"] == _B_IN_A
            b_is_inb[t, ln] = s["b_sel"] == _B_IN_B
            swapf[t, ln] = s["swap"]
            wbf[t, ln] = s["write_b"]
            if s.get("last"):
                dig_id[t, ln] = s["walk"]

    # input-derived seeds keep varying-axes metadata under check_vma
    first = singles[0].leaf if singles else pairs[0].self_leaf
    seed = first[None] * xp.uint32(0)  # (1, 8, R, 128)
    carry_s = xp.zeros((lanes, 8, R, 128), xp.uint32) + seed
    carry_b = xp.zeros((lanes, 8, R, 128), xp.uint32) + seed
    dig_tab = xp.zeros((NW, 8, R, 128), xp.uint32) + seed

    def body(state, inp):
        s_h, b_h, dig_tab = state
        ia, ib, bitv, ai, bia, bib, sw, wb, did = inp
        A = xp.where(ai[:, None, None, None], ia, s_h)
        Bv = xp.where(
            bia[:, None, None, None], ia,
            xp.where(bib[:, None, None, None], ib, b_h),
        )
        c = ((bitv != 0) & sw[:, None, None])[:, None]  # (L, 1, R, 128)
        left = xp.where(c, Bv, A)
        right = xp.where(c, A, Bv)
        out = _permute4(xp.concatenate([left, right], axis=1))[:, :8]
        wbm = wb[:, None, None, None]
        new_s = xp.where(wbm, s_h, out)
        new_b = xp.where(wbm, out, b_h)
        if _is_jax(dig_tab):
            dig_tab = dig_tab.at[did].set(new_s, mode="drop")
        else:
            for ln in range(lanes):
                if did[ln] < NW:
                    dig_tab[did[ln]] = new_s[ln]
        return (new_s, new_b, dig_tab), None

    inputs = (
        in_a, in_b, bits,
        xp.asarray(a_is_in), xp.asarray(b_is_ina), xp.asarray(b_is_inb),
        xp.asarray(swapf), xp.asarray(wbf), xp.asarray(dig_id),
    )
    if _is_jax(carry_s):
        import jax

        (carry_s, carry_b, dig_tab), _ = jax.lax.scan(
            body, (carry_s, carry_b, dig_tab), inputs
        )
    else:
        state = (carry_s, carry_b, dig_tab)
        for t in range(T):
            state, _ = body(state, tuple(arr[t] for arr in inputs))
        dig_tab = state[2]

    # one batched root compare: dig_tab (NW, 8, R, 128) -> (NW, 8, B, Q)
    oks = []
    for wi, wk in enumerate(all_walks):
        dig = _from_lm(dig_tab[wi], B, Q)  # (8, B, Q)
        eq = (dig == wk.root.T[:, :, None]).all(axis=0)  # (B, Q)
        oks.append(eq.all(axis=-1))
    return oks[: len(singles)], oks[len(singles):]
