"""Hash planning: every Poseidon-Merkle hash in the verifier is routed into
two big batched scans with near-minimal permutation counts.

The verifier needs ~40 logically distinct hash walks (4 commitment trees,
1 FRI first layer, N inner layers, plus dozens of column-absorb chains) of
different depths.  Earlier designs stacked them on a "walk" axis padded to
the maximum depth and ran fixed 2-3 permutations per step, wasting ~3x the
minimal work on masked lanes (inner FRI layers have no mid-walk columns,
shallow walks idle while deep ones finish).

This version compiles every walk into a straight-line program of generic
micro-ops — each op is exactly ONE 16-wide permutation with selectable
input wiring — and bin-packs the programs into a small number of scan
lanes.  A walk occupies contiguous steps of one lane; its carry starts
from per-step inputs (no reset steps) and its root equality is scattered
into a per-walk result table at its final step.  Total permutation count
equals the sum of per-walk minimal counts, independent of depth skew.

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


def _permute(state):
    return poseidon2.permute(state)


# ---------------------------------------------------------------------------
# Packed column-capacity absorption
# ---------------------------------------------------------------------------

def absorb_packed(chains: List[object], lanes: int = 0) -> List[object]:
    """Capacity-absorb many (B, Q, n_i) column chains; one permutation per
    8-column chunk TOTAL (packed into `lanes` scan lanes), not per chunk
    slot padded to the deepest chain.  Returns per-chain (B, Q, 8)."""
    lanes = lanes or _lanes_default()
    xp = _xp(chains[0])
    B, Q = chains[0].shape[:2]
    C = len(chains)

    # chunk each chain host-side into (B, Q, 8) blocks
    chunked: List[List[object]] = []
    for c in chains:
        n = c.shape[-1]
        pad = (-n) % 8
        if pad:
            c = xp.concatenate(
                [c, xp.zeros(c.shape[:-1] + (pad,), xp.uint32)], axis=-1
            )
        c = c.reshape(B, Q, -1, 8)
        chunked.append([c[:, :, k] for k in range(c.shape[2])])

    # greedy pack chains (contiguous) into lanes
    order = sorted(range(C), key=lambda i: -len(chunked[i]))
    lane_prog: List[List[tuple]] = [[] for _ in range(lanes)]
    for ci in order:
        ln = min(range(lanes), key=lambda l: len(lane_prog[l]))
        for k, chunk in enumerate(chunked[ci]):
            last = k == len(chunked[ci]) - 1
            lane_prog[ln].append((chunk, k == 0, ci if last else C))
    T = max(len(p) for p in lane_prog) if lane_prog else 0

    chunk_in = xp.zeros((T, lanes, B, Q, 8), xp.uint32)
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
    # propagates under shard_map check_vma
    seed = chains[0][..., :1] * xp.uint32(0)  # (B, Q, 1)
    carry = xp.zeros((lanes, B, Q, 8), xp.uint32) + seed[None]
    table = xp.zeros((C, B, Q, 8), xp.uint32) + seed[None]

    def body(state, inp):
        carry, table = state
        chunk, st, oid = inp
        cap = xp.where(st[:, None, None, None], xp.zeros_like(carry), carry)
        out = _permute(xp.concatenate([chunk, cap], axis=-1))[..., 8:]
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
    one batched permutation for all leaves."""
    xp = _xp(digests[0])
    stacked = xp.stack(digests, axis=0)  # (W, B, Q, 8)
    state = xp.concatenate([xp.zeros_like(stacked), stacked], axis=-1)
    return list(_permute(state)[..., :8])


# ---------------------------------------------------------------------------
# Unified packed walk scan
# ---------------------------------------------------------------------------

@dataclass
class SingleWalk:
    depth: int
    queries: object  # (B, Q) positions at depth
    sibling_hashes: object  # (B, Q, depth, 8)
    col_caps: Dict[int, object]  # level h -> (B, Q, 8) capacity digest
    leaf: object  # (B, Q, 8) leaf hash
    root: object  # (B, 8)


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


# micro-op input selectors
_A_CARRY_S, _A_IN = 0, 1
_B_CARRY_B, _B_IN_A, _B_IN_B = 0, 1, 2


def _single_prog(wk: SingleWalk, wi: int) -> List[dict]:
    """Straight-line micro-op program for a single-path walk."""
    d = wk.depth
    col_at = {d - 1 - h: cap for h, cap in wk.col_caps.items()}
    steps = []
    for t in range(d):
        steps.append(dict(
            a_sel=_A_IN if t == 0 else _A_CARRY_S,
            b_sel=_B_IN_B,
            in_a=wk.leaf if t == 0 else None,
            in_b=wk.sibling_hashes[:, :, t],
            bit=(wk.queries >> np.uint32(t)) & np.uint32(1),
            swap=True, write_b=False, check=None, walk=wi,
        ))
        if t in col_at:
            steps.append(dict(
                a_sel=_A_CARRY_S, b_sel=_B_IN_A,
                in_a=col_at[t], in_b=None, bit=None,
                swap=False, write_b=False, check=None, walk=wi,
            ))
    steps[-1]["check"] = wk.root
    return steps


def _pair_prog(wk: PairWalk, wi: int) -> List[dict]:
    """Dual-track FRI pair walk.  The sibling track value entering node
    step t is: sib_leaf (t=0), the raw per-step sibling hash (no columns
    at t-1), or P(sibling hash || sibling capacity) written to carry_b by
    a sibcol op (columns at t-1)."""
    d = wk.depth
    col_at = {d - 1 - h: (cap, wk.sib_caps[h])
              for h, cap in wk.self_caps.items()}
    steps = []
    for t in range(d):
        if t == 0:
            b_sel, in_b = _B_IN_B, wk.sib_leaf
        elif (t - 1) in col_at:
            b_sel, in_b = _B_CARRY_B, None
        else:
            b_sel, in_b = _B_IN_B, wk.sibling_hashes[:, :, t - 1]
        steps.append(dict(
            a_sel=_A_IN if t == 0 else _A_CARRY_S,
            b_sel=b_sel,
            in_a=wk.self_leaf if t == 0 else None,
            in_b=in_b,
            bit=(wk.queries >> np.uint32(t)) & np.uint32(1),
            swap=True, write_b=False, check=None, walk=wi,
        ))
        if t in col_at:
            scap, bcap = col_at[t]
            steps.append(dict(
                a_sel=_A_CARRY_S, b_sel=_B_IN_A,
                in_a=scap, in_b=None, bit=None,
                swap=False, write_b=False, check=None, walk=wi,
            ))
            steps.append(dict(
                a_sel=_A_IN, b_sel=_B_IN_B,
                in_a=wk.sibling_hashes[:, :, t], in_b=bcap, bit=None,
                swap=False, write_b=True, check=None, walk=wi,
            ))
    steps[-1]["check"] = wk.root
    return steps


def walk_scan(
    singles: List[SingleWalk], pairs: List[PairWalk], lanes: int = 0
):
    """Run every walk; returns (single_oks, pair_oks) of (B,) bools.

    Total permutations = sum over walks of (depth + column ops) — the
    minimum — bin-packed into `lanes` scan lanes of near-equal length."""
    lanes = lanes or _lanes_default()
    all_walks = list(singles) + list(pairs)
    NW = len(all_walks)
    xp = _xp(all_walks[0].queries if singles or pairs else None)
    first = singles[0].leaf if singles else pairs[0].self_leaf
    B, Q = first.shape[:2]

    progs = [
        _single_prog(wk, wi) for wi, wk in enumerate(singles)
    ] + [
        _pair_prog(wk, wi + len(singles)) for wi, wk in enumerate(pairs)
    ]

    order = sorted(range(NW), key=lambda i: -len(progs[i]))
    lane_prog: List[List[dict]] = [[] for _ in range(lanes)]
    for wi in order:
        ln = min(range(lanes), key=lambda l: len(lane_prog[l]))
        lane_prog[ln].extend(progs[wi])
    T = max(len(p) for p in lane_prog)

    in_a = xp.zeros((T, lanes, B, Q, 8), xp.uint32)
    in_b = xp.zeros((T, lanes, B, Q, 8), xp.uint32)
    bits = xp.zeros((T, lanes, B, Q), xp.uint32)
    root_in = xp.zeros((T, lanes, B, 8), xp.uint32)
    a_is_in = np.zeros((T, lanes), bool)
    b_is_ina = np.zeros((T, lanes), bool)
    b_is_inb = np.zeros((T, lanes), bool)
    swapf = np.zeros((T, lanes), bool)
    wbf = np.zeros((T, lanes), bool)
    chk_id = np.full((T, lanes), NW, np.int32)

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
            if s["check"] is not None:
                root_in = setv(root_in, (t, ln), s["check"])
                chk_id[t, ln] = s["walk"]

    # input-derived seeds keep varying-axes metadata under check_vma
    seed = first[..., :1] * xp.uint32(0)  # (B, Q, 1)
    carry_s = xp.zeros((lanes, B, Q, 8), xp.uint32) + seed[None]
    carry_b = xp.zeros((lanes, B, Q, 8), xp.uint32) + seed[None]
    ok_tab = xp.zeros((NW, B, Q), bool) | (seed[None, ..., 0] != 0)

    def body(state, inp):
        s_h, b_h, ok_tab = state
        ia, ib, bitv, rootv, ai, bia, bib, sw, wb, cid = inp
        A = xp.where(ai[:, None, None, None], ia, s_h)
        Bv = xp.where(
            bia[:, None, None, None], ia,
            xp.where(bib[:, None, None, None], ib, b_h),
        )
        c = ((bitv != 0) & sw[:, None, None])[..., None]
        left = xp.where(c, Bv, A)
        right = xp.where(c, A, Bv)
        out = _permute(xp.concatenate([left, right], axis=-1))[..., :8]
        wbm = wb[:, None, None, None]
        new_s = xp.where(wbm, s_h, out)
        new_b = xp.where(wbm, out, b_h)
        eq = xp.all(new_s == rootv[:, :, None, :], axis=-1)  # (L, B, Q)
        if _is_jax(ok_tab):
            ok_tab = ok_tab.at[cid].set(eq, mode="drop")
        else:
            for ln in range(lanes):
                if cid[ln] < NW:
                    ok_tab[cid[ln]] = eq[ln]
        return (new_s, new_b, ok_tab), None

    inputs = (
        in_a, in_b, bits, root_in,
        xp.asarray(a_is_in), xp.asarray(b_is_ina), xp.asarray(b_is_inb),
        xp.asarray(swapf), xp.asarray(wbf), xp.asarray(chk_id),
    )
    if _is_jax(carry_s):
        import jax

        (carry_s, carry_b, ok_tab), _ = jax.lax.scan(
            body, (carry_s, carry_b, ok_tab), inputs
        )
    else:
        state = (carry_s, carry_b, ok_tab)
        for t in range(T):
            state, _ = body(state, tuple(arr[t] for arr in inputs))
        ok_tab = state[2]

    oks = [ok_tab[wi].all(axis=-1) for wi in range(NW)]
    return oks[: len(singles)], oks[len(singles):]
