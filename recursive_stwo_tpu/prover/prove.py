"""End-to-end circle-STARK prover for the PlonkWithPoseidon AIR pair.

Produces `proof.containers.PlonkWithPoseidonProof` objects that the
framework's own (fixture-validated, stwo-bit-exact) verifier accepts:
transcript, Merkle layouts, quotient and FRI fold semantics all reuse the
components the verifier pins down.  Capability mirror of stwo's
`prove_plonk_with_poseidon` (consumed by the reference at
examples/single-proof/src/main.rs:97-98).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core import circle as ccircle
from ..core import m31
from ..core import qm31 as q
from ..core.qm31 import QM31
from ..cs import scalar
from ..proof.containers import (
    FriLayerProof,
    FriProof,
    MerkleDecommitment,
    PcsConfig,
    PlonkWithPoseidonProof,
    StarkProof,
)
from ..recursion.composition import evaluate_plonk, evaluate_poseidon
from ..verifier.spec import VerifierSpec
from . import air, circle_fft, device, fri
from .channel import PoseidonChannel
from .commit import CommittedTree
from .eval_vars import ArrayEvalAtRow, ArrayAccumulator, EvalArray, LookupElementsArray

P = (1 << 31) - 1

# routing marker for chain logging (docs/chain_log.jsonl "flow" field):
# set by prove()/prove_np() to the pipeline that produced the last proof
LAST_FLOW = None


def _oods_point(t4):
    t = tuple(int(x) for x in t4)
    t2 = scalar.q_mul(t, t)
    inv = scalar.q_inv(scalar.q_add(t2, scalar.QONE))
    return (
        scalar.q_mul(scalar.q_sub(scalar.QONE, t2), inv),
        scalar.q_mul(scalar.q_add(t, t), inv),
    )


def _factors_at_point(log_size: int, p4):
    """(log_size, 4) QM31 squaring-ladder factors (y, x, pi(x), ...)."""
    px, py = p4
    factors = [py, px]
    x = px
    for _ in range(max(0, log_size - 2)):
        sq = scalar.q_mul(x, x)
        x = scalar.q_sub(scalar.q_add(sq, sq), scalar.QONE)
        factors.append(x)
    return np.array(factors[:log_size], np.uint32)


def _basis_at_point(log_size: int, p4):
    """(n, 4) QM31 basis values (y, x, pi(x), ... factors) at a point."""
    factors = _factors_at_point(log_size, p4)
    vals = [scalar.QONE]
    for f in factors:
        f = tuple(int(v) for v in f)
        vals = vals + [scalar.q_mul(v, f) for v in vals]
    return np.array(vals, np.uint32)  # (n, 4)


def _sample_columns_host(coeffs: np.ndarray, basis: np.ndarray) -> np.ndarray:
    """coeffs (n_cols, n) M31 x basis (n, 4) QM31 -> samples (n_cols, 4)."""
    out = np.empty((coeffs.shape[0], 4), np.uint32)
    for k in range(4):
        prod = m31.mul(coeffs, basis[:, k][None, :])
        out[:, k] = (prod.astype(np.int64).sum(axis=1) % P).astype(np.uint32)
    return out


def _sample_at(coeffs: np.ndarray, log_size: int, p4) -> np.ndarray:
    """Sample all columns of an FFT-basis coefficient block at a point.
    Host numpy below 2^22 elements (typical host-flow sizes); the device
    matvec only pays off for much larger blocks."""
    if device.enabled() and coeffs.size >= 1 << 22:
        return device.sample_columns(coeffs, _factors_at_point(log_size, p4))
    return _sample_columns_host(coeffs, _basis_at_point(log_size, p4))


class _FFTRouter:
    """Per-call circle-FFT backend for the HOST prover flow.

    Defaults to the host path everywhere: circle_fft dispatches to the
    native AVX-512 butterfly kernels (native/m31fft.cpp) above 2^18
    elements, which is faster and far more predictable than shipping
    every transform over the remote-TPU link (eager per-op dispatch
    stalls for minutes, and the axon AOT compiler requests ~24G HBM for a
    single (4, 2^25) FFT program).  The fully device-resident pipeline
    (device_prove.py) never routes through here.  Set
    RSTPU_FFT_DEVICE_MAX_ELEMS > 0 to re-enable device FFTs below that
    element count."""

    def __init__(self):
        import os

        self.cap = int(
            os.environ.get("RSTPU_FFT_DEVICE_MAX_ELEMS", "0")
        )

    def _pick(self, n_elems: int):
        return device if (device.enabled() and n_elems <= self.cap) else circle_fft

    def interpolate(self, values):
        return self._pick(values.size).interpolate(values)

    def evaluate(self, coeffs):
        return self._pick(coeffs.size).evaluate(coeffs)

    def evaluate_lde(self, values, lde_log_size: int):
        n_out = (values.size // values.shape[-1]) << lde_log_size
        return self._pick(n_out).evaluate_lde(values, lde_log_size)


def _fft():
    """Active circle-FFT backend (size-routed device/numpy hybrid)."""
    return _FFTRouter()


def _point_sub_step_perm(dom_log: int, step_index: int) -> np.ndarray:
    """perm with point(perm[j]) = point(j) - step, in br domain order."""
    dom = ccircle.CanonicCoset(dom_log).circle_domain()
    n = 1 << dom_log
    order = 1 << 31
    pos_of_index = {}
    for j in range(n):
        pos_of_index[dom.index_at(ccircle.bit_reverse_index(j, dom_log))] = j
    perm = np.empty(n, np.int64)
    for j in range(n):
        idx = dom.index_at(ccircle.bit_reverse_index(j, dom_log))
        perm[j] = pos_of_index[(idx - step_index) % order]
    return perm


def prove(
    trace: dict,
    config: PcsConfig,
    progress=None,
    channel=None,
    tree_cls=None,
) -> PlonkWithPoseidonProof:
    """channel/tree_cls select the Merkle-channel flavor (default
    Poseidon31; pass a Sha256 channel + Sha256CommittedTree for the
    Sha256Poseidon31 chain level, multi-proofs/src/main.rs:289-295).
    Non-default flavors run the host flow (FFT/sampling still ride the
    device via _fft when enabled); the Poseidon default uses the fully
    device-resident pipeline."""
    import logging
    import os

    from .commit import Sha256CommittedTree

    sha_flavor = tree_cls is Sha256CommittedTree
    if device.enabled() and (sha_flavor or (channel is None and tree_cls is None)):
        # device-resident pipeline: tensors stay on the accelerator for the
        # whole proof; bit-exact twin of the numpy flow below.  At very
        # large LDE domains (fast_verifier blowups 8-9 -> 2^25-2^26) even
        # the stage-split device pipeline cannot hold all LDEs + tree
        # levels in 16G HBM, so those shapes run this host flow (device
        # FFT + device tree hashing, host tensor storage in 125G RAM).
        from ..verifier.spec import PLONK_LOG_EXPAND, POSEIDON_LOG_EXPAND
        from .device_prove import prove_device

        probe_p, _ = air.plonk_columns(trace)
        _, _, probe_lq = air.poseidon_columns(trace)
        probe_lp = probe_p.shape[1].bit_length() - 1
        probe_bound = max(
            probe_lp + PLONK_LOG_EXPAND, probe_lq + POSEIDON_LOG_EXPAND
        )
        max_domain = (
            max(probe_lp, probe_lq, probe_bound - 1)
            + config.fri_config.log_blowup_factor
        )
        # measured on v5e (16G HBM): the fully device-resident pipeline
        # OOMs at max_domain 24 (fast_verifier blowup 2^7 at 2^16 rows
        # wants 16.15G).  Those shapes take the STREAMED pipeline
        # (prover/stream.py): LDEs are chunk-re-evaluated on the fly and
        # Merkle levels leave the device above a cutoff, so HBM holds only
        # O(base-domain) state.  RSTPU_STREAM_LOG=off falls back to the
        # AVX-512 host flow below.
        global LAST_FLOW
        stream_log = os.environ.get("RSTPU_STREAM_LOG", "23")
        if stream_log != "off" and max_domain >= int(stream_log):
            from .stream import prove_streamed

            LAST_FLOW = f"streamed-device(max_domain={max_domain})"
            return prove_streamed(
                trace, config, progress, channel=channel,
                hash_flavor="sha256" if sha_flavor else "p31",
            )
        if not sha_flavor and max_domain < int(
            os.environ.get("RSTPU_DEVICE_HUGE_LOG", "24")
        ):
            LAST_FLOW = f"device-resident(max_domain={max_domain})"
            return prove_device(trace, config, progress)

    import recursive_stwo_tpu.prover.prove as _self

    _self.LAST_FLOW = "host-numpy"
    Tree = tree_cls or CommittedTree
    plog = progress or logging.getLogger(__name__).debug
    blowup = config.fri_config.log_blowup_factor

    # ---- build AIR columns (row order) ----
    plonk_pre, plonk_tr = air.plonk_columns(trace)
    pos_pre, pos_tr, lq = air.poseidon_columns(trace)
    lp = plonk_pre.shape[1].bit_length() - 1

    from ..verifier.spec import PLONK_LOG_EXPAND, POSEIDON_LOG_EXPAND

    bound = max(lp + PLONK_LOG_EXPAND, lq + POSEIDON_LOG_EXPAND)
    spec = VerifierSpec(
        log_size_plonk=lp,
        log_size_poseidon=lq,
        pow_bits=config.pow_bits,
        log_last_layer_degree_bound=config.fri_config.log_last_layer_degree_bound,
        log_blowup_factor=blowup,
        n_queries=config.fri_config.n_queries,
        n_inner_layers=bound - 2 - config.fri_config.log_last_layer_degree_bound,
    )
    assert spec.n_inner_layers == spec.expected_n_inner_layers

    def lde(rows: np.ndarray, target_log: int) -> np.ndarray:
        return _fft().evaluate_lde(air.to_domain_order(rows), target_log)

    channel = channel or PoseidonChannel()

    # ---- tree 0: preprocessed ----
    pre_plonk_lde = lde(plonk_pre, lp + blowup)
    pre_pos_lde = lde(pos_pre, lq + blowup)
    tree0 = Tree(
        _merge_levels([(lp + blowup, pre_plonk_lde), (lq + blowup, pre_pos_lde)])
    )
    channel.mix_root(tree0.root)
    plog("tree0 (preprocessed) committed")

    channel.mix_one_felt([lp, 0, 0, 0])
    channel.mix_one_felt([lq, 0, 0, 0])

    # ---- tree 1: trace ----
    tr_plonk_lde = lde(plonk_tr, lp + blowup)
    tr_pos_lde = lde(pos_tr, lq + blowup)
    tree1 = Tree(
        _merge_levels([(lp + blowup, tr_plonk_lde), (lq + blowup, tr_pos_lde)])
    )
    channel.mix_root(tree1.root)
    plog("tree1 (trace) committed")

    z4, alpha4 = channel.draw_felts()

    # ---- interaction columns ----
    int_plonk, plonk_total = air.interaction_columns(
        plonk_pre, plonk_tr, z4, alpha4, evaluate_plonk
    )
    int_pos, pos_total = air.interaction_columns(
        pos_pre, pos_tr, z4, alpha4, evaluate_poseidon
    )
    plog("interaction columns generated")
    channel.mix_two_felts(plonk_total, pos_total)

    int_plonk_lde = lde(int_plonk, lp + blowup)
    int_pos_lde = lde(int_pos, lq + blowup)
    tree2 = Tree(
        _merge_levels([(lp + blowup, int_plonk_lde), (lq + blowup, int_pos_lde)])
    )
    channel.mix_root(tree2.root)
    plog("tree2 (interaction) committed")

    random_coeff4 = channel.draw_felt()

    # ---- table coefficient blocks (shared by composition + OODS) ----
    col_coeffs = {
        (0, "p"): _fft().interpolate(air.to_domain_order(plonk_pre)),
        (0, "q"): _fft().interpolate(air.to_domain_order(pos_pre)),
        (1, "p"): _fft().interpolate(air.to_domain_order(plonk_tr)),
        (1, "q"): _fft().interpolate(air.to_domain_order(pos_tr)),
        (2, "p"): _fft().interpolate(air.to_domain_order(int_plonk)),
        (2, "q"): _fft().interpolate(air.to_domain_order(int_pos)),
    }

    # ---- composition polynomial ----
    # Default HOST evaluation: the 2^bound-domain AIR program is the one
    # device jit in this flow, and a cache-miss remote compile of the
    # (huge, fully unrolled) Poseidon AIR costs tens of minutes on the
    # tunneled TPU — far more than the numpy evaluation of the same
    # 2^18-ish domain.  It also keeps chain levels entirely host-side, so
    # the chip stays free for verification batches.  Set
    # RSTPU_DEVICE_COMPOSITION=1 to use the device program.
    if device.enabled() and int(os.environ.get("RSTPU_DEVICE_COMPOSITION", "0")):
        from .device_prove import _composition_coeffs_jit

        split_coeffs = np.asarray(
            _composition_coeffs_jit(spec)(
                col_coeffs[(0, "p")], col_coeffs[(1, "p")], col_coeffs[(2, "p")],
                col_coeffs[(0, "q")], col_coeffs[(1, "q")], col_coeffs[(2, "q")],
                np.asarray(z4, np.uint32), np.asarray(alpha4, np.uint32),
                np.asarray(random_coeff4, np.uint32),
                np.asarray(plonk_total, np.uint32),
                np.asarray(pos_total, np.uint32),
            ),
            np.uint32,
        )
        half = 1 << (bound - 1)
        left_coeffs = split_coeffs[:4]
        right_coeffs = split_coeffs[4:]
    else:
        comp_evals = _composition_evals(
            spec, bound,
            plonk_pre, plonk_tr, int_plonk,
            pos_pre, pos_tr, int_pos,
            z4, alpha4, random_coeff4, plonk_total, pos_total,
        )
        comp_coeffs = np.stack(
            [_fft().interpolate(np.asarray(c, np.uint32)) for c in comp_evals]
        )  # (4, 2^bound)
        half = 1 << (bound - 1)
        left_coeffs = comp_coeffs[:, :half]
        right_coeffs = comp_coeffs[:, half:]
    plog("composition evals computed")
    comp_cols_lde = np.concatenate(
        [
            _fft().evaluate(circle_fft.extend(left_coeffs, bound - 1 + blowup)),
            _fft().evaluate(circle_fft.extend(right_coeffs, bound - 1 + blowup)),
        ]
    )  # (8, 2^(bound-1+blowup))
    tree3 = Tree({bound - 1 + blowup: comp_cols_lde})
    channel.mix_root(tree3.root)
    plog("tree3 (composition) committed")

    oods_t4 = channel.draw_felt()
    oods = _oods_point(oods_t4)

    # ---- OODS samples ----
    # keys are (tree, table-tag), NOT (tree, log): lp == lq is legal (e.g.
    # a fiat_shamir-only stage circuit) and must not collide
    col_coeffs[(3, "c")] = np.concatenate([left_coeffs, right_coeffs])
    shifted = {}
    for log in (lp, lq):
        step = ccircle.CanonicCoset(log).step()
        shifted[log] = _add_const(oods, ccircle.point_neg(step))

    samples_at = {}
    for key, coeffs in col_coeffs.items():
        t, tag = key
        deg_log = coeffs.shape[1].bit_length() - 1
        samples_at[(key, 0)] = _sample_at(coeffs, deg_log, oods)
        if t == 2:
            samples_at[(key, -1)] = _sample_at(
                coeffs, deg_log, shifted[lp if tag == "p" else lq]
            )

    sampled_values = _assemble_samples(spec, lp, lq, bound, samples_at)
    plog("OODS samples computed")

    flat = [s for tree in sampled_values for col in tree for s in col]
    for k in range(0, len(flat), 2):
        chunk = flat[k : k + 2]
        if len(chunk) == 1:
            channel.mix_one_felt(chunk[0])
        else:
            channel.mix_two_felts(chunk[0], chunk[1])

    after_coeff4 = channel.draw_felt()

    # ---- FRI first layer: quotients on commitment domains ----
    group_evals = _group_quotients(
        spec, sampled_values, after_coeff4, oods, shifted,
        pre_plonk_lde, pre_pos_lde, tr_plonk_lde, tr_pos_lde,
        int_plonk_lde, int_pos_lde, comp_cols_lde, lp, lq, bound, blowup,
    )

    stark_proof = _fri_tail(
        spec, config, channel, [tree0, tree1, tree2, tree3],
        group_evals, sampled_values, plog, tree_cls=Tree,
    )
    return PlonkWithPoseidonProof(
        log_size_plonk=lp,
        log_size_poseidon=lq,
        plonk_total_sum=np.array(plonk_total, np.uint32),
        poseidon_total_sum=np.array(pos_total, np.uint32),
        config=config,
        stark_proof=stark_proof,
    )


def _fri_tail(spec, config, channel, trees, group_evals, sampled_values, plog,
              tree_cls=None):
    """AIR-agnostic FRI phase: commit first layer + inner folds, last
    poly extraction, PoW grind, query draw, and all decommitments.
    Shared by the with- and without-poseidon provers (and, via tree_cls,
    by the SHA-256 Merkle flavors)."""
    Tree = tree_cls or CommittedTree
    tree0, tree1, tree2, tree3 = trees
    plog("FRI first-layer quotients computed")
    first_tree = Tree(
        {L: fri._q_limbs(ev) for L, ev in group_evals.items()}
    )
    channel.mix_root(first_tree.root)
    alphas = [tuple(int(x) for x in channel.draw_felt())]
    M = spec.max_first_layer_log

    # inner layers
    inner_trees: List[CommittedTree] = []
    inner_evals: List[QM31] = []
    g_evals = QM31(*(np.zeros(1 << (M - 1), np.uint32) for _ in range(4)))
    level = M - 1
    for i in range(spec.n_inner_layers):
        L = M - i  # group that joins at this layer (if present)
        if L in group_evals:
            alpha = alphas[i]
            a2 = scalar.q_mul(alpha, alpha)
            fold_in = fri.fold_circle(group_evals[L], alphas[M - L])
            g_evals = q.q_add(
                q.q_mul(QM31(*(np.uint32(x) for x in a2)), g_evals), fold_in
            )
        tree_i = Tree({level: fri._q_limbs(g_evals)})
        inner_trees.append(tree_i)
        inner_evals.append(g_evals)
        channel.mix_root(tree_i.root)
        alphas.append(tuple(int(x) for x in channel.draw_felt()))
        g_evals = fri.fold_line(g_evals, alphas[i + 1], level)
        level -= 1

    # ---- last layer ----
    # In the verifier's eval basis the factor for small-index bit k of an
    # n_last-coeff poly sits at big-basis bit (level - 1 - k): low-degree
    # coefficients occupy indices j << (level - last_bound).
    last_bound = config.fri_config.log_last_layer_degree_bound
    n_last = 1 << last_bound
    last_full = fri.line_interpolate(g_evals, level)
    gap = level - last_bound
    keep = np.arange(n_last) << gap
    mask = np.zeros(1 << level, bool)
    mask[keep] = True
    assert not last_full[~mask].any(), "folded evals exceed last-layer bound"
    last_poly = last_full[keep]
    for k in range(0, n_last, 2):
        chunk = last_poly[k : k + 2]
        if len(chunk) == 1:
            channel.mix_one_felt(chunk[0])
        else:
            channel.mix_two_felts(chunk[0], chunk[1])

    # ---- PoW + queries ----
    plog("FRI layers committed; grinding PoW")
    nonce = channel.grind_pow(config.pow_bits)
    plog("PoW ground")
    channel.mix_u64(nonce)
    raw_queries: List[int] = []
    for _ in range(-(-config.fri_config.n_queries // 8)):
        a, b = channel.draw_felts()
        raw_queries.extend(int(x) for x in a)
        raw_queries.extend(int(x) for x in b)
    raw_queries = [v & ((1 << M) - 1) for v in raw_queries[: config.fri_config.n_queries]]

    # ---- decommitments ----
    queried_values = []
    decommitments = []
    for t in range(4):
        depth = trees[t].max_log
        qs = [v >> (M - depth) for v in raw_queries]
        vals, dec = trees[t].decommit(qs)
        queried_values.append(vals)
        decommitments.append(dec)

    first_layer = FriLayerProof(
        fri_witness=fri.first_layer_witness(group_evals, raw_queries, M),
        decommitment=fri.decommit_pair(first_tree, raw_queries),
        commitment=first_tree.root,
    )
    inner_layers = []
    cur_queries = [v >> 1 for v in raw_queries]
    for i in range(spec.n_inner_layers):
        lvl = M - 1 - i
        inner_layers.append(
            FriLayerProof(
                fri_witness=fri.inner_layer_witness(inner_evals[i], cur_queries),
                decommitment=fri.decommit_pair(
                    inner_trees[i], cur_queries
                ),
                commitment=inner_trees[i].root,
            )
        )
        cur_queries = [v >> 1 for v in cur_queries]

    stark_proof = StarkProof(
        commitments=np.stack([t.root for t in trees]),
        sampled_values=sampled_values,
        decommitments=decommitments,
        queried_values=queried_values,
        proof_of_work=nonce,
        fri_proof=FriProof(
            first_layer=first_layer,
            inner_layers=inner_layers,
            last_layer_poly=last_poly,
            last_layer_log_size=config.fri_config.log_last_layer_degree_bound,
        ),
    )
    return stark_proof


def _merge_levels(pairs) -> Dict[int, np.ndarray]:
    """Concatenate same-log column groups (plonk first, then poseidon)."""
    out: Dict[int, list] = {}
    for log, cols in pairs:
        out.setdefault(log, []).append(cols)
    return {
        log: parts[0] if len(parts) == 1 else np.concatenate(parts)
        for log, parts in out.items()
    }


def _add_const(p4, c):
    px, py = p4
    cx, cy = c
    return (
        scalar.q_sub(scalar.q_mul_m31(px, cx), scalar.q_mul_m31(py, cy)),
        scalar.q_add(scalar.q_mul_m31(px, cy), scalar.q_mul_m31(py, cx)),
    )


def _assemble_samples(spec, lp, lq, bound, samples_at):
    """TreeVec[tree][col] -> (n_samples, 4) arrays in proof order."""
    sampled = []
    for t in range(3):
        tree_cols = []
        plonk = samples_at[((t, "p"), 0)]
        pos = samples_at[((t, "q"), 0)]
        n_plonk = plonk.shape[0]
        for ci in range(n_plonk + pos.shape[0]):
            cur = plonk[ci] if ci < n_plonk else pos[ci - n_plonk]
            n_samples = spec.n_samples_per_column[t][ci]
            if n_samples == 1:
                tree_cols.append(cur[None, :])
            else:
                prev_all = samples_at[((t, "p" if ci < n_plonk else "q"), -1)]
                prev = prev_all[ci if ci < n_plonk else ci - n_plonk]
                tree_cols.append(np.stack([prev, cur]))
        sampled.append(tree_cols)
    comp = samples_at[((3, "c"), 0)]
    sampled.append([comp[ci][None, :] for ci in range(8)])
    return sampled


def _composition_evals(
    spec, bound,
    plonk_pre, plonk_tr, int_plonk,
    pos_pre, pos_tr, int_pos,
    z4, alpha4, rc4, plonk_total, pos_total,
):
    """Pointwise AIR constraint accumulation on the 2^bound domain."""
    n = 1 << bound
    lookup = LookupElementsArray(z4, alpha4, n)
    acc = ArrayAccumulator(rc4, n)
    x, y = circle_fft.domain_points_bit_reversed(bound)

    for (pre, tr, inter, total, log) in (
        (plonk_pre, plonk_tr, int_plonk, plonk_total, spec.log_size_plonk),
        (pos_pre, pos_tr, int_pos, pos_total, spec.log_size_poseidon),
    ):
        pre_l = _fft().evaluate_lde(air.to_domain_order(pre), bound)
        tr_l = _fft().evaluate_lde(air.to_domain_order(tr), bound)
        int_l = _fft().evaluate_lde(air.to_domain_order(inter), bound)

        step_index = ccircle.Coset.odds(log).step_index
        perm = _point_sub_step_perm(bound, step_index)
        n_int = int_l.shape[0]
        mask_pre = [[EvalArray.from_limbs(c)] for c in pre_l]
        mask_tr = [[EvalArray.from_limbs(c)] for c in tr_l]
        mask_int = []
        for ci in range(n_int):
            if ci < n_int - 4:
                mask_int.append([EvalArray.from_limbs(int_l[ci])])
            else:
                mask_int.append(
                    [
                        EvalArray.from_limbs(int_l[ci][perm]),
                        EvalArray.from_limbs(int_l[ci]),
                    ]
                )

        # vanishing denominator: pi^(log-1)(x) on the composition domain
        v = x
        for _ in range(log - 1):
            sq = m31.mul(v, v)
            v = m31.sub(m31.add(sq, sq), np.uint32(1))
        denom_inv = EvalArray.from_limbs(m31.inv(v))

        ev = ArrayEvalAtRow(
            [mask_pre, mask_tr, mask_int], total, denom_inv, log, acc, n
        )
        if pre is plonk_pre:
            evaluate_plonk(lookup, ev)
        else:
            evaluate_poseidon(lookup, ev)

    return acc.accumulation.v


def _group_quotients(
    spec, sampled_values, after_coeff4, oods, shifted,
    pre_plonk_lde, pre_pos_lde, tr_plonk_lde, tr_pos_lde,
    int_plonk_lde, int_pos_lde, comp_cols_lde, lp, lq, bound, blowup,
):
    """Quotient evaluations per first-layer log size over the FULL
    commitment domains, via the verifier's own quotient kernels."""
    from ..verifier import quotients as vquot

    samples_flat = np.concatenate(
        [col for tree in sampled_values for col in tree]
    )[None]  # (1, S, 4)

    ldes = [
        _merge_levels([(lp + blowup, pre_plonk_lde), (lq + blowup, pre_pos_lde)]),
        _merge_levels([(lp + blowup, tr_plonk_lde), (lq + blowup, tr_pos_lde)]),
        _merge_levels([(lp + blowup, int_plonk_lde), (lq + blowup, int_pos_lde)]),
        {bound - 1 + blowup: comp_cols_lde},
    ]

    out = {}
    for g, L in enumerate(spec.all_log_sizes):
        # per-column (N,) views into the LDE blocks — no transpose copy
        col_rows = [
            ldes[t][L][i]
            for t in range(4)
            if L in ldes[t]
            for i in range(ldes[t][L].shape[0])
        ]
        x, y = circle_fft.domain_points_bit_reversed(L)
        arr1 = lambda t4: QM31(  # noqa: E731
            *(np.array([int(v)], np.uint32) for v in t4)
        )
        out[L] = vquot.fri_answers_for_group_prover(
            spec, g,
            (arr1(oods[0]), arr1(oods[1])),
            arr1(after_coeff4),
            samples_flat, col_rows, x, y,
        )
    return out
