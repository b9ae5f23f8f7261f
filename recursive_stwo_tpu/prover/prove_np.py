"""Circle-STARK prover for the PlonkWithoutPoseidon AIR (the last-layer
output system; reference: stwo fork's `prove_plonk_without_poseidon` as
consumed by examples/last-layer/src/main.rs:188-202).

Single trace table at one log size; gate semantics per
constraint_system/src/plonk_without_poseidon.rs:410-598, trace layout per
:633-713, logup (a/b at multiplicity one, mult_c on definitions) per
:600-631.  Shares the transcript channel, commitment trees, and the whole
FRI phase with the with-poseidon prover (prove._fri_tail)."""

from __future__ import annotations

import numpy as np

from ..core import circle as ccircle
from ..core import m31
from ..cs import scalar
from ..proof.containers import PcsConfig, PlonkWithoutPoseidonProof
from ..recursion.composition import evaluate_plonk_np
from ..verifier.spec import NoPoseidonVerifierSpec
from . import air, circle_fft, fri  # noqa: F401  (fri used via prove._fri_tail)
from .channel import PoseidonChannel
from .commit import CommittedTree
from .eval_vars import (
    ArrayAccumulator,
    ArrayEvalAtRow,
    EvalArray,
    LookupElementsArray,
)
from .prove import (
    _add_const,
    _basis_at_point,
    _fft,
    _fri_tail,
    _oods_point,
    _point_sub_step_perm,
    _sample_at,
)


def _composition_evals_np(spec, bound, pre, tr, inter, z4, alpha4, rc4, total):
    n = 1 << bound
    lookup = LookupElementsArray(z4, alpha4, n)
    acc = ArrayAccumulator(rc4, n)
    x, _ = circle_fft.domain_points_bit_reversed(bound)
    log = spec.log_size

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

    v = x
    for _ in range(log - 1):
        sq = m31.mul(v, v)
        v = m31.sub(m31.add(sq, sq), np.uint32(1))
    denom_inv = EvalArray.from_limbs(m31.inv(v))

    ev = ArrayEvalAtRow(
        [mask_pre, mask_tr, mask_int], total, denom_inv, log, acc, n
    )
    evaluate_plonk_np(lookup, ev)
    return acc.accumulation.v


def _assemble_samples_np(spec, bound, samples_at):
    sampled = []
    for t in range(3):
        cols = samples_at[(t, 0)]
        tree_cols = []
        for ci in range(cols.shape[0]):
            if spec.n_samples_per_column[t][ci] == 1:
                tree_cols.append(cols[ci][None, :])
            else:
                prev = samples_at[(t, -1)][ci]
                tree_cols.append(np.stack([prev, cols[ci]]))
        sampled.append(tree_cols)
    comp = samples_at[(3, 0)]
    sampled.append([comp[ci][None, :] for ci in range(8)])
    return sampled


def _group_quotients_np(spec, sampled_values, after_coeff4, oods, shifted,
                        ldes):
    from ..core.qm31 import QM31
    from ..verifier import quotients as vquot

    samples_flat = np.concatenate(
        [col for tree in sampled_values for col in tree]
    )[None]

    out = {}
    for g, L in enumerate(spec.all_log_sizes):
        # per-column (N,) views; BLAS matvec path (see quotients.py)
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


def prove_np(trace: dict, config: PcsConfig, progress=None,
             channel=None, tree_cls=None):
    """trace: PlonkWithoutPoseidonCS.generate_trace() output.

    channel/tree_cls select the Merkle-channel flavor: default Poseidon31;
    pass (prove_sha256.Sha256ProverChannel(), commit.Sha256CommittedTree)
    for the Sha256MerkleChannel output proof (the reference's
    bitcoin_proof.bin step, examples/last-layer/src/main.rs:194-202)."""
    import os

    from . import device

    if device.enabled():
        pre_probe, _ = air.np_columns(trace)
        Lp = pre_probe.shape[1].bit_length() - 1
        bound_p = NoPoseidonVerifierSpec.for_rows(
            Lp, config
        ).composition_log_degree_bound
        max_domain = max(Lp, bound_p - 1) + config.fri_config.log_blowup_factor
        stream_log = os.environ.get("RSTPU_STREAM_LOG", "23")
        if stream_log != "off" and max_domain >= int(stream_log):
            from . import prove as prove_mod
            from .stream import prove_np_streamed

            prove_mod.LAST_FLOW = f"streamed-device(max_domain={max_domain})"
            return prove_np_streamed(
                trace, config, progress, channel=channel, tree_cls=tree_cls
            )
    from . import prove as prove_mod

    prove_mod.LAST_FLOW = "host-numpy"
    Tree = tree_cls or CommittedTree
    def plog(msg):
        if progress:
            progress(msg)

    pre, tr = air.np_columns(trace)
    L = pre.shape[1].bit_length() - 1
    assert 1 << L == pre.shape[1]
    blowup = config.fri_config.log_blowup_factor
    spec = NoPoseidonVerifierSpec.for_rows(L, config)
    bound = spec.composition_log_degree_bound

    def lde(rows, target_log):
        return _fft().evaluate_lde(air.to_domain_order(rows), target_log)

    channel = channel or PoseidonChannel()

    pre_lde = lde(pre, L + blowup)
    tree0 = Tree({L + blowup: pre_lde})
    channel.mix_root(tree0.root)
    plog("tree0 (preprocessed) committed")

    channel.mix_one_felt([L, 0, 0, 0])

    tr_lde = lde(tr, L + blowup)
    tree1 = Tree({L + blowup: tr_lde})
    channel.mix_root(tree1.root)
    plog("tree1 (trace) committed")

    z4, alpha4 = channel.draw_felts()

    inter, total = air.interaction_columns(pre, tr, z4, alpha4, evaluate_plonk_np)
    channel.mix_one_felt(total)

    int_lde = lde(inter, L + blowup)
    tree2 = Tree({L + blowup: int_lde})
    channel.mix_root(tree2.root)
    plog("tree2 (interaction) committed")

    random_coeff4 = channel.draw_felt()

    comp_evals = _composition_evals_np(
        spec, bound, pre, tr, inter, z4, alpha4, random_coeff4, total
    )
    comp_coeffs = np.stack(
        [_fft().interpolate(np.asarray(c, np.uint32)) for c in comp_evals]
    )
    half = 1 << (bound - 1)
    left_coeffs = comp_coeffs[:, :half]
    right_coeffs = comp_coeffs[:, half:]
    comp_cols_lde = np.concatenate(
        [
            _fft().evaluate(circle_fft.extend(left_coeffs, bound - 1 + blowup)),
            _fft().evaluate(circle_fft.extend(right_coeffs, bound - 1 + blowup)),
        ]
    )
    tree3 = Tree({bound - 1 + blowup: comp_cols_lde})
    channel.mix_root(tree3.root)
    plog("tree3 (composition) committed")

    oods_t4 = channel.draw_felt()
    oods = _oods_point(oods_t4)

    col_coeffs = {
        0: _fft().interpolate(air.to_domain_order(pre)),
        1: _fft().interpolate(air.to_domain_order(tr)),
        2: _fft().interpolate(air.to_domain_order(inter)),
        3: np.concatenate([left_coeffs, right_coeffs]),
    }
    step = ccircle.CanonicCoset(L).step()
    shifted = {L: _add_const(oods, ccircle.point_neg(step))}

    samples_at = {}
    for t, coeffs in col_coeffs.items():
        deg_log = coeffs.shape[1].bit_length() - 1
        samples_at[(t, 0)] = _sample_at(coeffs, deg_log, oods)
        if t == 2:
            samples_at[(t, -1)] = _sample_at(coeffs, deg_log, shifted[L])

    sampled_values = _assemble_samples_np(spec, bound, samples_at)
    plog("OODS samples computed")

    flat = [s for tree in sampled_values for col in tree for s in col]
    for k in range(0, len(flat), 2):
        chunk = flat[k : k + 2]
        if len(chunk) == 1:
            channel.mix_one_felt(chunk[0])
        else:
            channel.mix_two_felts(chunk[0], chunk[1])

    after_coeff4 = channel.draw_felt()

    ldes = [
        {L + blowup: pre_lde},
        {L + blowup: tr_lde},
        {L + blowup: int_lde},
        {bound - 1 + blowup: comp_cols_lde},
    ]
    group_evals = _group_quotients_np(
        spec, sampled_values, after_coeff4, oods, shifted, ldes
    )

    stark_proof = _fri_tail(
        spec, config, channel, [tree0, tree1, tree2, tree3],
        group_evals, sampled_values, plog, tree_cls=Tree,
    )
    return PlonkWithoutPoseidonProof(
        log_size=L,
        total_sum=np.array(total, np.uint32),
        config=config,
        stark_proof=stark_proof,
    )
