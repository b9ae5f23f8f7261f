"""Device-resident circle-STARK prover for the PlonkWithPoseidon AIR pair.

Same proof semantics as `prove.prove` (the numpy host twin — bit-exact, see
tests/test_device_prover.py), restructured for a TPU behind a slow
host<->device link: every large tensor (trace LDEs, Merkle levels,
interaction/composition columns, FRI layers) is CREATED on the device and
STAYS there for the whole proof.  jit boundaries sit exactly at the
Fiat-Shamir channel interactions, so the only host<->device traffic is

  * one upload of the raw trace columns (~tens of MB),
  * 32-byte Merkle roots + total sums + OODS samples for channel mixing,
  * batched index gathers for the decommitments (a few KB).

The original reference delegates this entire phase to stwo's SIMD prover
(`prove_plonk_with_poseidon`, consumed at
/root/reference/examples/single-proof/src/main.rs:97-98); this module is
the TPU-native equivalent.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List

import numpy as np

from ..core import circle as ccircle
from ..core import m31, poseidon2
from ..core import qm31 as q
from ..core.qm31 import QM31
from ..proof.containers import PcsConfig, PlonkWithPoseidonProof
from ..recursion.composition import evaluate_plonk, evaluate_poseidon
from ..verifier.spec import VerifierSpec
from . import air, circle_fft, fri
from .channel import PoseidonChannel
from .commit import CommittedTree
from .eval_vars import (
    ArrayAccumulator,
    ArrayEvalAtRow,
    EvalArray,
    LookupElementsArray,
)


# ---------------------------------------------------------------------------
# traced Merkle commitment
# ---------------------------------------------------------------------------

def _absorb_columns(cols, n):
    """Traced: absorb (n_cols, n) M31 columns into (n, 8) running digests
    (same chunking as commit._hash_leaf_level)."""
    import jax.numpy as jnp

    digest = jnp.zeros((n, 8), jnp.uint32)
    n_cols = cols.shape[0]
    for ci in range(0, n_cols, 8):
        chunk = cols[ci : ci + 8].T
        if chunk.shape[1] < 8:
            chunk = jnp.pad(chunk, ((0, 0), (0, 8 - chunk.shape[1])))
        digest = poseidon2.permute(jnp.concatenate([chunk, digest], axis=1))[
            :, 8:
        ]
    return digest


def _commit_levels(cols_by_log: Dict[int, object]) -> List[object]:
    """Traced Merkle tree build; returns all levels, leaf level first.
    Hash semantics identical to commit._hash_leaf_level/_hash_node_level."""
    import jax.numpy as jnp

    max_log = max(cols_by_log)
    n = 1 << max_log
    digest = _absorb_columns(cols_by_log[max_log], n)
    h = poseidon2.permute(jnp.concatenate([jnp.zeros_like(digest), digest], axis=1))[
        :, :8
    ]
    levels = [h]
    for L in range(max_log - 1, -1, -1):
        n = 1 << L
        h = poseidon2.permute(h.reshape(n, 16))[:, :8]
        cols = cols_by_log.get(L)
        if cols is not None and cols.shape[0]:
            digest = _absorb_columns(cols, n)
            h = poseidon2.permute(jnp.concatenate([h, digest], axis=1))[:, :8]
        levels.append(h)
    return levels


@lru_cache(maxsize=None)
def _commit_tree_jit(sig):
    """sig: tuple of (log, n_cols) sorted descending by log."""
    import jax

    logs = [L for L, _ in sig]

    @jax.jit
    def run(*cols):
        return _commit_levels(dict(zip(logs, cols)))

    return run


class DeviceTree(CommittedTree):
    """CommittedTree with device-resident columns and levels; decommit
    gathers ride the plan+gather structure of the base class."""

    def __init__(self, columns_by_log, levels=None):
        self.columns_by_log = {int(L): c for L, c in columns_by_log.items()}
        self.max_log = max(self.columns_by_log)
        if levels is None:
            sig = tuple(
                sorted(
                    ((L, int(c.shape[0])) for L, c in self.columns_by_log.items()),
                    reverse=True,
                )
            )
            levels = _commit_tree_jit(sig)(
                *[self.columns_by_log[L] for L, _ in sig]
            )
        self.levels = levels
        assert self.levels[-1].shape[0] == 1

    def level_rows(self, level_idx: int, indices) -> np.ndarray:
        idx = np.asarray(indices, np.int64)
        return np.asarray(self.levels[level_idx][idx], np.uint32)

    def column_rows(self, log_size: int, indices) -> np.ndarray:
        idx = np.asarray(indices, np.int64)
        return np.asarray(self.columns_by_log[log_size][:, idx], np.uint32)


# ---------------------------------------------------------------------------
# stage jits
# ---------------------------------------------------------------------------

def _merge_t(pairs):
    """Concatenate same-log column groups (plonk first, then poseidon)."""
    import jax.numpy as jnp

    out: Dict[int, list] = {}
    for log, cols in pairs:
        out.setdefault(log, []).append(cols)
    return {
        log: (parts[0] if len(parts) == 1 else jnp.concatenate(parts))
        for log, parts in out.items()
    }


def _lde_t(coeffs, target_log):
    return circle_fft.evaluate_traced(circle_fft.extend_traced(coeffs, target_log))


@lru_cache(maxsize=None)
def _stage_trees01_jit(lp: int, lq: int, blowup: int):
    import jax

    perm_p = air.coset_to_domain_perm(lp)
    perm_q = air.coset_to_domain_perm(lq)

    @jax.jit
    def run(plonk_pre, plonk_tr, pos_pre, pos_tr):
        coeffs = {}
        ldes = {}
        for key, rows, perm, log in (
            ("p_pre", plonk_pre, perm_p, lp),
            ("p_tr", plonk_tr, perm_p, lp),
            ("q_pre", pos_pre, perm_q, lq),
            ("q_tr", pos_tr, perm_q, lq),
        ):
            c = circle_fft.interpolate_traced(rows[..., perm])
            coeffs[key] = c
            ldes[key] = _lde_t(c, log + blowup)
        t0 = _commit_levels(
            _merge_t([(lp + blowup, ldes["p_pre"]), (lq + blowup, ldes["q_pre"])])
        )
        t1 = _commit_levels(
            _merge_t([(lp + blowup, ldes["p_tr"]), (lq + blowup, ldes["q_tr"])])
        )
        return coeffs, ldes, t0, t1

    return run


# ---------------------------------------------------------------------------
# AIR evaluation over full-domain columns, via the verifier's lane-vectorized
# implementations (verifier/composition.py evaluate_plonk/evaluate_poseidon:
# stacked 16-lane poseidon state, lax.scan partial rounds, block constraint
# emission).  Tracing the per-wire gadget code (recursion/composition.py)
# builds ~500k StableHLO ops and takes tens of minutes to lower; these
# adapters give the same values (exact M31 algebra, same emission order) in
# a few thousand ops.
# ---------------------------------------------------------------------------

from ..verifier import composition as vcomp


def _q_of_m31(limb) -> QM31:
    z = limb * np.uint32(0)
    return QM31(limb, z, z, z)


class _ProverEval(vcomp._Eval):
    """verifier/composition._Eval with masks sourced from full-domain LDE
    columns: pre/tr are M31 rows (n_cols, N); interaction masks are the 8
    limb columns with the prev-row sample provided by `perm`."""

    def __init__(self, pre, tr, inter, perm, total_sum4, denom_inv_m31,
                 log_size: int, constraints):
        from ..cs import scalar

        self.pre = pre
        self.tr = tr
        self.inter = inter
        self.perm = perm
        self.cursor = [0, 0, 0]
        z = denom_inv_m31 * np.uint32(0)
        self.denom_inverse = QM31(denom_inv_m31, z, z, z)
        self.constraints = constraints
        self.fracs = []
        self.cumsum_shift = q.q_mul_m31(
            _qm31_scalar(total_sum4), np.uint32(scalar.m_inv(1 << log_size))
        )

    # -- mask access over committed columns --------------------------------

    def preprocessed(self) -> QM31:
        col = self.pre[self.cursor[0]]
        self.cursor[0] += 1
        return _q_of_m31(col)

    def trace(self) -> QM31:
        col = self.tr[self.cursor[1]]
        self.cursor[1] += 1
        return _q_of_m31(col)

    def preprocessed_block(self, n: int) -> QM31:
        c = self.cursor[0]
        self.cursor[0] += n
        block = self.pre[c : c + n]  # (n, N)
        t = _t_last(block)
        return QM31(t, t * np.uint32(0), t * np.uint32(0), t * np.uint32(0))

    def trace_block(self, n: int) -> QM31:
        c = self.cursor[1]
        self.cursor[1] += n
        block = self.tr[c : c + n]
        t = _t_last(block)
        return QM31(t, t * np.uint32(0), t * np.uint32(0), t * np.uint32(0))

    def next_extension_mask(self, n: int):
        c = self.cursor[2]
        self.cursor[2] += 4
        limbs = self.inter[c : c + 4]  # (4, N): one QM31 column
        cur = QM31(limbs[0], limbs[1], limbs[2], limbs[3])
        if n == 1:
            return [cur]
        assert n == 2
        prev = QM31(*(limb[self.perm] for limb in limbs))
        return [prev, cur]


def _t_last(block):
    """(n, N) -> (N, n) on either backend."""
    if type(block).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp.moveaxis(block, 0, -1)
    return np.moveaxis(block, 0, -1)


def _qm31_scalar(v4) -> QM31:
    if isinstance(v4, QM31):
        return v4
    return QM31(v4[0], v4[1], v4[2], v4[3])


class _InteractionEval(_ProverEval):
    """Generation mode: collects relation fractions and synthesizes the 8
    interaction limb columns + total sum instead of reading them back
    (column layout per air.InteractionBuilder.finalize_logup)."""

    def __init__(self, pre, tr, n: int):
        self.pre = pre
        self.tr = tr
        self.inter = None
        self.perm = None
        self.cursor = [0, 0, 0]
        self.n = n
        z = np.uint32(0)
        self.denom_inverse = QM31(np.uint32(1), z, z, z)
        self.constraints = _DiscardList()
        self.fracs = []
        self.cumsum_shift = None
        self.columns = None
        self.total_sum = None

    def add_constraint(self, v):  # generation mode: constraints unused
        pass

    def add_constraint_block(self, v):
        pass

    def finalize_logup(self, batch_size: int) -> None:
        from jax.lax import associative_scan

        batched = []
        for k in range(0, len(self.fracs), batch_size):
            chunk = self.fracs[k : k + batch_size]
            p_, q_ = chunk[0]
            for mlt, d in chunk[1:]:
                p_ = q.q_add(q.q_mul(p_, d), q.q_mul(mlt, q_))
                q_ = q.q_mul(q_, d)
            batched.append((p_, q_))
        fracs = [q.q_mul(p_, q.q_inv(q_)) for p_, q_ in batched]

        cols = []
        acc = q.q_zero(fracs[0].a)
        for f in fracs[:-1]:
            acc = q.q_add(acc, f)
            cols.append(acc)
        S = q.q_add(acc, fracs[-1])
        from ..verifier.quotients import m31_modsum
        from ..cs import scalar

        total = QM31(*(m31_modsum(limb, axis=0) for limb in S))
        self.total_sum = total
        shift = q.q_mul_m31(total, np.uint32(scalar.m_inv(self.n)))
        adj = q.q_sub(S, shift)
        last = QM31(*(associative_scan(m31.add, limb) for limb in adj))
        cols.append(last)
        self.columns = [limb for col in cols for limb in col]


class _DiscardList:
    """Constraint sink for generation mode (values are dead code; XLA
    eliminates them)."""

    def append(self, _):
        pass


def _interaction_traced(pre, tr, z4, alpha4, evaluate_fn):
    """(8, N) interaction limb columns + (4,) total sum, lane-vectorized."""
    import jax.numpy as jnp

    n = pre.shape[1]
    lookup = (_qm31_scalar(z4), _qm31_scalar(alpha4))
    ev = _InteractionEval(pre, tr, n)
    evaluate_fn(ev, lookup)
    return jnp.stack(ev.columns), jnp.stack(list(ev.total_sum))


@lru_cache(maxsize=None)
@lru_cache(maxsize=None)
def _table_lde_jit(log: int, blowup: int):
    """Per-table (interpolate -> LDE) jit — used instead of the fused
    stage jits when the LDE domain is large enough that holding every
    table's intermediates in one XLA program exceeds HBM
    (fast_verifier configs: blowup 7-9 -> 2^23-2^24 domains)."""
    import jax

    perm = air.coset_to_domain_perm(log)

    @jax.jit
    def run(rows):
        c = circle_fft.interpolate_traced(rows[..., perm])
        return c, _lde_t(c, log + blowup)

    return run


@lru_cache(maxsize=None)
def _interaction_cols_jit(lp: int, lq: int):
    """Interaction columns + total sums only (base domains — small)."""
    import jax

    @jax.jit
    def run(plonk_pre, plonk_tr, pos_pre, pos_tr, z4, alpha4):
        int_p, tot_p = _interaction_traced(
            plonk_pre, plonk_tr, z4, alpha4, vcomp.evaluate_plonk
        )
        int_q, tot_q = _interaction_traced(
            pos_pre, pos_tr, z4, alpha4, vcomp.evaluate_poseidon
        )
        return int_p, int_q, tot_p, tot_q

    return run


def _stage_interaction_jit(lp: int, lq: int, blowup: int):
    import jax

    perm_p = air.coset_to_domain_perm(lp)
    perm_q = air.coset_to_domain_perm(lq)

    @jax.jit
    def run(plonk_pre, plonk_tr, pos_pre, pos_tr, z4, alpha4):
        int_p, tot_p = _interaction_traced(
            plonk_pre, plonk_tr, z4, alpha4, vcomp.evaluate_plonk
        )
        int_q, tot_q = _interaction_traced(
            pos_pre, pos_tr, z4, alpha4, vcomp.evaluate_poseidon
        )
        c_p = circle_fft.interpolate_traced(int_p[..., perm_p])
        c_q = circle_fft.interpolate_traced(int_q[..., perm_q])
        lde_p = _lde_t(c_p, lp + blowup)
        lde_q = _lde_t(c_q, lq + blowup)
        t2 = _commit_levels(
            _merge_t([(lp + blowup, lde_p), (lq + blowup, lde_q)])
        )
        return (int_p, int_q), (c_p, c_q), (lde_p, lde_q), t2, tot_p, tot_q

    return run


@lru_cache(maxsize=None)
def _stage_composition_jit(spec: VerifierSpec):
    import jax

    from .prove import _point_sub_step_perm

    lp, lq = spec.log_size_plonk, spec.log_size_poseidon
    bound = spec.composition_log_degree_bound
    blowup = spec.log_blowup_factor
    perm_sub = {
        log: _point_sub_step_perm(bound, ccircle.Coset.odds(log).step_index)
        for log in (lp, lq)
    }
    x_dom, _ = circle_fft.domain_points_bit_reversed(bound)

    @jax.jit
    def run(c_pre_p, c_tr_p, c_int_p, c_pre_q, c_tr_q, c_int_q,
            z4, alpha4, rc4, tot_p4, tot_q4):
        import jax.numpy as jnp

        lookup = (_qm31_scalar(z4), _qm31_scalar(alpha4))
        constraints = []

        for (c_pre, c_tr, c_int, total, log, is_plonk) in (
            (c_pre_p, c_tr_p, c_int_p, tot_p4, lp, True),
            (c_pre_q, c_tr_q, c_int_q, tot_q4, lq, False),
        ):
            pre_l = _lde_t(c_pre, bound)
            tr_l = _lde_t(c_tr, bound)
            int_l = _lde_t(c_int, bound)

            # vanishing denominator: pi^(log-1)(x), constant-folded on host
            v = x_dom
            for _ in range(log - 1):
                sq = m31.mul(v, v)
                v = m31.sub(m31.add(sq, sq), np.uint32(1))
            denom_inv = m31.inv(jnp.asarray(v))

            ev = _ProverEval(
                pre_l, tr_l, int_l, perm_sub[log], total, denom_inv,
                log, constraints,
            )
            if is_plonk:
                vcomp.evaluate_plonk(ev, lookup)
            else:
                vcomp.evaluate_poseidon(ev, lookup)

        acc = vcomp._horner(constraints, _qm31_scalar(rc4))
        comp = jnp.stack(list(acc))  # (4, 2^bound)
        comp_coeffs = circle_fft.interpolate_traced(comp)
        half = 1 << (bound - 1)
        split_coeffs = jnp.concatenate(
            [comp_coeffs[:, :half], comp_coeffs[:, half:]]
        )  # (8, 2^(bound-1)): left limbs then right limbs
        comp_lde = _lde_t(split_coeffs, bound - 1 + blowup)
        t3 = _commit_levels({bound - 1 + blowup: comp_lde})
        return split_coeffs, comp_lde, t3

    return run


@lru_cache(maxsize=None)
def _composition_coeffs_jit(spec: VerifierSpec):
    """Composition AIR evaluation + interpolation only (2^bound domain —
    small even at huge blowups).  Used by the host prover flow so the
    composition phase rides the device while the (possibly enormous) comp
    LDE runs through the size-routed host FFT.  Returns the (8, 2^(bound-1))
    split coefficient block (left limbs then right limbs)."""
    import jax

    from .prove import _point_sub_step_perm

    lp, lq = spec.log_size_plonk, spec.log_size_poseidon
    bound = spec.composition_log_degree_bound
    perm_sub = {
        log: _point_sub_step_perm(bound, ccircle.Coset.odds(log).step_index)
        for log in (lp, lq)
    }
    x_dom, _ = circle_fft.domain_points_bit_reversed(bound)

    @jax.jit
    def run(c_pre_p, c_tr_p, c_int_p, c_pre_q, c_tr_q, c_int_q,
            z4, alpha4, rc4, tot_p4, tot_q4):
        import jax.numpy as jnp

        lookup = (_qm31_scalar(z4), _qm31_scalar(alpha4))
        constraints = []
        for (c_pre, c_tr, c_int, total, log, is_plonk) in (
            (c_pre_p, c_tr_p, c_int_p, tot_p4, lp, True),
            (c_pre_q, c_tr_q, c_int_q, tot_q4, lq, False),
        ):
            pre_l = _lde_t(c_pre, bound)
            tr_l = _lde_t(c_tr, bound)
            int_l = _lde_t(c_int, bound)
            v = x_dom
            for _ in range(log - 1):
                sq = m31.mul(v, v)
                v = m31.sub(m31.add(sq, sq), np.uint32(1))
            denom_inv = m31.inv(jnp.asarray(v))
            ev = _ProverEval(
                pre_l, tr_l, int_l, perm_sub[log], total, denom_inv,
                log, constraints,
            )
            if is_plonk:
                vcomp.evaluate_plonk(ev, lookup)
            else:
                vcomp.evaluate_poseidon(ev, lookup)

        acc = vcomp._horner(constraints, _qm31_scalar(rc4))
        comp = jnp.stack(list(acc))
        comp_coeffs = circle_fft.interpolate_traced(comp)
        half = 1 << (bound - 1)
        return jnp.concatenate([comp_coeffs[:, :half], comp_coeffs[:, half:]])

    return run


@lru_cache(maxsize=None)
def _dev_domain(log_size: int):
    """Device copies of the bit-reversed circle-domain points."""
    import jax.numpy as jnp

    x, y = circle_fft.domain_points_bit_reversed(log_size)
    return jnp.asarray(x), jnp.asarray(y)


@lru_cache(maxsize=None)
def _stage_quotients_jit(spec: VerifierSpec):
    import jax

    from ..verifier import quotients as vquot

    logs = spec.all_log_sizes

    @jax.jit
    def run(ldes_by_log, samples_flat, oods8, after4, doms):
        group_evals = {}
        px = QM31(*(oods8[i][None] for i in range(4)))
        py = QM31(*(oods8[4 + i][None] for i in range(4)))
        after = QM31(*(after4[i][None] for i in range(4)))
        for g, L in enumerate(logs):
            rows = ldes_by_log[L].T[None]  # (1, N, n_cols)
            dx, dy = doms[L]
            ans = vquot.fri_answers_for_group(
                spec, g, (px, py), after,
                samples_flat[None], rows, dx[None], dy[None],
            )
            group_evals[L] = QM31(*(c[0] for c in ans))
        first_cols = {L: fri._q_limbs(ev) for L, ev in group_evals.items()}
        levels = _commit_levels(first_cols)
        return group_evals, levels

    return run


@lru_cache(maxsize=None)
def _fold_line_jit(level: int):
    import jax

    @jax.jit
    def run(g4, alpha4):
        g = QM31(g4[0], g4[1], g4[2], g4[3])
        alpha = QM31(alpha4[0], alpha4[1], alpha4[2], alpha4[3])
        xinv = fri.line_fold_xinv(level)
        l = QM31(*(c[0::2] for c in g))
        r = QM31(*(c[1::2] for c in g))
        f0 = q.q_add(l, r)
        f1 = q.q_mul_m31(q.q_sub(l, r), xinv)
        out = q.q_add(f0, q.q_mul(f1, alpha))
        import jax.numpy as jnp

        return jnp.stack(list(out))

    return run


@lru_cache(maxsize=None)
def _join_commit_jit(level: int, join_log, first: bool):
    """Fold the joining group in (if any), accumulate, commit at `level`."""
    import jax

    @jax.jit
    def run(g4, join4, a2_4, alpha_fold4):
        import jax.numpy as jnp

        g = QM31(g4[0], g4[1], g4[2], g4[3])
        if join_log is not None:
            join = QM31(join4[0], join4[1], join4[2], join4[3])
            yinv = fri.circle_fold_yinv(join_log)
            l = QM31(*(c[0::2] for c in join))
            r = QM31(*(c[1::2] for c in join))
            alpha = QM31(
                alpha_fold4[0], alpha_fold4[1], alpha_fold4[2], alpha_fold4[3]
            )
            fold_in = q.q_add(
                q.q_add(l, r),
                q.q_mul(q.q_mul_m31(q.q_sub(l, r), yinv), alpha),
            )
            if first:
                g = fold_in
            else:
                a2 = QM31(a2_4[0], a2_4[1], a2_4[2], a2_4[3])
                g = q.q_add(q.q_mul(a2, g), fold_in)
        g4_out = jnp.stack(list(g))
        levels = _commit_levels({level: g4_out})
        return g4_out, levels

    return run


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------

def prove_device(trace: dict, config: PcsConfig, progress=None) -> PlonkWithPoseidonProof:
    import jax.numpy as jnp
    import logging

    from . import device as _device_cache

    _device_cache._jnp()  # enable the persistent compilation cache

    plog = progress or logging.getLogger(__name__).debug
    blowup = config.fri_config.log_blowup_factor

    # ---- build AIR columns (row order, host) ----
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

    channel = PoseidonChannel()

    # ---- upload once ----
    d_plonk_pre = jnp.asarray(plonk_pre)
    d_plonk_tr = jnp.asarray(plonk_tr)
    d_pos_pre = jnp.asarray(pos_pre)
    d_pos_tr = jnp.asarray(pos_tr)

    # Large LDE domains (fast_verifier blowups): one fused XLA program per
    # stage holds every table's FFT intermediates + LDEs + tree levels live
    # at once and exceeds HBM (observed: 24G needed at 2^23 vs 15.75G).
    # Split into per-table / per-tree programs so buffers free between
    # calls; steady-state live set is just LDEs + levels (~7G at 2^23).
    big = max(lp, lq, bound - 1) + blowup >= int(
        __import__("os").environ.get("RSTPU_DEVICE_BIG_LOG", "23")
    )

    # ---- trees 0 + 1 (no channel draw between them) ----
    if big:
        coeffs, ldes = {}, {}
        for key, rows, log in (
            ("p_pre", d_plonk_pre, lp),
            ("p_tr", d_plonk_tr, lp),
            ("q_pre", d_pos_pre, lq),
            ("q_tr", d_pos_tr, lq),
        ):
            coeffs[key], ldes[key] = _table_lde_jit(log, blowup)(rows)
        tree0 = DeviceTree(
            _merge_t([(lp + blowup, ldes["p_pre"]), (lq + blowup, ldes["q_pre"])])
        )
        tree1 = DeviceTree(
            _merge_t([(lp + blowup, ldes["p_tr"]), (lq + blowup, ldes["q_tr"])])
        )
    else:
        coeffs, ldes, t0_levels, t1_levels = _stage_trees01_jit(lp, lq, blowup)(
            d_plonk_pre, d_plonk_tr, d_pos_pre, d_pos_tr
        )
        tree0 = DeviceTree(
            _merge_t([(lp + blowup, ldes["p_pre"]), (lq + blowup, ldes["q_pre"])]),
            levels=t0_levels,
        )
        tree1 = DeviceTree(
            _merge_t([(lp + blowup, ldes["p_tr"]), (lq + blowup, ldes["q_tr"])]),
            levels=t1_levels,
        )
    channel.mix_root(tree0.root)
    plog("tree0 (preprocessed) committed")
    channel.mix_one_felt([lp, 0, 0, 0])
    channel.mix_one_felt([lq, 0, 0, 0])
    channel.mix_root(tree1.root)
    plog("tree1 (trace) committed")

    z4, alpha4 = channel.draw_felts()

    # ---- interaction columns + tree 2 ----
    if big:
        int_p, int_q, tot_p, tot_q = _interaction_cols_jit(lp, lq)(
            d_plonk_pre, d_plonk_tr, d_pos_pre, d_pos_tr,
            jnp.asarray(z4), jnp.asarray(alpha4),
        )
        c_int_p, lde_int_p = _table_lde_jit(lp, blowup)(int_p)
        c_int_q, lde_int_q = _table_lde_jit(lq, blowup)(int_q)
        plonk_total = np.asarray(tot_p, np.uint32)
        pos_total = np.asarray(tot_q, np.uint32)
        plog("interaction columns generated")
        channel.mix_two_felts(plonk_total, pos_total)
        tree2 = DeviceTree(
            _merge_t([(lp + blowup, lde_int_p), (lq + blowup, lde_int_q)])
        )
    else:
        (int_p, int_q), (c_int_p, c_int_q), (lde_int_p, lde_int_q), t2_levels, tot_p, tot_q = (
            _stage_interaction_jit(lp, lq, blowup)(
                d_plonk_pre, d_plonk_tr, d_pos_pre, d_pos_tr,
                jnp.asarray(z4), jnp.asarray(alpha4),
            )
        )
        plonk_total = np.asarray(tot_p, np.uint32)
        pos_total = np.asarray(tot_q, np.uint32)
        plog("interaction columns generated")
        channel.mix_two_felts(plonk_total, pos_total)
        tree2 = DeviceTree(
            _merge_t([(lp + blowup, lde_int_p), (lq + blowup, lde_int_q)]),
            levels=t2_levels,
        )
    channel.mix_root(tree2.root)
    plog("tree2 (interaction) committed")

    random_coeff4 = channel.draw_felt()

    # ---- composition polynomial + tree 3 ----
    split_coeffs, comp_lde, t3_levels = _stage_composition_jit(spec)(
        coeffs["p_pre"], coeffs["p_tr"], c_int_p,
        coeffs["q_pre"], coeffs["q_tr"], c_int_q,
        jnp.asarray(z4), jnp.asarray(alpha4), jnp.asarray(random_coeff4),
        tot_p, tot_q,
    )
    plog("composition evals computed")
    tree3 = DeviceTree({bound - 1 + blowup: comp_lde}, levels=t3_levels)
    channel.mix_root(tree3.root)
    plog("tree3 (composition) committed")

    oods_t4 = channel.draw_felt()
    from .prove import (
        _add_const,
        _assemble_samples,
        _factors_at_point,
        _oods_point,
    )

    oods = _oods_point(oods_t4)

    # ---- OODS samples (device sampling, host factors) ----
    from . import device as device_mod

    col_coeffs = {
        (0, "p"): coeffs["p_pre"],
        (0, "q"): coeffs["q_pre"],
        (1, "p"): coeffs["p_tr"],
        (1, "q"): coeffs["q_tr"],
        (2, "p"): c_int_p,
        (2, "q"): c_int_q,
        (3, "c"): split_coeffs,
    }
    shifted = {}
    for log in (lp, lq):
        step = ccircle.CanonicCoset(log).step()
        shifted[log] = _add_const(oods, ccircle.point_neg(step))

    samples_at = {}
    for key, cfs in col_coeffs.items():
        t, tag = key
        deg_log = cfs.shape[1].bit_length() - 1
        samples_at[(key, 0)] = np.asarray(
            device_mod._sample_jit(deg_log)(
                cfs, np.asarray(_factors_at_point(deg_log, oods), np.uint32)
            )
        )
        if t == 2:
            samples_at[(key, -1)] = np.asarray(
                device_mod._sample_jit(deg_log)(
                    cfs,
                    np.asarray(
                        _factors_at_point(
                            deg_log, shifted[lp if tag == "p" else lq]
                        ),
                        np.uint32,
                    ),
                )
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

    # ---- FRI first layer quotients on the commitment domains ----
    ldes_by_log = _merge_t(
        [
            (lp + blowup, ldes["p_pre"]),
            (lq + blowup, ldes["q_pre"]),
            (lp + blowup, ldes["p_tr"]),
            (lq + blowup, ldes["q_tr"]),
            (lp + blowup, lde_int_p),
            (lq + blowup, lde_int_q),
            (bound - 1 + blowup, comp_lde),
        ]
    )
    # group column order must match spec.group_columns: tree-major per log —
    # _merge_t appends in call order which is tree 0,1,2,3 within each log.
    samples_flat = np.concatenate(
        [col for tree in sampled_values for col in tree]
    ).astype(np.uint32)
    oods8 = np.concatenate(
        [np.asarray(oods[0], np.uint32), np.asarray(oods[1], np.uint32)]
    )
    doms = {L: _dev_domain(L) for L in spec.all_log_sizes}
    plog("quotients jit dispatch")
    group_evals, first_levels = _stage_quotients_jit(spec)(
        ldes_by_log, jnp.asarray(samples_flat), jnp.asarray(oods8),
        jnp.asarray(np.asarray(after_coeff4, np.uint32)), doms,
    )

    stark_proof = _fri_tail_device(
        spec, config, channel, [tree0, tree1, tree2, tree3],
        group_evals, first_levels, sampled_values, plog,
    )
    return PlonkWithPoseidonProof(
        log_size_plonk=lp,
        log_size_poseidon=lq,
        plonk_total_sum=np.array(plonk_total, np.uint32),
        poseidon_total_sum=np.array(pos_total, np.uint32),
        config=config,
        stark_proof=stark_proof,
    )


def _fri_tail_device(spec, config, channel, trees, group_evals, first_levels,
                     sampled_values, plog):
    """FRI phase with device-resident layers (mirrors prove._fri_tail)."""
    import jax.numpy as jnp

    from ..proof.containers import FriLayerProof, FriProof, StarkProof
    from ..cs import scalar

    plog("FRI first-layer quotients computed")
    first_tree = DeviceTree(
        {L: fri._q_limbs(ev) for L, ev in group_evals.items()},
        levels=first_levels,
    )
    channel.mix_root(first_tree.root)
    alphas = [tuple(int(x) for x in channel.draw_felt())]
    M = spec.max_first_layer_log

    inner_trees: List[DeviceTree] = []
    inner_evals: List[QM31] = []
    g4 = jnp.zeros((4, 1 << (M - 1)), jnp.uint32)
    level = M - 1
    for i in range(spec.n_inner_layers):
        L = M - i
        alpha = alphas[i]
        a2 = scalar.q_mul(alpha, alpha)
        join_log = L if L in group_evals else None
        join4 = (
            fri._q_limbs(group_evals[L])
            if join_log is not None
            else jnp.zeros((4, 1), jnp.uint32)
        )
        g4, tree_levels = _join_commit_jit(level, join_log, i == 0)(
            g4, join4,
            np.asarray(a2, np.uint32),
            np.asarray(alphas[M - L], np.uint32) if join_log is not None
            else np.zeros(4, np.uint32),
        )
        tree_i = DeviceTree({level: g4}, levels=tree_levels)
        inner_trees.append(tree_i)
        inner_evals.append(QM31(g4[0], g4[1], g4[2], g4[3]))
        channel.mix_root(tree_i.root)
        alphas.append(tuple(int(x) for x in channel.draw_felt()))
        g4 = _fold_line_jit(level)(g4, np.asarray(alphas[i + 1], np.uint32))
        level -= 1

    # ---- last layer (host: the folded evals are small by now) ----
    g_host = QM31(*(np.asarray(c, np.uint32) for c in (g4[0], g4[1], g4[2], g4[3])))
    last_bound = config.fri_config.log_last_layer_degree_bound
    n_last = 1 << last_bound
    last_full = fri.line_interpolate(g_host, level)
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

    # ---- PoW + queries (host) ----
    plog("FRI layers committed; grinding PoW")
    nonce = channel.grind_pow(config.pow_bits)
    plog("PoW ground")
    channel.mix_u64(nonce)
    raw_queries: List[int] = []
    for _ in range(-(-config.fri_config.n_queries // 8)):
        a, b = channel.draw_felts()
        raw_queries.extend(int(x) for x in a)
        raw_queries.extend(int(x) for x in b)
    raw_queries = [
        v & ((1 << M) - 1) for v in raw_queries[: config.fri_config.n_queries]
    ]

    # ---- decommitments (plan + batched gathers) ----
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
        inner_layers.append(
            FriLayerProof(
                fri_witness=fri.inner_layer_witness(inner_evals[i], cur_queries),
                decommitment=fri.decommit_pair(inner_trees[i], cur_queries),
                commitment=inner_trees[i].root,
            )
        )
        cur_queries = [v >> 1 for v in cur_queries]

    return StarkProof(
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
