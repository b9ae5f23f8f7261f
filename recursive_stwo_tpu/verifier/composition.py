"""In-point AIR evaluation: the composition polynomial check at the OODS
point, batched over proofs.

TPU-first structure: the 16-lane poseidon state lives as stacked (B, 16)
QM31 tensors, partial rounds run as one lax.scan, and the Horner
accumulation over ALL emitted constraints (exact reference emission order)
is a single scan over the stacked constraint axis.

Ports, in emission order:
  evaluate_plonk    /root/reference/components/recursive/composition/src/plonk.rs
  evaluate_poseidon /root/reference/components/recursive/composition/src/poseidon.rs
  logup framework   /root/reference/components/recursive/composition/src/data_structures.rs
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..core import m31
from ..core import qm31 as q
from ..core.poseidon2 import MAT_DIAG16_M_1
from ..core.qm31 import QM31
from . import points as points_mod
from .quotients import m31_modsum
from .spec import (
    N_INTERACTION_PLONK,
    N_PREPROCESSED_PLONK,
    N_TRACE_PLONK,
    VerifierSpec,
)


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _is_jax(arr):
    return not isinstance(arr, np.ndarray)


def _q_stack(parts: List[QM31], axis=-1) -> QM31:
    xp = _xp(parts[0].a)
    return QM31(
        *(xp.stack([p[i] for p in parts], axis=axis) for i in range(4))
    )


def q_modsum_axis(x: QM31, axis: int) -> QM31:
    return QM31(*(m31_modsum(comp, axis) for comp in x))


class _Eval:
    """EvalAtRowVar equivalent; constraints are collected (already scaled by
    this component's 1/vanishing) and Horner-accumulated at the end."""

    def __init__(
        self,
        spec: VerifierSpec,
        samples_flat,
        tree_col_base,
        total_sum: QM31,
        denom_inverse: QM31,
        log_size: int,
        constraints: List[QM31],
    ):
        self.spec = spec
        self.samples = samples_flat
        self.base = tree_col_base
        self.cursor = [0, 0, 0]
        self.denom_inverse = denom_inverse
        self.constraints = constraints
        self.fracs: List[tuple] = []
        inv2n = m31.inv(np.uint32(1 << log_size))
        self.cumsum_shift = q.q_mul_m31(total_sum, inv2n)

    # -- mask access ---------------------------------------------------------

    def _sample_idx(self, tree: int, col: int, k: int) -> int:
        return self.spec.sample_offsets[tree][col] + k

    def _gather(self, idxs) -> QM31:
        xp = _xp(self.samples)
        s = self.samples[:, xp.asarray(np.array(idxs, np.int64))]
        return QM31(s[..., 0], s[..., 1], s[..., 2], s[..., 3])

    def next_mask(self, tree: int, n: int = 1):
        col = self.base[tree] + self.cursor[tree]
        self.cursor[tree] += 1
        return [
            self._gather([self._sample_idx(tree, col, k)]) for k in range(n)
        ]

    def preprocessed(self) -> QM31:
        v = self.next_mask(0)[0]
        return QM31(*(c[:, 0] for c in v))

    def trace(self) -> QM31:
        v = self.next_mask(1)[0]
        return QM31(*(c[:, 0] for c in v))

    def preprocessed_block(self, n: int) -> QM31:
        """n consecutive preprocessed columns, stacked (B, n)."""
        cols = [self.base[0] + self.cursor[0] + i for i in range(n)]
        self.cursor[0] += n
        return self._gather([self._sample_idx(0, c, 0) for c in cols])

    def trace_block(self, n: int) -> QM31:
        cols = [self.base[1] + self.cursor[1] + i for i in range(n)]
        self.cursor[1] += n
        return self._gather([self._sample_idx(1, c, 0) for c in cols])

    def next_extension_mask(self, n: int):
        cols = [self.next_mask(2, n) for _ in range(4)]
        out = []
        for k in range(n):
            vals = [QM31(*(c[:, 0] for c in cols[j][k])) for j in range(4)]
            out.append(q.q_combine4(*vals))
        return out

    # -- constraints / logup -------------------------------------------------

    def add_constraint(self, v: QM31):
        """Scalar (B,) constraint."""
        self.constraints.append(
            QM31(*(c[:, None] for c in q.q_mul(v, self.denom_inverse)))
        )

    def add_constraint_block(self, v: QM31):
        """Stacked (B, n) constraints, emitted in lane order."""
        d = self.denom_inverse
        db = QM31(*(c[:, None] for c in d))
        self.constraints.append(q.q_mul(v, db))

    def add_to_relation(self, lookup, mult: QM31, values: List[QM31]):
        z, alpha = lookup
        denom = values[0]
        apow = None
        for v in values[1:]:
            apow = alpha if apow is None else q.q_mul(apow, alpha)
            denom = q.q_add(denom, q.q_mul(apow, v))
        denom = q.q_sub(denom, z)
        self.fracs.append((mult, denom))

    def finalize_logup(self, batch_size: int):
        batched = []
        for i in range(0, len(self.fracs), batch_size):
            chunk = self.fracs[i : i + batch_size]
            p, qq = chunk[0]
            for num, den in chunk[1:]:
                p = q.q_add(q.q_mul(p, den), q.q_mul(num, qq))
                qq = q.q_mul(qq, den)
            batched.append((p, qq))
        prev_col_cumsum = q.q_zero(self.denom_inverse.a)
        for num, den in batched[:-1]:
            (cur,) = self.next_extension_mask(1)
            diff = q.q_sub(cur, prev_col_cumsum)
            prev_col_cumsum = cur
            self.add_constraint(q.q_sub(q.q_mul(diff, den), num))
        num, den = batched[-1]
        prev_row, cur = self.next_extension_mask(2)
        diff = q.q_sub(q.q_sub(cur, prev_row), prev_col_cumsum)
        fixed = q.q_add(diff, self.cumsum_shift)
        self.add_constraint(q.q_sub(q.q_mul(fixed, den), num))


# ---------------------------------------------------------------------------
# plonk AIR
# ---------------------------------------------------------------------------

def evaluate_plonk(ev: _Eval, lookup):
    a_wire = ev.preprocessed()
    b_wire = ev.preprocessed()
    c_wire = ev.preprocessed()
    op = ev.preprocessed()
    mult_a = ev.preprocessed()
    mult_b = ev.preprocessed()
    mult_c = ev.preprocessed()
    poseidon_wire = ev.preprocessed()
    mult_poseidon = ev.preprocessed()
    enforce_c_m31 = ev.preprocessed()

    vals = [ev.trace() for _ in range(12)]
    a, b, c = vals[0:4], vals[4:8], vals[8:12]

    ev.add_constraint(q.q_mul(enforce_c_m31, c[1]))
    ev.add_constraint(q.q_mul(enforce_c_m31, c[2]))
    ev.add_constraint(q.q_mul(enforce_c_m31, c[3]))

    a_val = q.q_combine4(*a)
    b_val = q.q_combine4(*b)
    c_val = q.q_combine4(*c)

    one = q.q_one(op.a)
    gate = q.q_sub(
        q.q_sub(c_val, q.q_mul(op, q.q_add(a_val, b_val))),
        q.q_mul(q.q_mul(q.q_sub(one, op), a_val), b_val),
    )
    ev.add_constraint(gate)

    ev.add_to_relation(lookup, mult_a, [a_val, a_wire])
    ev.add_to_relation(lookup, mult_b, [b_val, b_wire])
    ev.add_to_relation(lookup, mult_c, [c_val, c_wire])
    ev.add_to_relation(lookup, q.q_neg(mult_poseidon), [poseidon_wire, a_val, b_val])
    ev.finalize_logup(2)


# ---------------------------------------------------------------------------
# PlonkWithoutPoseidon AIR (verifier-array mirror of
# recursion/composition.py::evaluate_plonk_np; same emission order)
# ---------------------------------------------------------------------------

def _m4_list(h):
    t0 = q.q_add(h[0], h[1])
    t1 = q.q_add(h[2], h[3])
    t2 = q.q_add(q.q_add(h[1], h[1]), t1)
    t3 = q.q_add(q.q_add(h[3], h[3]), t0)
    t02 = q.q_add(t0, t0)
    t12 = q.q_add(t1, t1)
    t4 = q.q_add(q.q_add(t12, t12), t3)
    t5 = q.q_add(q.q_add(t02, t02), t2)
    return [q.q_add(t3, t5), t5, q.q_add(t2, t4), t4]


def evaluate_plonk_np(ev: _Eval, lookup):
    pre = [ev.preprocessed() for _ in range(8)]
    a_wire, b_wire, c_wire, op1, op2, op3, op4, mult_c = pre
    vals = [ev.trace() for _ in range(12)]
    a4, b4, c4 = vals[0:4], vals[4:8], vals[8:12]

    one = q.q_one(op1.a)
    for k in range(4):
        a2 = q.q_mul(a4[k], a4[k])
        ev.add_constraint(q.q_mul(op2, q.q_sub(q.q_mul(a2, a2), b4[k])))

    h = [q.q_mul(a4[k], b4[k]) for k in range(4)]
    m4 = _m4_list(h)
    gs = q.q_add(
        q.q_add(q.q_add(a4[0], a4[1]), q.q_add(a4[2], a4[3])),
        q.q_add(q.q_add(b4[0], b4[1]), q.q_add(b4[2], b4[3])),
    )

    a_val = q.q_combine4(*a4)
    b_val = q.q_combine4(*b4)
    c_val = q.q_combine4(*c4)

    one_m_op3 = q.q_sub(one, op3)
    one_m_op4 = q.q_sub(one, op4)
    is_arith = q.q_mul(one_m_op3, one_m_op4)
    is_m4 = q.q_mul(op3, one_m_op4)
    is_hadamard = q.q_mul(one_m_op3, op4)
    is_grandsum = q.q_mul(op3, op4)

    expected = q.q_add(
        q.q_add(
            q.q_add(
                q.q_mul(is_arith, q.q_mul(op1, q.q_add(a_val, b_val))),
                q.q_mul(q.q_mul(q.q_sub(one, op1), a_val), b_val),
            ),
            q.q_mul(is_m4, q.q_combine4(*m4)),
        ),
        q.q_add(
            q.q_mul(is_hadamard, q.q_combine4(*h)),
            q.q_mul(is_grandsum, q.q_combine4(gs, gs, gs, gs)),
        ),
    )
    ev.add_constraint(q.q_sub(c_val, expected))

    ev.add_to_relation(lookup, one, [a_val, a_wire])
    ev.add_to_relation(lookup, one, [b_val, b_wire])
    ev.add_to_relation(lookup, mult_c, [c_val, c_wire])
    ev.finalize_logup(2)


def composition_check_np(
    spec,
    samples_flat,
    total_sum: QM31,
    lookup,
    random_coeff: QM31,
    oods,
):
    """(B,) bool composition identity for the without-poseidon AIR."""
    oods_x, _ = oods
    constraints: List[QM31] = []
    denom_inv = q.q_inv(
        points_mod.coset_vanishing_canonic(oods_x, spec.log_size)
    )
    ev = _Eval(
        spec, samples_flat, (0, 0, 0), total_sum,
        denom_inv, spec.log_size, constraints,
    )
    evaluate_plonk_np(ev, lookup)

    computed = _horner(constraints, random_coeff)

    def comp_sample(col):
        idx = spec.sample_offsets[3][col]
        s = samples_flat[:, idx]
        return QM31(s[:, 0], s[:, 1], s[:, 2], s[:, 3])

    left = q.q_combine4(*[comp_sample(i) for i in range(4)])
    right = q.q_combine4(*[comp_sample(i) for i in range(4, 8)])
    xpow = points_mod.repeated_double_x(
        oods_x, spec.composition_log_degree_bound - 2
    )
    expected = q.q_add(left, q.q_mul(right, xpow))

    eq = computed.a == expected.a
    for comp_c, comp_e in zip(computed[1:], expected[1:]):
        eq = eq & (comp_c == comp_e)
    return eq


# ---------------------------------------------------------------------------
# poseidon AIR (stacked 16-lane state)
# ---------------------------------------------------------------------------

def _q_mds16(s: QM31) -> QM31:
    """External round matrix on (B, 16) QM31 state (cf. poseidon2.mds16)."""
    xp = _xp(s.a)
    g = QM31(*(c.reshape(c.shape[:-1] + (4, 4)) for c in s))
    x0 = QM31(*(c[..., 0] for c in g))
    x1 = QM31(*(c[..., 1] for c in g))
    x2 = QM31(*(c[..., 2] for c in g))
    x3 = QM31(*(c[..., 3] for c in g))
    t0 = q.q_add(x0, x1)
    t1 = q.q_add(x2, x3)
    t2 = q.q_add(q.q_add(x1, x1), t1)
    t3 = q.q_add(q.q_add(x3, x3), t0)
    t4 = q.q_add(q.q_add(q.q_add(t1, t1), q.q_add(t1, t1)), t3)
    t5 = q.q_add(q.q_add(q.q_add(t0, t0), q.q_add(t0, t0)), t2)
    t6 = q.q_add(t3, t5)
    t7 = q.q_add(t2, t4)
    t = QM31(
        *(
            xp.stack([a, b, c, d], axis=-1)
            for a, b, c, d in zip(t6, t5, t7, t4)
        )
    )
    sums = q_modsum_axis(t, -2)  # (B, 4)
    out = q.q_add(t, QM31(*(c[..., None, :] for c in sums)))
    return QM31(*(c.reshape(s.a.shape) for c in out))


def _q_internal(s: QM31) -> QM31:
    """Internal round matrix: out = total + s * diag  (diag = 2^{i+1}+1
    encoded exactly by MAT_DIAG16_M_1, matching the reference's special-cased
    lane 0)."""
    total = q_modsum_axis(s, -1)
    scaled = QM31(*(m31.mul(c, MAT_DIAG16_M_1) for c in s))
    return q.q_add(scaled, QM31(*(c[..., None] for c in total)))


def _q_pow5(x: QM31) -> QM31:
    x2 = q.q_mul(x, x)
    return q.q_mul(q.q_mul(x2, x2), x)


def _lane(s: QM31, i: int) -> QM31:
    return QM31(*(c[..., i] for c in s))


def _lanes(s: QM31, sl) -> QM31:
    return QM31(*(c[..., sl] for c in s))


def evaluate_poseidon(ev: _Eval, lookup):
    is_first = ev.preprocessed()
    is_last = ev.preprocessed()
    is_full = ev.preprocessed()
    one = q.q_one(is_first.a)
    is_not_first = q.q_sub(one, is_first)
    is_not_last = q.q_sub(one, is_last)
    is_partial = q.q_sub(is_not_first, is_full)

    round_id = ev.preprocessed()
    rc0 = ev.preprocessed_block(16)  # (B, 16)
    rc1 = ev.preprocessed_block(16)
    ext1 = ev.preprocessed()
    ext2 = ev.preprocessed()
    ext1_nz = ev.preprocessed()
    ext2_nz = ev.preprocessed()
    swap_bit_addr = _lane(rc0, 0)

    in_state = ev.trace_block(16)  # (B, 16)
    inter = ev.trace_block(16)
    out_state = ev.trace_block(16)
    swap_bit_value = _lane(inter, 0)

    xp = _xp(in_state.a)

    def bc(x: QM31) -> QM31:  # (B,) -> (B, 1)
        return QM31(*(c[..., None] for c in x))

    # first round: swap halves + external matrix
    sw = bc(swap_bit_value)
    nsw = bc(q.q_sub(one, swap_bit_value))
    rolled = QM31(
        *(xp.concatenate([c[..., 8:], c[..., :8]], axis=-1) for c in in_state)
    )
    permuted = q.q_add(q.q_mul(in_state, nsw), q.q_mul(rolled, sw))
    permuted = _q_mds16(permuted)
    ev.add_constraint_block(q.q_mul(bc(is_first), q.q_sub(permuted, out_state)))

    # full round
    frs = _q_pow5(q.q_add(in_state, rc0))
    ev.add_constraint_block(q.q_mul(bc(is_full), q.q_sub(inter, frs)))
    frs = _q_pow5(q.q_add(_q_mds16(inter), rc1))
    frs = _q_mds16(frs)
    ev.add_constraint_block(q.q_mul(bc(is_full), q.q_sub(out_state, frs)))

    # partial rounds: scan over the 14 rounds
    inter14 = QM31(*(xp.moveaxis(c[..., :14], -1, 0) for c in inter))  # (14, B)
    rc014 = QM31(*(xp.moveaxis(c[..., :14], -1, 0) for c in rc0))

    if _is_jax(in_state.a):
        import jax

        def body(prs, inp):
            inter_r, rc_r = inp
            c_r = q.q_sub(inter_r, _q_pow5(q.q_add(_lane(prs, 0), rc_r)))
            prs = QM31(
                *(
                    xp.concatenate([ir[..., None], pc[..., 1:]], axis=-1)
                    for ir, pc in zip(inter_r, prs)
                )
            )
            prs = _q_internal(prs)
            return prs, c_r

        prs, c_partial = jax.lax.scan(body, in_state, (inter14, rc014))
    else:
        prs = in_state
        c_list = []
        for r in range(14):
            inter_r = QM31(*(c[r] for c in inter14))
            rc_r = QM31(*(c[r] for c in rc014))
            c_r = q.q_sub(inter_r, _q_pow5(q.q_add(_lane(prs, 0), rc_r)))
            c_list.append(c_r)
            prs = QM31(
                *(
                    np.concatenate([ir[..., None], pc[..., 1:]], axis=-1)
                    for ir, pc in zip(inter_r, prs)
                )
            )
            prs = _q_internal(prs)
        c_partial = QM31(*(np.stack([c[i] for c in c_list]) for i in range(4)))

    # (14, B) -> (B, 14) constraint block, then the 16 output constraints
    c_partial = QM31(*(xp.moveaxis(c, 0, -1) for c in c_partial))
    ev.add_constraint_block(q.q_mul(bc(is_partial), c_partial))
    ev.add_constraint_block(q.q_mul(bc(is_partial), q.q_sub(out_state, prs)))

    # lookup relations
    in_left_id = q.q_add(round_id, round_id)
    in_right_id = q.q_add(in_left_id, one)
    out_left_id = q.q_add(in_right_id, one)
    out_right_id = q.q_add(out_left_id, one)

    def quarter(s: QM31, i: int) -> QM31:
        v = _lanes(s, slice(4 * i, 4 * i + 4))
        return q.q_combine4(*(_lane(v, j) for j in range(4)))

    sel = q.q_mul(ext1_nz, is_first)
    rid = q.q_add(q.q_mul(is_first, ext1), q.q_mul(is_not_first, in_left_id))
    ev.add_to_relation(
        lookup, q.q_sub(sel, is_not_first),
        [rid, quarter(in_state, 0), quarter(in_state, 1)],
    )

    sel = q.q_mul(ext2_nz, is_first)
    rid = q.q_add(q.q_mul(is_first, ext2), q.q_mul(is_not_first, in_right_id))
    ev.add_to_relation(
        lookup, q.q_sub(sel, is_not_first),
        [rid, quarter(in_state, 2), quarter(in_state, 3)],
    )

    sel = q.q_mul(ext1_nz, is_last)
    rid = q.q_add(q.q_mul(is_last, ext1), q.q_mul(is_not_last, out_left_id))
    ev.add_to_relation(
        lookup, q.q_add(sel, is_not_last),
        [rid, quarter(out_state, 0), quarter(out_state, 1)],
    )

    sel = q.q_mul(ext2_nz, is_last)
    rid = q.q_add(q.q_mul(is_last, ext2), q.q_mul(is_not_last, out_right_id))
    ev.add_to_relation(
        lookup, q.q_add(sel, is_not_last),
        [rid, quarter(out_state, 2), quarter(out_state, 3)],
    )

    ev.add_to_relation(
        lookup, q.q_mul(is_first, is_not_last), [swap_bit_value, swap_bit_addr]
    )
    ev.finalize_logup(3)


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------

def _horner(constraints: List[QM31], rc: QM31) -> QM31:
    """acc = ((c0*rc + c1)*rc + c2)... over stacked (B, n_i) blocks."""
    xp = _xp(rc.a)
    all_c = QM31(
        *(xp.concatenate([blk[i] for blk in constraints], axis=-1) for i in range(4))
    )
    # zero carry shaped like one constraint column (rc may be a broadcast
    # scalar when called from the prover's full-domain evaluation)
    zero = q.q_zero(all_c.a[..., 0])
    if not _is_jax(all_c.a):
        acc = zero
        for t in range(all_c.a.shape[-1]):
            acc = q.q_add(q.q_mul(acc, rc), QM31(*(c[..., t] for c in all_c)))
        return acc
    import jax

    seq = QM31(*(xp.moveaxis(c, -1, 0) for c in all_c))

    def body(acc, c_t):
        return q.q_add(q.q_mul(acc, rc), c_t), None

    acc, _ = jax.lax.scan(body, zero, seq)
    return acc


def composition_check(
    spec: VerifierSpec,
    samples_flat,
    plonk_total_sum: QM31,
    poseidon_total_sum: QM31,
    lookup,
    random_coeff: QM31,
    oods,
):
    """(B,) bool: evaluated composition equals the committed split values."""
    oods_x, _ = oods
    constraints: List[QM31] = []

    denom_inv_plonk = q.q_inv(
        points_mod.coset_vanishing_canonic(oods_x, spec.log_size_plonk)
    )
    ev = _Eval(
        spec, samples_flat, (0, 0, 0), plonk_total_sum,
        denom_inv_plonk, spec.log_size_plonk, constraints,
    )
    evaluate_plonk(ev, lookup)

    denom_inv_pos = q.q_inv(
        points_mod.coset_vanishing_canonic(oods_x, spec.log_size_poseidon)
    )
    ev = _Eval(
        spec, samples_flat,
        (N_PREPROCESSED_PLONK, N_TRACE_PLONK, N_INTERACTION_PLONK),
        poseidon_total_sum, denom_inv_pos, spec.log_size_poseidon, constraints,
    )
    evaluate_poseidon(ev, lookup)

    computed = _horner(constraints, random_coeff)

    def comp_sample(col):
        idx = spec.sample_offsets[3][col]
        s = samples_flat[:, idx]
        return QM31(s[:, 0], s[:, 1], s[:, 2], s[:, 3])

    left = q.q_combine4(*[comp_sample(i) for i in range(4)])
    right = q.q_combine4(*[comp_sample(i) for i in range(4, 8)])
    xpow = points_mod.repeated_double_x(
        oods_x, spec.composition_log_degree_bound - 2
    )
    expected = q.q_add(left, q.q_mul(right, xpow))

    eq = computed.a == expected.a
    for comp_c, comp_e in zip(computed[1:], expected[1:]):
        eq = eq & (comp_c == comp_e)
    return eq
