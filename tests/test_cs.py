"""Constraint-system + gadget DSL tests.

Mirrors the reference's own gadget test strategy (SURVEY.md §4): known-answer
checks against the native (array) implementations, plus full finalization
(pad -> check_arithmetics -> populate_logup_arguments ->
check_poseidon_invocations) on every built circuit.
"""

import numpy as np
import pytest

from recursive_stwo_tpu.core import poseidon2
from recursive_stwo_tpu.cs import scalar
from recursive_stwo_tpu.cs.system import (
    Mode,
    PlonkWithPoseidonCS,
    PlonkWithoutPoseidonCS,
)
from recursive_stwo_tpu.gadgets import merkle as gmerkle
from recursive_stwo_tpu.gadgets.bits import BitsVar
from recursive_stwo_tpu.gadgets.channel import ChannelVar
from recursive_stwo_tpu.gadgets.fields import CM31Var, M31Var, QM31Var
from recursive_stwo_tpu.gadgets.poseidon import Poseidon2Half
from recursive_stwo_tpu.verifier import merkle as nmerkle

P = scalar.P


def finalize(cs):
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    if isinstance(cs, PlonkWithPoseidonCS):
        cs.check_poseidon_invocations()
    return cs.generate_trace()


def test_qm31_pow_circuit():
    """Analog of the reference qm31 pow test (qm31.rs:488-533)."""
    rng = np.random.default_rng(0)
    a = tuple(int(x) for x in rng.integers(0, P, 4))
    b = scalar.q_pow(a, 100)

    cs = PlonkWithPoseidonCS()
    a_var = QM31Var.new_witness(cs, a)
    b_var = QM31Var.new_witness(cs, b)
    a_var.pow(100).equalverify(b_var)
    trace = finalize(cs)
    n = trace["a_wire"].shape[0]
    assert n & (n - 1) == 0 and n >= 16
    assert trace["flow_wires"].shape[0] == 32  # min poseidon padding


def test_field_ops_all_constrained():
    rng = np.random.default_rng(1)
    cs = PlonkWithPoseidonCS()
    x = tuple(int(v) for v in rng.integers(0, P, 4))
    y = tuple(int(v) for v in rng.integers(0, P, 4))
    xv, yv = QM31Var.new_witness(cs, x), QM31Var.new_witness(cs, y)

    assert (xv + yv).value == scalar.q_add(x, y)
    assert (xv * yv).value == scalar.q_mul(x, y)
    assert (xv - yv).value == scalar.q_sub(x, y)
    assert (xv.inv() * xv).value == scalar.QONE
    assert xv.pow(17).value == scalar.q_pow(x, 17)
    assert xv.shift_by_i().value == scalar.q_mul(x, scalar.QI)
    assert xv.shift_by_j().value == scalar.q_mul(x, scalar.QJ)

    limbs = xv.decompose_m31()
    assert tuple(l.value for l in limbs) == x
    back = QM31Var.from_m31(*limbs)
    assert back.value == x

    cm = xv.decompose_cm31()
    assert cm[0].value == (x[0], x[1]) and cm[1].value == (x[2], x[3])
    cinv = cm[0].inv()
    assert scalar.c_mul(*cm[0].value, *cinv.value) == (1, 0)

    m = M31Var.new_witness(cs, 12345)
    assert m.inv().value == scalar.m_inv(12345)
    assert m.is_zero().value == 0
    assert M31Var.new_witness(cs, 0).is_zero().value == 1
    assert m.is_eq(M31Var.new_witness(cs, 12345)).value == 1

    finalize(cs)


def test_mixed_type_ops():
    cs = PlonkWithPoseidonCS()
    m = M31Var.new_witness(cs, 7)
    c = CM31Var.new_witness(cs, (3, 4))
    q = QM31Var.new_witness(cs, (1, 2, 3, 4))
    assert (q + m).value == scalar.q_add(q.value, (7, 0, 0, 0))
    assert (q * c).value == scalar.q_mul(q.value, (3, 4, 0, 0))
    assert (q - c).value == scalar.q_sub(q.value, (3, 4, 0, 0))
    assert (c * m).value == (21, 28)
    assert c.shift_by_i().value == ((-4) % P, 3)
    assert (c.mul_constant_cm31((5, 6))).value == scalar.c_mul(3, 4, 5, 6)
    assert q.mul_constant_qm31((5, 6, 7, 8)).value == scalar.q_mul(
        q.value, (5, 6, 7, 8)
    )
    sel = QM31Var.select(q, QM31Var.new_witness(cs, (9, 9, 9, 9)), True, 1)
    assert sel.value == (9, 9, 9, 9)
    finalize(cs)


def test_bits_roundtrip():
    cs = PlonkWithPoseidonCS()
    v = M31Var.new_witness(cs, 0b1011011)
    bits = BitsVar.from_m31(v, 31)
    assert bits.get_value() == 0b1011011
    assert bits.compose_range(0, 7).value == 0b1011011
    assert bits.compose_range(3, 7).value == 0b1011
    finalize(cs)


def test_poseidon_gadget_kat():
    """permute(0..16) matches the scalar reference vector
    (implementation.rs:156-173 KAT via core.poseidon2)."""
    cs = PlonkWithPoseidonCS()
    left = Poseidon2Half.new_witness(cs, list(range(8)))
    right = Poseidon2Half.new_witness(cs, list(range(8, 16)))
    out_l, out_r = Poseidon2Half.permute(left, right, False, False)
    expected = poseidon2.permute(np.arange(16, dtype=np.uint32))
    assert list(out_l.value) + list(out_r.value) == [int(x) for x in expected]

    # swap: permuting (right||left) with swap bit set
    one = 1  # wire 1 holds value 1
    sl, sr = Poseidon2Half.permute(right, left, False, False, (True, one))
    assert sl.value == out_l.value and sr.value == out_r.value
    finalize(cs)


def test_merkle_gadget_vs_native():
    rng = np.random.default_rng(2)
    cols = [int(x) for x in rng.integers(0, P, 25)]
    cs = PlonkWithPoseidonCS()
    col_vars = [M31Var.new_constant(cs, v) for v in cols]

    for n in (1, 7, 8, 13, 16, 17, 21, 25):
        g = gmerkle.hash_m31_columns_get_rate(col_vars[:n])
        native = nmerkle.hash_leaf(np.array(cols[:n], dtype=np.uint32))
        assert list(g.value) == [int(x) for x in native]

    left = Poseidon2Half.new_witness(cs, [int(x) for x in rng.integers(0, P, 8)])
    right = Poseidon2Half.new_witness(cs, [int(x) for x in rng.integers(0, P, 8)])
    g = gmerkle.hash_tree(left, right)
    native = nmerkle.permute_rate(
        np.array(left.value, dtype=np.uint32),
        np.array(right.value, dtype=np.uint32),
    )
    assert list(g.value) == [int(x) for x in native]
    finalize(cs)


def test_channel_gadget_permutation_chain():
    """Channel ops follow digest = capacity(permute(op, digest)) and draws
    leave the digest untouched."""
    cs = PlonkWithPoseidonCS()
    ch = ChannelVar(cs)
    root = Poseidon2Half.new_witness(cs, list(range(8)))
    ch.mix_root(root)
    st = np.array(list(range(8)) + [0] * 8, dtype=np.uint32)
    digest = poseidon2.permute(st)[8:]
    assert list(ch.digest.value) == [int(x) for x in digest]

    felts = ch.draw_felts()
    st2 = np.array([0] * 8 + [int(x) for x in digest], dtype=np.uint32)
    rate = poseidon2.permute(st2)[:8]
    assert tuple(felts[0].value) == tuple(int(x) for x in rate[:4])
    assert tuple(felts[1].value) == tuple(int(x) for x in rate[4:])
    assert list(ch.digest.value) == [int(x) for x in digest]  # unchanged
    assert ch.n_sent == 1
    finalize(cs)


def test_without_poseidon_simd_gates():
    cs = PlonkWithoutPoseidonCS()
    rng = np.random.default_rng(3)
    a = tuple(int(v) for v in rng.integers(0, P, 4))
    av = cs.new_qm31(a, Mode.WITNESS)

    # m4's AIR constraint is c = m4(a o b): a pure m4 needs b = (1,1,1,1)
    ones = cs.new_qm31((1, 1, 1, 1), Mode.WITNESS)
    m4 = cs.do_m4_gate(av, ones)
    assert cs.value(m4) == cs._m4(a)

    had = cs.do_hadamard(av, av)
    assert cs.value(had) == tuple(v * v % P for v in a)

    gs = cs.do_grandsum_gate(av, av)
    s = 2 * sum(a) % P
    assert cs.value(gs) == (s, s, s, s)

    a4 = tuple(pow(v, 4, P) for v in a)
    a4v = cs.new_qm31(a4, Mode.WITNESS)
    p5 = cs.do_pow5_gate(av, a4v)
    assert cs.value(p5) == tuple(pow(v, 5, P) for v in a)

    p5m4 = cs.do_pow5m4_gate(av, a4v)
    assert cs.value(p5m4) == cs._m4(tuple(pow(v, 5, P) for v in a))

    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.generate_trace()


def test_bad_gate_rejected():
    cs = PlonkWithPoseidonCS()
    x = QM31Var.new_witness(cs, (5, 0, 0, 0))
    # manually lie: claim x * x = x
    cs.insert_gate(x.variable, x.variable, x.variable, 0)
    cs.pad()
    with pytest.raises(AssertionError):
        cs.check_arithmetics()


def test_logup_multiplicities_balance():
    """Sum over rows of (occurrences - multiplicity contributions) is zero:
    every wire's uses equal its defining row's credit."""
    cs = PlonkWithPoseidonCS()
    x = QM31Var.new_witness(cs, (5, 6, 7, 8))
    y = x * x
    z = y + x
    z.equalverify(z)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    # logup identity: for each wire w, sum of mults over rows where it
    # appears == 2 - counts[w] + (counts[w] - 1) ... net check: per-wire
    # total equals 1 - [public-input bonus] - [swap uses]
    n_vars = cs.num_vars()
    totals = np.zeros(n_vars, dtype=np.int64)
    aw, bw, cw = map(np.asarray, (cs.a_wire, cs.b_wire, cs.c_wire))
    np.add.at(totals, aw, cs.mult_a)
    np.add.at(totals, bw, cs.mult_b)
    np.add.at(totals, cw, cs.mult_c)
    # first occurrence gets 1 - counts[w], the rest +1 each, so the sum over
    # a/b/c occurrences is -(public-input bonus + swap-bit uses)
    expect = np.zeros(n_vars, dtype=np.int64)
    expect[1 : 1 + cs.num_input] -= 1
    for addr, _ in cs.flow_swap:
        expect[addr] -= 1
    seen = np.zeros(n_vars, dtype=bool)
    seen[np.concatenate([aw, bw, cw])] = True
    assert (totals[seen] == expect[seen]).all()


def test_emulated_poseidon_kat_in_circuit():
    """Full emulated permutation on PlonkWithoutPoseidonCS matches the
    scalar KAT vector (reference emulated.rs:246-266: the SIMD-gate
    permutation of 0..16 equals the native Poseidon2 permutation)."""
    from recursive_stwo_tpu.gadgets.poseidon import permute_emulated

    from recursive_stwo_tpu.gadgets.fields import QM31Var as QV
    from recursive_stwo_tpu.gadgets.poseidon import Poseidon2HalfEmulated

    cs = PlonkWithoutPoseidonCS()
    left = Poseidon2HalfEmulated(
        QV.new_witness(cs, (0, 1, 2, 3)), QV.new_witness(cs, (4, 5, 6, 7))
    )
    right = Poseidon2HalfEmulated(
        QV.new_witness(cs, (8, 9, 10, 11)),
        QV.new_witness(cs, (12, 13, 14, 15)),
    )
    out_l, out_r = permute_emulated(left, right)

    expected = poseidon2.permute(np.arange(16, dtype=np.uint32))
    got = list(out_l.value) + list(out_r.value)
    assert got == [int(x) for x in expected]

    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.generate_trace()
