"""Circle/line/query gadget tests, cross-checked against the host coset
machinery and the (fixture-validated) native verifier kernels."""

import numpy as np

from recursive_stwo_tpu.core import circle as ccircle
from recursive_stwo_tpu.core import qm31 as nq
from recursive_stwo_tpu.cs import scalar
from recursive_stwo_tpu.cs.system import PlonkWithPoseidonCS
from recursive_stwo_tpu.gadgets.bits import BitsVar
from recursive_stwo_tpu.gadgets.circle import CirclePointM31, CirclePointQM31
from recursive_stwo_tpu.gadgets.fields import M31Var, QM31Var
from recursive_stwo_tpu.gadgets.line import LinePolyVar
from recursive_stwo_tpu.gadgets.query import QueryPositionsPerLogSizeVar
from recursive_stwo_tpu.verifier import points as npoints
from recursive_stwo_tpu.verifier.spec import VerifierSpec

P = scalar.P


def finalize(cs):
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()


def test_bit_reverse_at():
    """Mirror of the reference test (circle lib.rs:263-285)."""
    cs = PlonkWithPoseidonCS()
    domain = ccircle.CanonicCoset(16).circle_domain()
    for idx in (40, 41):
        expected = domain.at(ccircle.bit_reverse_index(idx, 16))
        iv = M31Var.new_witness(cs, idx)
        bits = BitsVar.from_m31(iv, 16)
        pt = CirclePointM31.bit_reverse_at(domain.half_coset, bits, 16)
        assert pt.value() == expected
    finalize(cs)


def test_point_arith_on_circle():
    cs = PlonkWithPoseidonCS()
    p = ccircle.point_at_index(12345)
    q = ccircle.point_at_index(987)
    pv = CirclePointM31.new_witness(cs, p)
    qv = CirclePointM31.new_witness(cs, q)
    assert (pv + qv).value() == ccircle.point_add(p, q)
    assert pv.double().value() == ccircle.point_double(p)
    assert pv.conditional_negate(True, 1).value() == ccircle.point_neg(p)
    finalize(cs)


def test_oods_point_from_t():
    cs = PlonkWithPoseidonCS()
    rng = np.random.default_rng(5)
    t = tuple(int(x) for x in rng.integers(0, P, 4))
    tv = QM31Var.new_witness(cs, t)
    pt = CirclePointQM31.from_t(tv)
    # native: points.oods_point_from_t on scalar QM31
    nx, ny = npoints.oods_point_from_t(nq.QM31(*(np.uint32(v) for v in t)))
    assert pt.x.value == tuple(int(c) for c in nx)
    assert pt.y.value == tuple(int(c) for c in ny)
    # on-circle: x^2 + y^2 = 1
    lhs = scalar.q_add(
        scalar.q_mul(pt.x.value, pt.x.value), scalar.q_mul(pt.y.value, pt.y.value)
    )
    assert lhs == scalar.QONE
    # repeated_double_x_only matches native
    xv = pt.repeated_double_x_only(5)
    nxd = npoints.repeated_double_x(nq.QM31(*(np.uint32(v) for v in nx)), 5)
    assert xv.value == tuple(int(c) for c in nxd)
    finalize(cs)


def test_line_poly_eval_matches_native_fold():
    """Gadget eval == the native even/odd interleave fold used by the
    (fixture-validated) FRI last-layer check."""
    rng = np.random.default_rng(6)
    coeffs = [tuple(int(x) for x in rng.integers(0, P, 4)) for _ in range(16)]
    xval = int(rng.integers(0, P))

    cs = PlonkWithPoseidonCS()
    lp = LinePolyVar.new_witness(cs, coeffs)
    res = lp.eval_at_point(M31Var.new_witness(cs, xval))

    # native fold (verifier/fri.py last-layer): interleaved halving with
    # reversed doublings
    doublings = [xval]
    for _ in range(3):
        doublings.append((2 * doublings[-1] * doublings[-1] - 1) % P)
    v = list(coeffs)
    for factor in reversed(doublings):
        v = [
            scalar.q_add(v[2 * i], scalar.q_mul_m31(v[2 * i + 1], factor))
            for i in range(len(v) // 2)
        ]
    assert res.value == v[0]
    finalize(cs)


def test_query_points_match_native():
    """PointCarryingQueryVar chain == half_index_points/domain_point
    (both fixture-validated on the device verifier path)."""
    cs = PlonkWithPoseidonCS()
    M, mn = 12, 7
    rng = np.random.default_rng(7)
    raws = [int(x) for x in rng.integers(0, 1 << 31, 3)]
    raw_vars = [M31Var.new_witness(cs, r) for r in raws]
    qp = QueryPositionsPerLogSizeVar(mn, M, raw_vars)

    class FakeSpec:
        max_first_layer_log = M

    half = npoints.half_index_points(
        FakeSpec, np.array([raws], dtype=np.uint32), mn
    )
    for L in range(mn, M + 1):
        hx, hy = half[L]
        for i, e in enumerate(qp[L]):
            assert e.point.x.value == int(hx[0, i])
            assert e.point.y.value == int(hy[0, i])
            # get_next_point == the column-domain point at this log size
            q_at = (raws[i] & ((1 << M) - 1)) >> (M - L)
            dx, dy, _ = npoints.domain_point(
                (hx[:, i : i + 1], hy[:, i : i + 1]),
                np.array([[q_at]], dtype=np.uint32),
            )
            np_pt = e.get_next_point()
            assert np_pt.x.value == int(dx[0, 0])
            assert np_pt.y.value == int(dy[0, 0])
    finalize(cs)
