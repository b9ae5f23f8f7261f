"""Poseidon2-16 half-state gadget (the workhorse of in-circuit hashing).

A `Poseidon2Half` carries 8 M31 values (= half the 16-wide state), stored
in circuit as two QM31 wires plus a `sel_value` wire created by a
poseidon-tagged mul gate; `permute` computes the permutation natively and
records one Poseidon-accelerator flow entry (so a permutation costs the
circuit ~1 accelerator row instead of hundreds of gates).

Mirrors /root/reference/primitives/poseidon31/src/lib.rs (Native variant;
the Emulated variant for the without-poseidon CS lives in
`poseidon_emulated.py`).
"""

from __future__ import annotations

import numpy as np

from ..core import poseidon2
from ..cs.system import Mode, PlonkWithPoseidonCS
from .fields import M31Var, QM31Var


def _permute16(values16):
    state = np.array(values16, dtype=np.uint32)
    return [int(x) for x in poseidon2.permute(state)]


class Poseidon2Half:
    """Native half-state var: value (8 ints), left/right QM31 wires,
    sel_value wire (0 if not table-linked)."""

    __slots__ = ("cs", "value", "left_variable", "right_variable", "sel_value")

    def __init__(self, cs, value, left_variable, right_variable, sel_value):
        self.cs = cs
        self.value = tuple(int(v) % ((1 << 31) - 1) for v in value)
        self.left_variable = left_variable
        self.right_variable = right_variable
        self.sel_value = sel_value

    # -- constructors ------------------------------------------------------
    @classmethod
    def new_witness(cls, cs, value) -> "Poseidon2Half":
        left = QM31Var.new_witness(cs, tuple(value[0:4]))
        right = QM31Var.new_witness(cs, tuple(value[4:8]))
        sel = cs.assemble_poseidon_gate(left.variable, right.variable)
        return cls(cs, value, left.variable, right.variable, sel)

    @classmethod
    def new_single_use_witness_only(cls, cs, value) -> "Poseidon2Half":
        """Witness with no wires: only consumed as permutation input
        (lib.rs:51-74)."""
        return cls(cs, value, 0, 0, 0)

    @classmethod
    def from_m31(cls, slice8) -> "Poseidon2Half":
        assert len(slice8) == 8
        cs = slice8[0].cs
        left = QM31Var.from_m31(*slice8[0:4])
        right = QM31Var.from_m31(*slice8[4:8])
        sel = cs.assemble_poseidon_gate(left.variable, right.variable)
        return cls(
            cs, [v.value for v in slice8], left.variable, right.variable, sel
        )

    @classmethod
    def from_qm31(cls, a: QM31Var, b: QM31Var) -> "Poseidon2Half":
        cs = a.cs
        sel = cs.assemble_poseidon_gate(a.variable, b.variable)
        return cls(cs, a.value + b.value, a.variable, b.variable, sel)

    @classmethod
    def zero(cls, cs) -> "Poseidon2Half":
        key = "poseidon2 zero_half"
        sel = cs.get_cache(key)
        if sel is None:
            sel = cs.assemble_poseidon_gate(0, 0)
            cs.set_cache(key, sel)
        return cls(cs, (0,) * 8, 0, 0, sel)

    def to_qm31(self):
        return [
            QM31Var(self.cs, self.value[0:4], self.left_variable),
            QM31Var(self.cs, self.value[4:8], self.right_variable),
        ]

    # -- the permutation ---------------------------------------------------
    @staticmethod
    def permute(left, right, ignore_left, ignore_right, is_swap=None):
        """(new_left, new_right); is_swap = (bit_value, bit_variable) or
        None (lib.rs:282-423)."""
        cs = left.cs
        assert isinstance(cs, PlonkWithPoseidonCS)
        if is_swap is not None and is_swap[0]:
            state = list(right.value) + list(left.value)
        else:
            state = list(left.value) + list(right.value)
        state = _permute16(state)

        def make_half(vals):
            ol = QM31Var.new_witness(cs, tuple(vals[0:4]))
            orr = QM31Var.new_witness(cs, tuple(vals[4:8]))
            sel = cs.assemble_poseidon_gate(ol.variable, orr.variable)
            return Poseidon2Half(cs, vals, ol.variable, orr.variable, sel)

        if ignore_left:
            new_left = Poseidon2Half(cs, state[0:8], 0, 0, 0)
        else:
            new_left = make_half(state[0:8])
        if ignore_right:
            new_right = Poseidon2Half(cs, state[8:16], 0, 0, 0)
        else:
            new_right = make_half(state[8:16])

        swap_addr, swap_bit = (
            (is_swap[1], is_swap[0]) if is_swap is not None else (0, False)
        )
        cs.invoke_poseidon_accelerator(
            (left.sel_value, right.sel_value, new_left.sel_value,
             new_right.sel_value),
            (left.value, right.value, new_left.value, new_right.value),
            swap_addr,
            swap_bit,
        )
        return new_left, new_right

    @staticmethod
    def permute_get_rate(left, right):
        return Poseidon2Half.permute(left, right, False, True)[0]

    @staticmethod
    def permute_get_capacity(left, right):
        return Poseidon2Half.permute(left, right, True, False)[1]

    @staticmethod
    def swap_permute_get_rate(left, right, is_swap):
        return Poseidon2Half.permute(left, right, False, True, is_swap)[0]

    @staticmethod
    def swap_permute_get_capacity(left, right, is_swap):
        return Poseidon2Half.permute(left, right, True, False, is_swap)[1]

    def equalverify(self, rhs: "Poseidon2Half") -> None:
        assert self.value == rhs.value
        self.cs.insert_gate(self.left_variable, 0, rhs.left_variable, 1)
        self.cs.insert_gate(self.right_variable, 0, rhs.right_variable, 1)
