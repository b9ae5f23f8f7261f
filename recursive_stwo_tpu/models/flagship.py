"""Flagship model: the batched PlonkWithPoseidon proof verifier.

Convenience wrappers used by __graft_entry__, bench.py and the examples:
load a fixture, build its spec + host hints once, and expose a jittable
device step over batched proof tensors.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ..proof.parse import parse_plonk_with_poseidon_proof
from ..verifier import hints, verify
from ..verifier.arrays import ProofArrays
from ..verifier.spec import VerifierSpec

TESTDATA = os.path.join(os.path.dirname(__file__), "..", "testdata")

FIXTURE_INPUTS = {
    "small_proof": verify.INPUTS_ONE,
    "recursive_proof_16_15": verify.INPUTS_RECURSIVE,
}


@lru_cache(maxsize=None)
def load_fixture(name: str = "small_proof"):
    with open(os.path.join(TESTDATA, f"{name}.bin"), "rb") as f:
        proof = parse_plonk_with_poseidon_proof(f.read())
    spec = VerifierSpec.from_proof(proof)
    return proof, spec


@lru_cache(maxsize=None)
def prepared_arrays(name: str = "small_proof") -> tuple:
    proof, spec = load_fixture(name)
    return spec, hints.prepare(spec, [proof])


def tiled_batch(pa: ProofArrays, batch: int) -> ProofArrays:
    """Replicate a prepared single-proof batch to size `batch` (host-side)."""
    import jax.tree as jt

    return jt.map(
        lambda x: np.ascontiguousarray(
            np.broadcast_to(x, (batch,) + x.shape[1:])
        ),
        pa,
    )


def verifier_step(name: str = "small_proof"):
    """(fn, example_args): jittable forward step of the flagship verifier."""
    spec, pa = prepared_arrays(name)
    inputs = FIXTURE_INPUTS[name]

    def step(arrays: ProofArrays):
        return verify.verify_batch(spec, arrays, inputs)["ok"]

    return step, (tiled_batch(pa, 4),)
