"""Randomized corruption fuzzing: flipping 1-4 random bytes anywhere in a
serialized proof must be rejected — at parse, at hint preparation, or by
the device verifier's ok flag.

This is the adversarial completeness sweep the targeted corruption tests
(test_sha256_flavor.py, test_last_layer.py) don't give: arbitrary byte
positions, not chosen fields.  The reference's analogue is its dense
in-circuit assert sweeps (/root/reference/components/recursive/answer/
src/lib.rs:324-346).  Fast tier runs a 50-trial sample per fixture; the
slow tier runs 1000 trials."""

import os

import numpy as np
import pytest

from recursive_stwo_tpu.models.flagship import TESTDATA, load_fixture
from recursive_stwo_tpu.proof.parse import (
    parse_plonk_with_poseidon_proof,
    parse_plonk_without_poseidon_proof,
)
from recursive_stwo_tpu.verifier import hints, transcript, verify
from recursive_stwo_tpu.verifier.arrays import from_proofs_np
from recursive_stwo_tpu.verifier.spec import (
    NoPoseidonVerifierSpec,
    VerifierSpec,
)
from recursive_stwo_tpu.verifier.verify_np import verify_batch_np


def _fixture_bytes(name: str) -> bytes:
    with open(os.path.join(TESTDATA, f"{name}.bin"), "rb") as f:
        return f.read()


def _wp_harness(name, inputs):
    """(check(data) -> bool accepted) for a with-poseidon fixture.

    Hint preparation is itself a complete acceptance gate on CPU (root
    equality, witness consumption, transcript replay, last-layer
    consistency); the jitted device verifier is compiled lazily and only
    consulted for flips that survive preparation, so the common reject
    path never pays a compile."""
    _, spec = load_fixture(name)
    fn_cell = []

    def device_ok(pa) -> bool:
        import jax
        import jax.numpy as jnp

        if not fn_cell:
            fn_cell.append(
                jax.jit(lambda a: verify.verify_batch(spec, a, inputs)["ok"])
            )
        return bool(
            np.asarray(fn_cell[0](jax.tree.map(jnp.asarray, pa))).all()
        )

    def check(data: bytes, device: bool = True) -> bool:
        try:
            proof = parse_plonk_with_poseidon_proof(data)
            pa = hints.prepare(spec, [proof])
        except Exception:
            return False
        return device_ok(pa) if device else True

    return check


def _np_harness():
    raw = _fixture_bytes("np_small")
    base = parse_plonk_without_poseidon_proof(raw)
    spec = NoPoseidonVerifierSpec.for_rows(base.log_size, base.config)
    fn_cell = []

    def device_ok(pa) -> bool:
        import jax
        import jax.numpy as jnp

        if not fn_cell:
            fn_cell.append(
                jax.jit(
                    lambda a: verify_batch_np(
                        spec, a, verify.INPUTS_RECURSIVE
                    )["ok"]
                )
            )
        return bool(
            np.asarray(fn_cell[0](jax.tree.map(jnp.asarray, pa))).all()
        )

    def check(data: bytes, device: bool = True) -> bool:
        try:
            proof = parse_plonk_without_poseidon_proof(data)
            pa = hints.prepare(
                spec, [proof],
                arrays_fn=from_proofs_np,
                transcript_fn=transcript.run_transcript_np,
            )
        except Exception:
            return False
        return device_ok(pa) if device else True

    return check


def _run_fuzz(raw: bytes, check, n_trials: int, seed: int):
    # the clean fixture must pass hint preparation (device-level
    # bit-exactness of the clean fixtures is pinned by test_verifier);
    # corrupted survivors of preparation do pay the device check.
    assert check(raw, device=False), "uncorrupted fixture must prepare"
    rng = np.random.default_rng(seed)
    survivors = []
    for _ in range(n_trials):
        data = bytearray(raw)
        n_flips = int(rng.integers(1, 5))
        positions = rng.integers(0, len(data), n_flips)
        for pos in positions:
            flip = int(rng.integers(1, 256))
            data[int(pos)] ^= flip
        if check(bytes(data)):
            survivors.append([int(p) for p in positions])
    assert not survivors, f"corrupted proofs accepted: {survivors}"


FIXTURES = [
    ("small_proof", "wp", verify.INPUTS_ONE),
    ("recursive_proof_16_15", "wp", verify.INPUTS_RECURSIVE),
    ("np_small", "np", None),
]


def _harness(name, kind, inputs):
    return _np_harness() if kind == "np" else _wp_harness(name, inputs)


@pytest.mark.parametrize("name,kind,inputs", FIXTURES)
def test_fuzz_sample(name, kind, inputs):
    _run_fuzz(_fixture_bytes(name), _harness(name, kind, inputs), 50, 7)


@pytest.mark.slow
@pytest.mark.parametrize("name,kind,inputs", FIXTURES)
def test_fuzz_full(name, kind, inputs):
    _run_fuzz(_fixture_bytes(name), _harness(name, kind, inputs), 1000, 11)
