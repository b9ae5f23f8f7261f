"""Interactive Poseidon31 Fiat-Shamir channel (prover side).

Bit-exact with the verifier's scan-based transcript replay
(verifier/transcript.py: digest = capacity(permute(op || digest)), draws
put the send counter in the rate and never touch the digest) — which is in
turn fixture-validated against stwo.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..core import poseidon2

_GRIND_LOG = 22  # device scan batch: one aligned 2^22 block per dispatch


@lru_cache(maxsize=None)
def _grind_batch_jit(bits: int):
    """Device PoW scan: one aligned 2^22-nonce block per call.

    For a block base that is a multiple of 2^22, nonce limb0 is exactly
    the in-block index (22/21/21 split never carries inside the block),
    so the device builds the whole state batch from two scalar limbs —
    no nonce upload.  Returns (first-hit index, hit?) for bit-exact
    smallest-nonce semantics vs the scalar scan."""
    import jax
    import jax.numpy as jnp

    N = 1 << _GRIND_LOG
    mask = np.uint32((1 << bits) - 1)

    def run(digest8, limb1, limb2):
        i = jax.lax.iota(jnp.uint32, N)
        cols = [
            i,
            jnp.full((N,), limb1, jnp.uint32),
            jnp.full((N,), limb2, jnp.uint32),
        ]
        zero = jnp.zeros((N,), jnp.uint32)
        cols += [zero] * 5
        cols += [jnp.full((N,), digest8[j], jnp.uint32) for j in range(8)]
        out = poseidon2.permute(jnp.stack(cols, axis=1))[:, 8]
        ok = (out & mask) == 0
        idx = jnp.argmax(ok)
        return idx, ok[idx]

    return jax.jit(run)


def grind_device(digest: np.ndarray, pow_bits: int) -> int:
    """TPU-batched grind (bit-exact smallest nonce): scans 2^22 Poseidon
    permutations per dispatch on the Pallas kernel (~140M perms/s vs the
    AVX-512 host scan's ~6M/s)."""
    import jax.numpy as jnp

    fn = _grind_batch_jit(pow_bits)
    dig = jnp.asarray(np.asarray(digest, np.uint32))
    base = 0
    while True:
        idx, found = fn(
            dig,
            np.uint32((base >> 22) & ((1 << 21) - 1)),
            np.uint32((base >> 43) & ((1 << 21) - 1)),
        )
        if bool(found):
            return base + int(idx)
        base += 1 << _GRIND_LOG


class PoseidonChannel:
    def __init__(self):
        self.digest = np.zeros(8, np.uint32)
        self.n_sent = 0

    def _absorb(self, op8: np.ndarray) -> None:
        state = np.concatenate([op8.astype(np.uint32), self.digest])
        self.digest = poseidon2.permute(state)[8:]
        self.n_sent = 0

    def mix_root(self, root8) -> None:
        self._absorb(np.asarray(root8, np.uint32))

    def mix_one_felt(self, felt4) -> None:
        op = np.zeros(8, np.uint32)
        op[0:4] = np.asarray(felt4, np.uint32)
        self._absorb(op)

    def mix_two_felts(self, felt1, felt2) -> None:
        op = np.concatenate(
            [np.asarray(felt1, np.uint32), np.asarray(felt2, np.uint32)]
        )
        self._absorb(op)

    def mix_u64(self, nonce: int) -> None:
        op = np.zeros(8, np.uint32)
        op[0] = nonce & ((1 << 22) - 1)
        op[1] = (nonce >> 22) & ((1 << 21) - 1)
        op[2] = (nonce >> 43) & ((1 << 21) - 1)
        self._absorb(op)

    def draw_felts(self):
        """Two QM31 draws as (4,) uint32 arrays; digest unchanged."""
        left = np.zeros(8, np.uint32)
        left[0] = self.n_sent
        self.n_sent += 1
        rate = poseidon2.permute(np.concatenate([left, self.digest]))[:8]
        return rate[0:4], rate[4:8]

    def draw_felt(self):
        return self.draw_felts()[0]

    def grind_pow(self, pow_bits: int, batch: int = 1 << 12) -> int:
        """Find a nonce whose mix leaves digest limb0 with `pow_bits` low
        zero bits.  Large searches ride the TPU Pallas kernel when an
        accelerator backend is live (2^22 nonces/dispatch); otherwise the
        AVX-512 16-way native scan, then vectorized numpy batches."""
        from ..utils import native

        if pow_bits >= 22:
            try:
                import jax

                if jax.default_backend() != "cpu":
                    return grind_device(self.digest, pow_bits)
            except Exception:
                pass
        if native.available():
            return native.grind(self.digest, pow_bits)
        mask = np.uint32((1 << pow_bits) - 1)
        base = 0
        while True:
            nonces = np.arange(base, base + batch, dtype=np.uint64)
            ops = np.zeros((batch, 16), np.uint32)
            ops[:, 0] = (nonces & ((1 << 22) - 1)).astype(np.uint32)
            ops[:, 1] = ((nonces >> np.uint64(22)) & ((1 << 21) - 1)).astype(
                np.uint32
            )
            ops[:, 2] = ((nonces >> np.uint64(43)) & ((1 << 21) - 1)).astype(
                np.uint32
            )
            ops[:, 8:] = self.digest
            digests = poseidon2.permute(ops)[:, 8:]
            hits = np.nonzero((digests[:, 0] & mask) == 0)[0]
            if hits.size:
                return int(nonces[hits[0]])
            base += batch
