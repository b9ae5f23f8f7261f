"""Headline benchmark: proof verifications per second on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): 10,000 proof-verifications/s on a
v5e-16 pod == 625/s per chip; vs_baseline is measured single-chip rate
against that per-chip share.

Device-side work only (the full verification program: transcript replay,
PoW, composition, 4 Merkle decommitments, quotients, FRI folding); host
hint expansion is one-time per distinct proof here and benchmarked/optimized
separately.
"""

import json
import os
import time

import jax

# the env-var route does not initialize the persistent cache in this jax
# build; the explicit config update does
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from recursive_stwo_tpu.models.flagship import prepared_arrays, tiled_batch
from recursive_stwo_tpu.verifier import verify

BASELINE_PER_CHIP = 10000 / 16  # north star: 10k/s on v5e-16


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "10"))

    spec, pa = prepared_arrays("small_proof")
    paj = jax.tree.map(jnp.asarray, tiled_batch(pa, batch))

    fn = jax.jit(lambda a: verify.verify_batch(spec, a, verify.INPUTS_ONE)["ok"])
    ok = np.asarray(fn(paj))  # compile + correctness
    assert ok.all(), "verification failed in bench"

    fn(paj).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(paj)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    value = batch / dt
    print(
        json.dumps(
            {
                "metric": "proof_verifications_per_sec_single_chip",
                "value": round(value, 1),
                "unit": "proofs/s",
                "vs_baseline": round(value / BASELINE_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
