"""Headline benchmark: proof verifications per second on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"secondary": {...}}.  Baseline (BASELINE.json north star): 10,000
proof-verifications/s on a v5e-16 pod == 625/s per chip; vs_baseline is
the measured single-chip rate against that per-chip share.

The headline is the device-side verification program (transcript replay,
PoW, composition, 4 Merkle decommitments, quotients, FRI folding) over a
1024-proof batch of the small_proof fixture.  Secondary metrics make the
pipeline honest and kernel-level (BASELINE.md per-chip metrics +
VERDICT r1 item 3):

  recursive_16_15_proofs_per_sec  device verify of the DEEP fixture
                                  (depth-21/22 trees, 8 inner FRI layers)
  host_prepare_ms_per_proof       per-distinct-proof host hint expansion
                                  (parse -> transcript -> path expansion)
                                  at prepare batch 32; _b1 is the
                                  single-proof latency
  e2e_distinct_proofs_per_sec     1 / (host prepare + device verify) per
                                  proof — the honest end-to-end rate for
                                  a stream of distinct proofs on one chip
                                  + one host core
  headline_trials_proofs_per_sec  both headline timing trials (the
                                  tunneled chip's throughput swings
                                  between runs; min wins, spread shown)
  poseidon_perms_per_sec          Pallas Poseidon2-16 kernel throughput
  qm31_muls_per_sec               device QM31 multiply throughput
  fri_queries_per_sec             verified FRI queries/s (headline rate x
                                  n_queries, each fully decommitted x4
                                  trees + folded to the last layer)
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

from recursive_stwo_tpu.core.qm31 import QM31, q_mul
from recursive_stwo_tpu.models.flagship import (
    load_fixture,
    prepared_arrays,
    tiled_batch,
)
from recursive_stwo_tpu.verifier import hints, verify

BASELINE_PER_CHIP = 10000 / 16  # north star: 10k/s on v5e-16


def _time(fn, reps):
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    sec = {}

    # ---- headline: small_proof device verify ----
    spec, pa = prepared_arrays("small_proof")
    paj = jax.tree.map(jnp.asarray, tiled_batch(pa, batch))
    fn = jax.jit(lambda a: verify.verify_batch(spec, a, verify.INPUTS_ONE)["ok"])
    ok = np.asarray(fn(paj))
    assert ok.all(), "verification failed in bench"
    # two timing trials, best wins: the tunneled device's available
    # throughput varies across minutes; min-of-trials estimates capability.
    # Both trial values are recorded so the spread is visible.
    trials = [_time(lambda: fn(paj), reps), _time(lambda: fn(paj), reps)]
    dt = min(trials)
    headline = batch / dt
    sec["headline_trials_proofs_per_sec"] = [
        round(batch / t, 1) for t in trials
    ]
    sec["fri_queries_per_sec"] = round(headline * spec.n_queries)

    # ---- deep fixture: recursive_proof_16_15 ----
    batch_r = int(os.environ.get("BENCH_BATCH_R", "128"))
    spec2, pa2 = prepared_arrays("recursive_proof_16_15")
    paj2 = jax.tree.map(jnp.asarray, tiled_batch(pa2, batch_r))
    fn2 = jax.jit(
        lambda a: verify.verify_batch(spec2, a, verify.INPUTS_RECURSIVE)["ok"]
    )
    ok2 = np.asarray(fn2(paj2))
    assert ok2.all(), "16/15 verification failed in bench"
    dt2 = _time(lambda: fn2(paj2), max(reps // 2, 1))
    sec["recursive_16_15_proofs_per_sec"] = round(batch_r / dt2, 1)

    # ---- host hint preparation (per distinct proof) ----
    from recursive_stwo_tpu.utils import native

    sec["native_kernels"] = bool(native.available())
    proof, _ = load_fixture("small_proof")
    hints.prepare(spec, [proof])  # warm (native lib load, caches)
    # single-proof latency
    n_prep = 5
    t0 = time.perf_counter()
    for _ in range(n_prep):
        hints.prepare(spec, [proof])
    prep_b1_s = (time.perf_counter() - t0) / n_prep
    sec["host_prepare_ms_per_proof_b1"] = round(prep_b1_s * 1e3, 2)
    # batched throughput (path expansion hashes all proofs per tree level;
    # production streams prepare in batches like the device verify does)
    b_prep = int(os.environ.get("BENCH_PREP_BATCH", "32"))
    prep_batch = [proof] * b_prep
    hints.prepare(spec, prep_batch)
    t0 = time.perf_counter()
    for _ in range(2):
        hints.prepare(spec, prep_batch)
    prep_s = (time.perf_counter() - t0) / 2 / b_prep
    sec["host_prepare_ms_per_proof"] = round(prep_s * 1e3, 2)
    sec["e2e_distinct_proofs_per_sec"] = round(1.0 / (prep_s + 1.0 / headline), 1)

    # ---- kernel: Pallas Poseidon2-16 permutations ----
    from recursive_stwo_tpu.core import poseidon2

    n_states = 1 << 20
    states = jnp.asarray(
        np.random.default_rng(0).integers(
            0, (1 << 31) - 1, (n_states, 16), dtype=np.int64
        ).astype(np.uint32)
    )
    pfn = jax.jit(poseidon2.permute)
    dtp = _time(lambda: pfn(states), reps)
    sec["poseidon_perms_per_sec"] = round(n_states / dtp)

    # ---- kernel: QM31 multiply ----
    n_q = 1 << 22
    rng = np.random.default_rng(1)
    qa = QM31(*(jnp.asarray(rng.integers(0, (1 << 31) - 1, n_q, np.int64)
                            .astype(np.uint32)) for _ in range(4)))
    qb = QM31(*(jnp.asarray(rng.integers(0, (1 << 31) - 1, n_q, np.int64)
                            .astype(np.uint32)) for _ in range(4)))
    qfn = jax.jit(lambda x, y: q_mul(x, y).a)
    dtq = _time(lambda: qfn(qa, qb), reps)
    sec["qm31_muls_per_sec"] = round(n_q / dtq)

    print(
        json.dumps(
            {
                "metric": "proof_verifications_per_sec_single_chip",
                "value": round(headline, 1),
                "unit": "proofs/s",
                "vs_baseline": round(headline / BASELINE_PER_CHIP, 3),
                "secondary": sec,
            }
        )
    )


if __name__ == "__main__":
    main()
