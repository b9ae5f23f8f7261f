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
                                  at prepare batch 512; _b1 is the
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
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs", 0.0
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

    # ---- deep fixture: recursive_proof_16_15 (co-headline: the chain
    # shape every recursion level actually verifies; depth-21/22 trees,
    # 8 inner FRI layers; swept B=128..1024 in docs/perf.md) ----
    batch_r = int(os.environ.get("BENCH_BATCH_R", "1024"))
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
    b_prep = int(os.environ.get("BENCH_PREP_BATCH", "512"))
    prep_batch = [proof] * b_prep
    hints.prepare(spec, prep_batch)
    prep_trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        hints.prepare(spec, prep_batch)
        prep_trials.append((time.perf_counter() - t0) / b_prep)
    prep_s = min(prep_trials)
    sec["host_prepare_ms_per_proof"] = round(prep_s * 1e3, 2)
    sec["host_prepare_trials_ms"] = [round(t * 1e3, 2) for t in prep_trials]

    # pipelined end-to-end: the device verifies batch k (async dispatch)
    # while the host prepares batch k+1 — the production streaming shape.
    # Every batch is prepared from scratch (distinct-proof cost).
    fn_p = jax.jit(
        lambda a: verify.verify_batch(spec, a, verify.INPUTS_ONE)["ok"]
    )
    paj_p = jax.tree.map(jnp.asarray, hints.prepare(spec, prep_batch))
    fn_p(paj_p).block_until_ready()
    n_pipe = int(os.environ.get("BENCH_PIPE_BATCHES", "8"))
    t0 = time.perf_counter()
    out = None
    for _ in range(n_pipe):
        out = fn_p(paj_p)  # async: device works while the host prepares
        paj_p = jax.tree.map(jnp.asarray, hints.prepare(spec, prep_batch))
    ok_pipe = np.asarray(out.block_until_ready())
    dt_pipe = time.perf_counter() - t0
    assert ok_pipe.all()
    sec["e2e_distinct_proofs_per_sec"] = round(n_pipe * b_prep / dt_pipe, 1)

    # ---- without-poseidon flavor: batched device verify ----
    # mirror of verify_plonk_without_poseidon (the reference's last-layer
    # output check, examples/last-layer/src/main.rs:188-202); committed
    # fixture testdata/np_small.bin, plus the real chain bitcoin proof
    # when the chain artifacts are on disk.
    from recursive_stwo_tpu.proof.parse import (
        parse_plonk_without_poseidon_proof,
    )
    from recursive_stwo_tpu.verifier import transcript as transcript_mod
    from recursive_stwo_tpu.verifier.arrays import from_proofs_np
    from recursive_stwo_tpu.verifier.spec import NoPoseidonVerifierSpec
    from recursive_stwo_tpu.verifier.verify_np import verify_batch_np

    def _np_flavor_rate(proof, batch_np, inner_inputs):
        spec_n = NoPoseidonVerifierSpec.for_rows(proof.log_size, proof.config)
        pa_n = hints.prepare(
            spec_n, [proof],
            arrays_fn=from_proofs_np,
            transcript_fn=transcript_mod.run_transcript_np,
        )
        paj_n = jax.tree.map(jnp.asarray, tiled_batch(pa_n, batch_np))
        fn_n = jax.jit(
            lambda a: verify_batch_np(spec_n, a, inner_inputs)["ok"]
        )
        assert np.asarray(fn_n(paj_n)).all(), "np-flavor verify failed"
        return batch_np / _time(lambda: fn_n(paj_n), max(reps // 2, 1))

    fixdir = os.path.join(
        os.path.dirname(__file__), "recursive_stwo_tpu", "testdata"
    )
    with open(os.path.join(fixdir, "np_small.bin"), "rb") as f:
        np_small = parse_plonk_without_poseidon_proof(f.read())
    sec["np_flavor_proofs_per_sec"] = round(
        _np_flavor_rate(np_small, 512, verify.INPUTS_RECURSIVE), 1
    )
    btc_path = os.path.join(
        os.path.dirname(__file__), "examples", "data", "bitcoin_proof.pkl"
    )
    lvl14_path = os.path.join(
        os.path.dirname(__file__), "examples", "data", "level14-1.pkl"
    )
    if os.path.exists(btc_path) and os.path.exists(lvl14_path):
        import pickle

        from recursive_stwo_tpu.recursion.pipeline import build_last_circuit
        from recursive_stwo_tpu.verifier import sha256_merkle
        from recursive_stwo_tpu.verifier.verify_sha256 import (
            run_transcript_sha256p31,
            verify_sha256np_host,
        )

        with open(btc_path, "rb") as f:
            btc = pickle.load(f)
        with open(lvl14_path, "rb") as f:
            lvl14 = pickle.load(f)
        # the bitcoin proof's public inputs are the packed FS/decommit
        # vector of the last-layer circuit (last-layer/src/main.rs:113-186)
        # -- reconstruct them by building the circuit (no proving)
        inner3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))
        cs_last, _ = build_last_circuit(
            lvl14, list(inner3),
            transcript_fn=lambda s, pa: run_transcript_sha256p31(s, lvl14),
            hash_node_fn=sha256_merkle.hash_node,
        )
        btc_inputs = tuple(
            (i + 1, tuple(int(x) for x in cs_last.value(i + 1)))
            for i in range(cs_last.num_input)
        )
        assert np.asarray(verify_sha256np_host(btc, btc_inputs)["ok"]).all()
        t0 = time.perf_counter()
        for _ in range(3):
            verify_sha256np_host(btc, btc_inputs)
        sec["bitcoin_np_host_verify_ms"] = round(
            (time.perf_counter() - t0) / 3 * 1e3, 1
        )

        # device-batched verify of the real bitcoin artifact: host SHA
        # transcript + Merkle expansion (root-asserting), device batch for
        # pow/total-sum/composition/quotients/FRI folds
        from recursive_stwo_tpu.verifier.verify_sha256 import (
            _jit_device_checks,
            _tile_fs,
            run_transcript_sha256np,
        )

        spec_b = NoPoseidonVerifierSpec.for_rows(btc.log_size, btc.config)
        fs_b = run_transcript_sha256np(spec_b, btc)
        pa_b = hints.prepare(
            spec_b, [btc],
            arrays_fn=from_proofs_np,
            transcript_fn=lambda s, p: fs_b,
            hash_node_fn=sha256_merkle.hash_node,
        )
        b_btc = int(os.environ.get("BENCH_BATCH_BTC", "128"))
        paj_b = jax.tree.map(jnp.asarray, tiled_batch(pa_b, b_btc))
        fsj_b = jax.tree.map(jnp.asarray, _tile_fs(fs_b, b_btc))
        fn_b = _jit_device_checks(spec_b, btc_inputs, True)
        assert np.asarray(fn_b(paj_b, fsj_b)).all(), "bitcoin device verify"
        dt_b = _time(lambda: fn_b(paj_b, fsj_b), max(reps // 2, 1))
        sec["bitcoin_device_proofs_per_sec"] = round(b_btc / dt_b, 1)

    # ---- Sha256Poseidon31 flavor: host verify (chain level-14 output) ----
    if os.path.exists(lvl14_path):
        import pickle

        from recursive_stwo_tpu.verifier.verify_sha256 import (
            verify_sha256p31_host,
        )

        with open(lvl14_path, "rb") as f:
            lvl14 = pickle.load(f)
        inner3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))
        assert np.asarray(
            verify_sha256p31_host(lvl14, inner3)["ok"]
        ).all()
        t0 = time.perf_counter()
        for _ in range(3):
            verify_sha256p31_host(lvl14, inner3)
        sec["sha256p31_host_verify_ms"] = round(
            (time.perf_counter() - t0) / 3 * 1e3, 1
        )

        # fast path: host SHA transcript + native path expansion, device
        # composition/quotients/folds (verify_sha256.verify_sha256p31)
        from recursive_stwo_tpu.verifier.verify_sha256 import (
            verify_sha256p31,
        )

        assert np.asarray(verify_sha256p31(lvl14, inner3)["ok"]).all()
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            verify_sha256p31(lvl14, inner3)
            trials.append((time.perf_counter() - t0) * 1e3)
        sec["sha256p31_verify_ms"] = round(min(trials), 1)

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
