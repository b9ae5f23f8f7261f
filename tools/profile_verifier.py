"""Per-phase wall breakdown + kernel roofline for the device verifier.

Runs the four verifier phases (transcript scan, composition evaluation,
quotients + FRI fold math, Merkle hash plans) as separately jitted
programs over a BENCH_BATCH-proof batch of a fixture, times each, and
measures the Pallas Poseidon2-16 kernel against a measured VPU
elementwise speed-of-light.  Writes the numbers to stdout as JSON (one
dict) and optionally captures a jax.profiler trace.

The phase programs share arrays with the full program, so the phase-sum
exceeds the fused full-program time; the delta is XLA fusion win, which
the output reports explicitly.

Usage:
  python tools/profile_verifier.py [--fixture small_proof] [--batch 1024]
                                   [--trace /tmp/rstpu_trace]

Reference for the phase structure: verify.py::verify_batch and the hint
pipeline it mirrors (/root/reference/components/hints/src/*.rs).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs", 0.0
)

import jax.numpy as jnp
import numpy as np

from recursive_stwo_tpu.core import qm31 as q
from recursive_stwo_tpu.models.flagship import prepared_arrays, tiled_batch
from recursive_stwo_tpu.verifier import points, transcript, verify


def _time(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------- poseidon
# analytic scalar-op mix per permutation, from the unrolled kernel
# (ops/poseidon_pallas.py::_kernel).  Two op classes with different VPU
# throughput: u32 multiplies vs cheap ops (add/sub/shift/and/cmp/select).
#
#   modular add (select-reduce): add + sub + cmp + select  = 4 cheap
#   M31 mul (16-bit limbs):      4 u32 muls + ~26 cheap
#   mul_pow2 (rotation):         4 cheap
#
# call counts: 1,360 modular adds (initial MDS + 8 full rounds x (16 RC +
# 84 MDS adds) + 14 partial rounds x 34), 426 M31 mul-equivalents
# (142 pow5 = 2 squares at 3 products + 1 generic mul at 4 = 10 u32
# multiplies each since the round-4 square-specialized S-box), 210
# rotations (14 rounds x 15 lanes).
N_MULS_PER_PERM = 142 * 10
N_CHEAP_PER_PERM = 1360 * 4 + 426 * 26 + 142 + 14 * 15 * 4


# Analytic VPU peak for the roofline.  Micro-measured elementwise
# ceilings proved unusable both ways: a K-deep dependent chain measures
# op LATENCY (r2: fraction_of_sol > 1), and multi-stream chains get
# restructured by XLA fusion into something memory-shaped (fraction 12x
# too small).  The v5e TensorCore has 4 VPUs of (8, 128) lanes; the
# round-3 roofline assumed ~940 MHz (the v4 clock), but the round-4
# lane-major hash scans measured ABOVE that light (251M perms/s implied
# vs 202M "peak"), falsifying the clock assumption.  v5e's published
# 197 bf16 TFLOP/s through 4 128x128 MXUs implies ~1.5 GHz; the roofline
# now uses that => ~6.1e12 32-bit vector ops/s.  Counting every u32
# multiply as ONE issue slot is conservative (integer multiplies cost
# >= 1 slot), so the resulting speed-of-light is an upper bound and the
# reported fraction a lower bound.
VPU_PEAK_OPS_PER_SEC = 4 * 8 * 128 * 1.5e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="small_proof")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of one step")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    spec, pa = prepared_arrays(args.fixture)
    paj = jax.tree.map(jnp.asarray, tiled_batch(pa, args.batch))
    inputs = (verify.INPUTS_ONE if args.fixture == "small_proof"
              else verify.INPUTS_RECURSIVE)
    out = {"fixture": args.fixture, "batch": args.batch,
           "device": str(jax.devices()[0])}

    # ---- full program
    f_full = jax.jit(lambda a: verify.verify_batch(spec, a, inputs)["ok"])
    ok = np.asarray(f_full(paj))
    assert ok.all()
    t_full = _time(f_full, paj, reps=args.reps)
    out["full_ms"] = round(t_full * 1e3, 3)

    # ---- phase 1: transcript scan (Fiat-Shamir digest chain + draws)
    f_fs = jax.jit(lambda a: transcript.run_transcript(spec, a))
    fs = f_fs(paj)
    t_fs = _time(f_fs, paj, reps=args.reps)

    # ---- phase 2: composition at OODS (incl. pow + total-sum scalars)
    def comp(a, fs):
        from recursive_stwo_tpu.verifier import composition as cmod
        oods = points.oods_point_from_t(fs.oods_t)
        return cmod.composition_check(
            spec, a.samples_flat,
            q.QM31(*(a.plonk_total_sum[:, i] for i in range(4))),
            q.QM31(*(a.poseidon_total_sum[:, i] for i in range(4))),
            (fs.z, fs.alpha), fs.random_coeff, oods)

    f_comp = jax.jit(comp)
    t_comp = _time(f_comp, paj, fs, reps=args.reps)

    # ---- phase 3: quotients + FRI fold arithmetic
    def fold(a, fs):
        oods = points.oods_point_from_t(fs.oods_t)
        checks, _ = verify.fold_phase(spec, a, fs, oods, jnp)
        return checks

    f_fold = jax.jit(fold)
    t_fold = _time(f_fold, paj, fs, reps=args.reps)

    # ---- phase 4: Merkle hash plans (absorb + leaves + walks)
    def hashp(a, fs):
        oods = points.oods_point_from_t(fs.oods_t)
        _, pair_jobs = verify.fold_phase(spec, a, fs, oods, jnp)
        return verify.hash_phase(spec, a, fs, pair_jobs, jnp)

    f_hash = jax.jit(hashp)
    t_hash_incl = _time(f_hash, paj, fs, reps=args.reps)
    t_hash = max(t_hash_incl - t_fold, 0.0)  # subtract the fold prefix

    phases = {
        "transcript_ms": round(t_fs * 1e3, 3),
        "composition_ms": round(t_comp * 1e3, 3),
        "quotients_fri_ms": round(t_fold * 1e3, 3),
        "hash_plans_ms": round(t_hash * 1e3, 3),
    }
    out["phases"] = phases
    phase_sum = sum(phases.values())
    out["phase_sum_ms"] = round(phase_sum, 3)
    out["fusion_win_pct"] = round(100 * (1 - out["full_ms"] / phase_sum), 1)
    out["proofs_per_sec"] = round(args.batch / t_full, 1)

    # ---- Poseidon kernel vs measured VPU speed of light
    from recursive_stwo_tpu.core import poseidon2

    n_states = 1 << 20
    states = jnp.asarray(
        np.random.default_rng(0)
        .integers(0, (1 << 31) - 1, (n_states, 16), dtype=np.int64)
        .astype(np.uint32))
    pfn = jax.jit(poseidon2.permute)
    dt = _time(pfn, states, reps=args.reps)
    perms = n_states / dt
    ops_per_perm = N_MULS_PER_PERM + N_CHEAP_PER_PERM
    sol = VPU_PEAK_OPS_PER_SEC / ops_per_perm
    out["poseidon"] = {
        "perms_per_sec": round(perms),
        "u32_muls_per_perm": N_MULS_PER_PERM,
        "cheap_ops_per_perm": N_CHEAP_PER_PERM,
        "vpu_peak_ops_per_sec": round(VPU_PEAK_OPS_PER_SEC),
        "speed_of_light_perms_per_sec": round(sol),
        "fraction_of_sol": round(perms / sol, 3),
    }

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(f_full(paj))
        out["trace_dir"] = args.trace

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
