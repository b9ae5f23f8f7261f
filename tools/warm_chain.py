"""Precompile (cache-warm) every device program of the recursion chain.

The chain's compiled-program set is static: programs are keyed by
(log_size_plonk, log_size_poseidon, PcsConfig preset, channel flavor),
and the 15 levels use only 9 distinct combinations.  Cold compiles on
the tunneled chip cost minutes per shape and previously serialized with
the chain's own execution (91 min cold vs ~20 min warm, VERDICT r4 #5).

This tool proves one representative level per combination with
THREAD-PARALLEL workers: XLA compilations overlap each other (measured
~1.6x for 2 threads; the compile service handles concurrent requests)
while the actual device execution interleaves.  Traces are built from
the committed chain artifacts (shape templates + ground truth — always
in the repo), and the resulting proofs are discarded; only the
persistent compile cache (.jax_cache) is the product.

Usage:  python tools/warm_chain.py [n_workers]
Then run examples/recursion_chain.py — every level compiles warm.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

# one representative level per distinct (lp, lq, preset, flavor) program set
COMBOS = [
    # (input artifact, multipliers, preset, sha256)
    ("recursive_proof_16_15", 5, "fast_prover", False),   # levels 1, 4
    ("level1-5", 1, "fast_prover2", False),               # levels 2, 5
    ("level2-1", 1, "standard", False),                   # levels 3, 6, 7
    ("level7-1", 1, "fast_verifier", False),              # levels 8, 9
    ("level9-1", 1, "fast_verifier2", False),             # levels 10, 11
    ("level11-1", 1, "fast_verifier3", False),            # level 12
    ("level12-1", 1, "fast_verifier3", False),            # level 13 (15/15)
    ("level13-1", 1, "fast_verifier3", True),             # level 14 (sha)
]


def _build_trace(inp: str, mult: int):
    from recursion_chain import INPUTS3, load_input
    from recursive_stwo_tpu.recursion.pipeline import build_verifier_circuit

    proof = load_input(inp)
    cs = None
    for k in range(mult):
        cs, _ = build_verifier_circuit(
            proof, list(INPUTS3), cs=cs, finalize=False, cross_check=(k == 0)
        )
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    return cs.generate_trace()


def _warm_one(job):
    inp, mult, preset, sha256 = job
    from recursion_chain import PRESETS

    label = f"{inp} x{mult} [{preset}{' sha' if sha256 else ''}]"
    t0 = time.time()
    try:
        trace = _build_trace(inp, mult)
        config = PRESETS[preset]
        if sha256:
            from recursive_stwo_tpu.prover.prove_sha256 import prove_sha256p31

            prove_sha256p31(trace, config)
        else:
            from recursive_stwo_tpu.prover.prove import prove

            prove(trace, config)
        print(f"  warmed {label}: {time.time() - t0:.1f}s", flush=True)
        return True
    except Exception as e:  # a missing artifact skips its combo
        print(f"  warm {label} FAILED: {e!r:.200}", flush=True)
        return False


def _warm_last_layer():
    """Last-layer programs: PlonkWithoutPoseidon prove under the SHA-256
    output channel (examples/last_layer.py flow)."""
    t0 = time.time()
    try:
        import last_layer as ll_mod

        ll_mod.warm_compile()
        print(f"  warmed last-layer: {time.time() - t0:.1f}s", flush=True)
        return True
    except AttributeError:
        print("  last-layer warm hook missing; run examples/last_layer.py "
              "once instead", flush=True)
        return False
    except Exception as e:
        print(f"  warm last-layer FAILED: {e!r:.200}", flush=True)
        return False


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.0
    )
    n_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    t0 = time.time()
    jobs = list(COMBOS)
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        results = list(pool.map(_warm_one, jobs))
    ok_last = _warm_last_layer()
    print(
        f"warm_chain: {sum(results)}/{len(jobs)} combos + "
        f"last-layer({'ok' if ok_last else 'skip'}) in "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
