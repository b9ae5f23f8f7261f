"""The reference's 14-level recursion chain on this framework
(/root/reference/examples/multi-proofs/src/main.rs:172-295).

Level 1 verifies the REAL stwo fixture `recursive_proof_16_15.bin` five
times into one circuit; every later level verifies the previous level's
self-generated aggregate.  Each level is memoized to
examples/data/levelN-M.pkl and skipped if the file exists (mirroring the
reference's skip-if-exists, single-proof/src/main.rs:100-108), so the
chain is resumable at level granularity.  A JSON line per level (circuit
rows, poseidon invocations, proof log sizes, wall seconds) is appended to
docs/chain_log.jsonl.

Levels 1-13 use Poseidon31MerkleChannel; level 14 switches to the
Sha256Poseidon31 flavor (SHA-256 transcript + SHA-256 node hashes,
Poseidon column hashing) feeding examples/last_layer.py, as the reference
switches channels at main.rs:289-295.

Run:  python examples/recursion_chain.py [max_levels]
"""

import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.prover.prove import prove
from recursive_stwo_tpu.recursion.pipeline import build_verifier_circuit
from recursive_stwo_tpu.verifier import hints, verify
from recursive_stwo_tpu.verifier.spec import VerifierSpec

TESTDATA = os.path.join(
    os.path.dirname(__file__), "..", "recursive_stwo_tpu", "testdata"
)
DATA = os.path.join(os.path.dirname(__file__), "data")
LOG = os.path.join(os.path.dirname(__file__), "..", "docs", "chain_log.jsonl")
INPUTS3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))

# the reference's six config presets (multi-proofs/src/main.rs:173-196)
PRESETS = {
    "standard": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 5, 16)),
    "fast_prover": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 1, 80)),
    "fast_prover2": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 3, 27)),
    "fast_verifier": PcsConfig(pow_bits=23, fri_config=FriConfig(8, 7, 11)),
    "fast_verifier2": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 8, 10)),
    "fast_verifier3": PcsConfig(pow_bits=28, fri_config=FriConfig(7, 9, 8)),
}

# (input, multipliers, output, dest preset) per level
# (multi-proofs/src/main.rs:198-295)
LEVELS = [
    ("recursive_proof_16_15", 5, "level1-5", "fast_prover"),
    ("level1-5", 1, "level2-1", "fast_prover2"),
    ("level2-1", 1, "level3-1", "standard"),
    ("level3-1", 5, "level4-5", "fast_prover"),
    ("level4-5", 1, "level5-1", "fast_prover2"),
    ("level5-1", 1, "level6-1", "standard"),
    ("level6-1", 1, "level7-1", "standard"),
    ("level7-1", 1, "level8-1", "fast_verifier"),
    ("level8-1", 1, "level9-1", "fast_verifier"),
    ("level9-1", 1, "level10-1", "fast_verifier2"),
    ("level10-1", 1, "level11-1", "fast_verifier2"),
    ("level11-1", 1, "level12-1", "fast_verifier3"),
    ("level12-1", 1, "level13-1", "fast_verifier3"),
    ("level13-1", 1, "level14-1", "fast_verifier3"),  # Sha256Poseidon31
]


def load_input(name):
    if name == "recursive_proof_16_15":
        with open(os.path.join(TESTDATA, "recursive_proof_16_15.bin"), "rb") as f:
            return parse_plonk_with_poseidon_proof(f.read())
    with open(os.path.join(DATA, f"{name}.pkl"), "rb") as f:
        return pickle.load(f)


# one id per process so re-runs of a level are distinguishable in the log
RUN_ID = time.strftime("%Y%m%dT%H%M%S")


def append_log(record):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps({"run": RUN_ID, **record}) + "\n")


def demo_recurse(level, proof, multipliers, dest_config, sha256=False):
    """Verify `proof` `multipliers` times into one shared constraint
    system, prove the aggregate, re-verify it natively
    (multi-proofs/src/main.rs:29-170)."""
    t0 = time.time()
    cs = None
    for k in range(multipliers):
        # every chain proof carries the verifier circuit's three bootstrap
        # public inputs (1,1),(2,i),(3,j) (multi-proofs/src/main.rs:52-57)
        cs, _ = build_verifier_circuit(
            proof, list(INPUTS3), cs=cs, finalize=False,
            cross_check=(k == 0),
        )
        print(f"  [{time.time()-t0:7.1f}s] verification #{k+1} in-circuit "
              f"({len(cs.a_wire)} rows so far)", flush=True)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    rows, invocations = len(cs.a_wire), len(cs.flow_wires)
    t_circuit = time.time() - t0
    print(f"  [{t_circuit:7.1f}s] finalized: {rows} rows, "
          f"{invocations} poseidon invocations", flush=True)

    t1 = time.time()
    if sha256:
        from recursive_stwo_tpu.prover.prove_sha256 import prove_sha256p31

        aggregate = prove_sha256p31(
            cs.generate_trace(), dest_config,
            progress=lambda m: print(f"  [{time.time()-t1:7.1f}s] {m}",
                                     flush=True),
        )
    else:
        aggregate = prove(
            cs.generate_trace(), dest_config,
            progress=lambda m: print(f"  [{time.time()-t1:7.1f}s] {m}",
                                     flush=True),
        )
    t_prove = time.time() - t1
    lp, lq = aggregate.log_size_plonk, aggregate.log_size_poseidon
    print(f"  [{t_prove:7.1f}s] aggregate proof: log sizes {lp}/{lq}",
          flush=True)

    t2 = time.time()
    if sha256:
        from recursive_stwo_tpu.verifier.verify_sha256 import (
            verify_sha256p31_host,
        )

        checks = verify_sha256p31_host(aggregate, INPUTS3)
    else:
        spec = VerifierSpec.from_proof(aggregate)
        pa = hints.prepare(spec, [aggregate])
        checks = verify.verify_batch(spec, pa, INPUTS3)
    failing = [k for k, v in checks.items()
               if not bool(np.asarray(v).ravel()[0])]
    assert not failing, failing
    t_verify = time.time() - t2
    print(f"  [{t_verify:7.1f}s] aggregate proof VERIFIED", flush=True)

    append_log({
        "level": level,
        "multipliers": multipliers,
        "rows": rows,
        "poseidon_invocations": invocations,
        "log_size_plonk": lp,
        "log_size_poseidon": lq,
        "channel": "sha256_poseidon31" if sha256 else "poseidon31",
        "circuit_s": round(t_circuit, 1),
        "prove_s": round(t_prove, 1),
        "verify_s": round(t_verify, 1),
        **_routing_info(),
    })
    return aggregate


def _routing_info():
    """Which prover flow handled the level + device HBM peak (auditable
    routing record; VERDICT r3 item 8)."""
    from recursive_stwo_tpu.prover import prove as prove_mod

    info = {"flow": prove_mod.LAST_FLOW}
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            info["hbm_peak_gb"] = round(peak / 2**30, 2)
    except Exception:
        pass
    return info


def main():
    max_levels = int(sys.argv[1]) if len(sys.argv) > 1 else len(LEVELS)
    # RSTPU_CHAIN_FORCE=1: re-prove levels whose artifacts exist and
    # bincode-compare against them instead of skipping (fresh-cache /
    # regression runs; artifacts are never overwritten when they match)
    force = bool(int(os.environ.get("RSTPU_CHAIN_FORCE", "0")))
    os.makedirs(DATA, exist_ok=True)
    for i, (inp, mult, outp, preset) in enumerate(LEVELS[:max_levels]):
        level = i + 1
        out_path = os.path.join(DATA, f"{outp}.pkl")
        if os.path.exists(out_path) and force:
            proof = load_input(inp)
            aggregate = demo_recurse(
                level, proof, mult, PRESETS[preset], sha256=(level == 14)
            )
            from recursive_stwo_tpu.proof.serialize import (
                serialize_plonk_with_poseidon_proof,
            )

            with open(out_path, "rb") as f:
                ref = pickle.load(f)
            roots = np.asarray(ref.stark_proof.commitments)
            mode = (
                "bytes32"
                if roots.dtype == np.uint8 or (roots >= (1 << 31) - 1).any()
                else "m31x8"
            )
            same = serialize_plonk_with_poseidon_proof(
                aggregate, mode
            ) == serialize_plonk_with_poseidon_proof(ref, mode)
            append_log({
                "level": level, "force_reprove": True, "bit_exact": same,
            })
            print(f"level {level}: force re-prove bit-exact={same}",
                  flush=True)
            assert same, f"level {level} diverged from committed artifact"
            continue
        if os.path.exists(out_path):
            print(f"level {level}: {outp}.pkl exists, skipping", flush=True)
            continue
        print(f"level {level}: verify {inp} x{mult} -> {outp} "
              f"[{preset}]", flush=True)
        proof = load_input(inp)
        aggregate = demo_recurse(
            level, proof, mult, PRESETS[preset], sha256=(level == 14)
        )
        with open(out_path, "wb") as f:
            pickle.dump(aggregate, f)
        # reference-compatible bincode alongside the pickle
        # (single-proof/src/main.rs:100-105)
        from recursive_stwo_tpu.proof.serialize import (
            serialize_plonk_with_poseidon_proof,
        )

        # SHA-256 flavors carry full-range 32-bit digest words (or raw
        # bytes); Poseidon31 roots are always canonical M31 limbs
        roots = np.asarray(aggregate.stark_proof.commitments)
        mode = (
            "bytes32"
            if roots.dtype == np.uint8 or (roots >= (1 << 31) - 1).any()
            else "m31x8"
        )
        bin_path = out_path.replace(".pkl", ".bin")
        with open(bin_path, "wb") as f:
            f.write(serialize_plonk_with_poseidon_proof(aggregate, mode))
        print(f"level {level}: saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
