"""The reference's `single-proof` example end-to-end on this framework
(/root/reference/examples/single-proof/src/main.rs:23-120):

1. verify `small_proof.bin` (pow=20, FRI(2,5,16)) inside a
   PlonkWithPoseidon circuit,
2. prove the resulting trace with pow=20, FRI(8,5,16),
3. write recursive_proof_<lp>_<lq>.bin.pkl and re-verify it with the
   native verifier.

Run from the repo root:  python examples/single_proof.py
"""

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
INPUTS3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def main():
    # skip-if-exists memoization, like the reference
    # (single-proof/src/main.rs:100-108)
    existing = [
        f for f in os.listdir(TESTDATA)
        if f.startswith("recursive_proof_") and f.endswith(".bin.pkl")
    ]
    if existing:
        print(f"{existing[0]} exists, skipping (delete it to regenerate)")
        return

    with open(os.path.join(TESTDATA, "small_proof.bin"), "rb") as f:
        proof = parse_plonk_with_poseidon_proof(f.read())

    t0 = time.time()
    cs, _ = build_verifier_circuit(proof, [(1, (1, 0, 0, 0))])
    print(
        f"[{time.time()-t0:7.1f}s] verifier circuit: "
        f"{len(cs.a_wire)} plonk rows, {len(cs.flow_wires)} poseidon invocations"
    )

    trace = cs.generate_trace()
    dest_config = PcsConfig(pow_bits=20, fri_config=FriConfig(8, 5, 16))
    recursive_proof = prove(
        trace, dest_config,
        progress=lambda msg: print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True),
    )
    lp, lq = recursive_proof.log_size_plonk, recursive_proof.log_size_poseidon
    print(f"[{time.time()-t0:7.1f}s] recursive proof generated: log sizes {lp}/{lq}")

    out = os.path.join(TESTDATA, f"recursive_proof_{lp}_{lq}.bin.pkl")
    with open(out, "wb") as f:
        pickle.dump(recursive_proof, f)
    # reference-compatible bincode (single-proof/src/main.rs:100-105)
    from recursive_stwo_tpu.proof.serialize import (
        serialize_plonk_with_poseidon_proof,
    )

    with open(out[: -len(".pkl")] + ".out.bin", "wb") as f:
        f.write(serialize_plonk_with_poseidon_proof(recursive_proof))

    spec = VerifierSpec.from_proof(recursive_proof)
    pa = hints.prepare(spec, [recursive_proof])
    checks = verify.verify_batch(spec, pa, INPUTS3)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v).ravel()[0])]
    assert not failing, failing
    print(f"[{time.time()-t0:7.1f}s] recursive proof VERIFIED (all checks pass)")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
