"""Multi-proof aggregation: verify a proof `multipliers` times into ONE
circuit, prove it, and re-verify — the building block of the reference's
14-level recursion chain (/root/reference/examples/multi-proofs/src/main.rs:
29-170; chain topology at :172-295).

Run:  python examples/multi_proofs.py [multipliers]
"""

import os
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

# the reference's six config presets, exactly
# (multi-proofs/src/main.rs:173-196)
PRESETS = {
    "standard": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 5, 16)),
    "fast_prover": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 1, 80)),
    "fast_prover2": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 3, 27)),
    "fast_verifier": PcsConfig(pow_bits=23, fri_config=FriConfig(8, 7, 11)),
    "fast_verifier2": PcsConfig(pow_bits=20, fri_config=FriConfig(8, 8, 10)),
    "fast_verifier3": PcsConfig(pow_bits=28, fri_config=FriConfig(7, 9, 8)),
}


def demo_recurse(proof, multipliers: int, inputs, dest_config: PcsConfig):
    """Verify `proof` `multipliers` times into one shared constraint system,
    then prove the aggregate (main.rs:29-170)."""
    t0 = time.time()
    cs = None
    for k in range(multipliers):
        cs, _ = build_verifier_circuit(
            proof, inputs, cs=cs, finalize=False, cross_check=(k == 0)
        )
        print(f"[{time.time()-t0:7.1f}s] verification #{k+1} in-circuit "
              f"({len(cs.a_wire)} rows so far)")
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    print(f"[{time.time()-t0:7.1f}s] finalized: {len(cs.a_wire)} rows, "
          f"{len(cs.flow_wires)} poseidon invocations")

    aggregate = prove(
        cs.generate_trace(), dest_config,
        progress=lambda m: print(f"[{time.time()-t0:7.1f}s]   prove: {m}",
                                 flush=True),
    )
    print(f"[{time.time()-t0:7.1f}s] aggregate proof: log sizes "
          f"{aggregate.log_size_plonk}/{aggregate.log_size_poseidon}")

    spec = VerifierSpec.from_proof(aggregate)
    pa = hints.prepare(spec, [aggregate])
    checks = verify.verify_batch(spec, pa, INPUTS3)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v).ravel()[0])]
    assert not failing, failing
    print(f"[{time.time()-t0:7.1f}s] aggregate proof VERIFIED")
    return aggregate


def main():
    multipliers = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    with open(os.path.join(TESTDATA, "small_proof.bin"), "rb") as f:
        proof = parse_plonk_with_poseidon_proof(f.read())
    demo_recurse(proof, multipliers, [(1, (1, 0, 0, 0))], PRESETS["standard"])


if __name__ == "__main__":
    main()
