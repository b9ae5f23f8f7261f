"""Last-layer flow: verify a proof inside a PlonkWithoutPoseidon circuit
with all Fiat-Shamir/decommitment data as packed public inputs, then prove
that circuit (the Bitcoin-facing step;
/root/reference/examples/last-layer/src/main.rs:30-202).

The reference feeds a Sha256Poseidon31-channel proof (hybrid_hash.bin);
its SHA-256 host channel is not implemented yet, so this example runs the
identical circuit machinery on the Poseidon31-channel fixture.  The
output proof here still uses the Poseidon31 channel (the without-poseidon
AIR prover, reference's `prove_plonk_without_poseidon`, is future work —
the circuit + trace generation below is the complete last-layer circuit
side).

Run:  python examples/last_layer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.recursion.pipeline import build_last_circuit

TESTDATA = os.path.join(
    os.path.dirname(__file__), "..", "recursive_stwo_tpu", "testdata"
)


def main():
    with open(os.path.join(TESTDATA, "small_proof.bin"), "rb") as f:
        proof = parse_plonk_with_poseidon_proof(f.read())

    t0 = time.time()
    cs, results = build_last_circuit(proof, [(1, (1, 0, 0, 0))])
    print(
        f"[{time.time()-t0:6.1f}s] last-layer circuit: {len(cs.a_wire)} rows, "
        f"{cs.num_input} public inputs"
    )
    trace = cs.generate_trace()
    print(
        f"[{time.time()-t0:6.1f}s] trace generated: "
        f"{len(trace)} column tensors (op1..op4 selector gate set)"
    )


if __name__ == "__main__":
    main()
