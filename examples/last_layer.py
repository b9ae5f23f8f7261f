"""Last-layer flow: verify a proof inside a PlonkWithoutPoseidon circuit
with all Fiat-Shamir/decommitment data as packed public inputs, then prove
that circuit with the without-poseidon AIR prover and re-verify the result
(the Bitcoin-facing step; /root/reference/examples/last-layer/src/main.rs:30-202).

The reference feeds a Sha256Poseidon31-channel proof (hybrid_hash.bin);
its SHA-256 host channel is partially reconstructed (see
docs/sha256_channel_notes.md), so this example runs the identical circuit
machinery on the Poseidon31-channel fixture, and the output proof uses
the Poseidon31 channel with a light PCS config (the reference's
Sha256MerkleChannel FRI(0,9,8) exists for Bitcoin-script replay, which is
out of scope for the TPU framework's own chain).

Run:  python examples/last_layer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.prover.prove_np import prove_np
from recursive_stwo_tpu.recursion.pipeline import build_last_circuit
from recursive_stwo_tpu.verifier import hints, transcript
from recursive_stwo_tpu.verifier.arrays import from_proofs_np
from recursive_stwo_tpu.verifier.spec import NoPoseidonVerifierSpec
from recursive_stwo_tpu.verifier.verify_np import verify_batch_np

TESTDATA = os.path.join(
    os.path.dirname(__file__), "..", "recursive_stwo_tpu", "testdata"
)

OUTPUT_CONFIG = PcsConfig(
    pow_bits=10,
    fri_config=FriConfig(
        log_last_layer_degree_bound=2, log_blowup_factor=2, n_queries=16
    ),
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

    out = prove_np(
        trace, OUTPUT_CONFIG,
        progress=lambda m: print(f"[{time.time()-t0:6.1f}s]   prove: {m}"),
    )
    print(f"[{time.time()-t0:6.1f}s] without-poseidon proof generated "
          f"(log_size={out.log_size})")

    spec = NoPoseidonVerifierSpec.for_rows(out.log_size, OUTPUT_CONFIG)
    spec.validate(out)
    inputs = tuple(
        (i + 1, tuple(int(x) for x in cs.value(i + 1)))
        for i in range(cs.num_input)
    )
    pa = hints.prepare(
        spec, [out],
        arrays_fn=from_proofs_np,
        transcript_fn=transcript.run_transcript_np,
    )
    checks = verify_batch_np(spec, pa, inputs)
    assert all(bool(np.asarray(v).all()) for v in checks.values()), checks
    print(f"[{time.time()-t0:6.1f}s] last-layer proof verified "
          f"({len(checks)-1} checks)")


if __name__ == "__main__":
    main()
