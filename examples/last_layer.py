"""Last-layer flow (the Bitcoin-facing step;
/root/reference/examples/last-layer/src/main.rs:30-202):

1. obtain a Sha256Poseidon31-flavor PlonkWithPoseidon proof (the
   reference's hybrid_hash.bin role).  If the recursion chain has produced
   examples/data/level14-1.pkl, that proof is used; otherwise a standalone
   input proof is generated here (verify small_proof in a with-poseidon
   circuit, prove it under the SHA-256 channel + SHA-256 trees) and
   memoized to examples/data/sha256p31_input.pkl,
2. natively verify it (verify_sha256p31_host),
3. verify it inside a PlonkWithoutPoseidon circuit with all
   Fiat-Shamir/decommitment data as packed public inputs,
4. prove that circuit under the Sha256MerkleChannel flavor (SHA-256
   channel + SHA-256 trees) -> examples/data/bitcoin_proof.pkl,
5. re-verify the output natively (verify_sha256np_host).

The stwo fork's exact SHA-256 byte conventions are not recoverable
(docs/sha256_channel_notes.md), so steps 1-5 use the framework's own
fully specified SHA-256 flavor end-to-end — same structure, same circuit
machinery, self-consistent transcripts.

Run:  python examples/last_layer.py
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.prover.commit import Sha256CommittedTree
from recursive_stwo_tpu.prover.prove_np import prove_np
from recursive_stwo_tpu.prover.prove_sha256 import (
    Sha256ProverChannel,
    prove_sha256p31,
)
from recursive_stwo_tpu.recursion.pipeline import (
    build_last_circuit,
    build_verifier_circuit,
)
from recursive_stwo_tpu.verifier import sha256_merkle
from recursive_stwo_tpu.verifier.verify_sha256 import (
    run_transcript_sha256p31,
    verify_sha256np_host,
    verify_sha256p31_host,
)

TESTDATA = os.path.join(
    os.path.dirname(__file__), "..", "recursive_stwo_tpu", "testdata"
)
DATA = os.path.join(os.path.dirname(__file__), "data")
INPUTS3 = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))

# input-proof config for the standalone path (the reference's real input is
# pow=28 FRI(7,9,8) — the chain's fast_verifier3 level; the standalone
# generation here uses a lighter blowup so the example runs in minutes)
INPUT_CONFIG = PcsConfig(pow_bits=20, fri_config=FriConfig(2, 2, 16))
# output config (the reference emits FRI(0,9,8) pow=28; lightened likewise)
OUTPUT_CONFIG = PcsConfig(pow_bits=10, fri_config=FriConfig(2, 2, 16))


def obtain_input_proof(t0):
    """Chain level-14 output if present, else memoized standalone proof.

    Returns (proof, inner_inputs, from_chain): with real chain output the
    example also switches to the reference's output config
    (last-layer/src/main.rs:96-99)."""
    # every proof produced by the verifier circuit carries the three
    # bootstrap public inputs (1,1),(2,i),(3,j) — wires 1..3 are pinned
    # (multi-proofs/src/main.rs:52-57)
    lvl14 = os.path.join(DATA, "level14-1.pkl")
    if os.path.exists(lvl14):
        with open(lvl14, "rb") as f:
            return pickle.load(f), INPUTS3, True
    memo = os.path.join(DATA, "sha256p31_input.pkl")
    if os.path.exists(memo):
        with open(memo, "rb") as f:
            return pickle.load(f), INPUTS3, False
    with open(os.path.join(TESTDATA, "small_proof.bin"), "rb") as f:
        base = parse_plonk_with_poseidon_proof(f.read())
    cs, _ = build_verifier_circuit(base, [(1, (1, 0, 0, 0))])
    print(f"[{time.time()-t0:6.1f}s] input circuit: {len(cs.a_wire)} rows")
    proof = prove_sha256p31(
        cs.generate_trace(), INPUT_CONFIG,
        progress=lambda m: print(f"[{time.time()-t0:6.1f}s]   prove: {m}"),
    )
    os.makedirs(DATA, exist_ok=True)
    with open(memo, "wb") as f:
        pickle.dump(proof, f)
    return proof, INPUTS3, False


def warm_compile():
    """Compile-warm the last-layer prove programs (tools/warm_chain.py):
    build the circuit from the committed level-14 artifact and prove it
    under the chain output config, discarding the proof."""
    lvl14_path = os.path.join(DATA, "level14-1.pkl")
    with open(lvl14_path, "rb") as f:
        proof = pickle.load(f)
    cs, _ = build_last_circuit(
        proof,
        list(INPUTS3),
        transcript_fn=lambda s, pa: run_transcript_sha256p31(s, proof),
        hash_node_fn=sha256_merkle.hash_node,
    )
    trace = cs.generate_trace()
    prove_np(
        trace,
        PcsConfig(pow_bits=28, fri_config=FriConfig(0, 9, 8)),
        channel=Sha256ProverChannel(),
        tree_cls=Sha256CommittedTree,
    )


def main():
    t0 = time.time()
    proof, inner_inputs, from_chain = obtain_input_proof(t0)
    # real chain output -> the reference's output config FRI(0,9,8) pow=28
    # (last-layer/src/main.rs:96-99); override with RSTPU_LAST_LIGHT=1
    out_config = OUTPUT_CONFIG
    if from_chain and not int(os.environ.get("RSTPU_LAST_LIGHT", "0")):
        out_config = PcsConfig(pow_bits=28, fri_config=FriConfig(0, 9, 8))
    print(f"[{time.time()-t0:6.1f}s] Sha256Poseidon31 input proof: log sizes "
          f"{proof.log_size_plonk}/{proof.log_size_poseidon}"
          + (" (chain level 14)" if from_chain else " (standalone)"))

    checks = verify_sha256p31_host(proof, inner_inputs)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing
    print(f"[{time.time()-t0:6.1f}s] input proof natively verified "
          f"(SHA-256 channel)")

    cs, results = build_last_circuit(
        proof,
        list(inner_inputs),
        transcript_fn=lambda s, pa: run_transcript_sha256p31(s, proof),
        hash_node_fn=sha256_merkle.hash_node,
    )
    print(
        f"[{time.time()-t0:6.1f}s] last-layer circuit: {len(cs.a_wire)} rows, "
        f"{cs.num_input} public inputs"
    )
    trace = cs.generate_trace()

    out = prove_np(
        trace, out_config,
        progress=lambda m: print(f"[{time.time()-t0:6.1f}s]   prove: {m}"),
        channel=Sha256ProverChannel(),
        tree_cls=Sha256CommittedTree,
    )
    print(f"[{time.time()-t0:6.1f}s] Sha256MerkleChannel output proof "
          f"(log_size={out.log_size})")
    os.makedirs(DATA, exist_ok=True)
    with open(os.path.join(DATA, "bitcoin_proof.pkl"), "wb") as f:
        pickle.dump(out, f)
    # reference-compatible bincode (last-layer/src/main.rs:196-200);
    # SHA-256 digest words -> 32-byte hashes
    from recursive_stwo_tpu.proof.serialize import (
        serialize_plonk_without_poseidon_proof,
    )

    with open(os.path.join(DATA, "bitcoin_proof.bin"), "wb") as f:
        f.write(serialize_plonk_without_poseidon_proof(out, "bytes32"))

    inputs = tuple(
        (i + 1, tuple(int(x) for x in cs.value(i + 1)))
        for i in range(cs.num_input)
    )
    checks = verify_sha256np_host(out, inputs)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing
    print(f"[{time.time()-t0:6.1f}s] output proof verified "
          f"({len(checks)-1} checks) -> {os.path.join(DATA, 'bitcoin_proof.pkl')}")

    # one auditable row per run, like recursion_chain.py (VERDICT r3 #8)
    from recursive_stwo_tpu.prover import prove as prove_mod

    log_row = {
        "run": time.strftime("%Y%m%dT%H%M%S"),
        "level": "last_layer",
        "input": "level14-1" if from_chain else "standalone",
        "rows": len(cs.a_wire),
        "public_inputs": cs.num_input,
        "channel_out": "sha256",
        "config_out": f"pow={out_config.pow_bits} FRI("
        f"{out_config.fri_config.log_last_layer_degree_bound},"
        f"{out_config.fri_config.log_blowup_factor},"
        f"{out_config.fri_config.n_queries})",
        "flow": prove_mod.LAST_FLOW,
        "total_s": round(time.time() - t0, 1),
        "artifact": "bitcoin_proof.pkl",
    }
    with open(
        os.path.join(os.path.dirname(__file__), "..", "docs",
                     "chain_log.jsonl"), "a"
    ) as f:
        import json

        f.write(json.dumps(log_row) + "\n")


if __name__ == "__main__":
    main()
