"""End-to-end recursive-verifier circuit builder.

`build_verifier_circuit` runs all four in-circuit stages (fiat_shamir ->
composition -> answer -> folding) over one parsed proof, exactly like the
reference `examples/single-proof/src/main.rs:23-95`, returning the
finalized constraint system whose trace tensors feed the prover.
"""

from __future__ import annotations

from typing import List, Tuple

from ..cs.system import PlonkWithPoseidonCS
from ..gadgets.fields import QM31Var
from ..proof.containers import PlonkWithPoseidonProof
from ..verifier import hints as hints_mod
from ..verifier import transcript
from ..verifier.spec import VerifierSpec
from .answer import AnswerResults
from .composition import CompositionCheck
from .data_structures import ProofVar
from .fiat_shamir import FiatShamirResults
from .folding import FoldingResults


def build_verifier_circuit(
    proof: PlonkWithPoseidonProof,
    inputs: List[Tuple[int, tuple]],
    cs: PlonkWithPoseidonCS | None = None,
    finalize: bool = True,
    cross_check: bool = True,
):
    """Verify `proof` inside a PlonkWithPoseidon circuit.

    inputs: [(wire_index, qm31_tuple)] public-input claims.
    Returns (cs, stage results dict). Multiple proofs can share one cs by
    passing it back in (the multi-proofs pattern,
    examples/multi-proofs/src/main.rs:69-139).
    """
    spec = VerifierSpec.from_proof(proof)
    pa = hints_mod.prepare(spec, [proof])
    fs = transcript.run_transcript(spec, pa)
    native_answers = (
        hints_mod.host_fri_answers(spec, fs, pa, pa.tree_paths)
        if cross_check
        else None
    )

    cs = cs or PlonkWithPoseidonCS()
    proof_var = ProofVar(cs, proof)
    input_vars = [
        (idx, QM31Var.new_constant(cs, tuple(v))) for idx, v in inputs
    ]

    fs_results = FiatShamirResults.compute(spec, fs, proof_var, input_vars)
    CompositionCheck.compute(
        spec,
        fs_results.lookup_elements,
        fs_results.random_coeff,
        fs_results.oods_point,
        proof_var,
    )
    answer_results = AnswerResults.compute(
        spec,
        fs_results.oods_point,
        fs_results,
        proof_var,
        pa.tree_paths,
        native_answers,
    )
    FoldingResults.compute(
        spec,
        proof_var,
        fs_results,
        answer_results,
        pa.first_layer_paths,
        pa.inner_layer_paths,
    )

    if finalize:
        cs.pad()
        cs.check_arithmetics()
        cs.populate_logup_arguments()
        cs.check_poseidon_invocations()

    return cs, {
        "spec": spec,
        "proof_var": proof_var,
        "fs_results": fs_results,
        "answer_results": answer_results,
    }
