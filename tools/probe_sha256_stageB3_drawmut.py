"""Stage B with digest-mutating draws.

Hypothesis: Sha256Channel draws REPLACE the digest (script-friendly channels
have no counter); the stage-0 "digest unchanged" assumption was never
verified past the first draw.  Squeeze points in the pre-PoW transcript:
after c1 (z/alpha), after c2 (random_coeff), after c3 (oods_t), after
samples mix (after_coeff), after first-layer root (alpha0), after each
inner root (alpha_i).  Mutation rules g(d) tried alongside the stage-B2
mix-felts cross product.
"""
import hashlib, os, sys
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.verifier.arrays import flatten_samples
from recursive_stwo_tpu.verifier.spec import VerifierSpec
from recursive_stwo_tpu.verifier import merkle as vm

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(HERE, "..", "recursive_stwo_tpu", "testdata", "hybrid_hash.bin")
sha = lambda b: hashlib.sha256(b).digest()

data = open(FIXTURE, "rb").read()
proof = parse_plonk_with_poseidon_proof(data, hash_mode="bytes32")
spec = VerifierSpec.from_proof(proof)
sp = proof.stark_proof
roots = [bytes(np.asarray(h, np.uint8)) for h in sp.commitments]
fl_root = bytes(np.asarray(sp.fri_proof.first_layer.commitment, np.uint8))
inner_roots = [bytes(np.asarray(l.commitment, np.uint8)) for l in sp.fri_proof.inner_layers]
last_poly = np.asarray(sp.fri_proof.last_layer_poly, np.uint32)
samples = flatten_samples(spec, proof)
nonce = int(proof.stark_proof.proof_of_work)

le32 = lambda limbs: b"".join(int(x).to_bytes(4, "little") for x in limbs)
be32 = lambda limbs: b"".join(int(x).to_bytes(4, "big") for x in limbs)


def hash_leaf_limbs(limbs):
    return [int(x) for x in np.asarray(vm.hash_leaf(np.asarray(limbs, np.uint32)[None]))[0]]


def hash_cap_limbs(limbs):
    return [int(x) for x in np.asarray(vm.hash_columns_capacity(np.asarray(limbs, np.uint32)[None]))[0]]


def compile_family(name, felts):
    L = [int(x) for x in np.asarray(felts, np.uint32).reshape(-1)]
    F = np.asarray(felts, np.uint32).reshape(-1, 4)
    pad8 = L + [0] * ((-len(L)) % 8)
    pairs = [pad8[i : i + 8] for i in range(0, len(pad8), 8)]
    return {
        "pos_leaf_pf": [(le32(hash_leaf_limbs(L)), "pf")],
        "pos_leaf_df": [(le32(hash_leaf_limbs(L)), "df")],
        "pos_cap_pf": [(le32(hash_cap_limbs(L)), "pf")],
        "pos_cap_df": [(le32(hash_cap_limbs(L)), "df")],
        "pairs_pf": [(le32(p), "pf") for p in pairs],
        "pairs_df": [(le32(p), "df") for p in pairs],
        "oneop_pf": [(le32(L), "pf")],
        "oneop_df": [(le32(L), "df")],
        "perfelt_pf_pad": [(le32(f) + bytes(16), "pf") for f in F],
        "perfelt_df": [(le32(f), "df") for f in F],
    }[name]


FAMILIES = [
    "pos_leaf_pf", "pos_leaf_df", "pos_cap_pf", "pos_cap_df",
    "pairs_pf", "pairs_df", "oneop_pf", "oneop_df", "perfelt_pf_pad", "perfelt_df",
]


def apply_ops(d, ops):
    for pay, mode in ops:
        d = sha(pay + d) if mode == "pf" else sha(d + pay)
    return d


GS = {
    "h00": lambda d: sha(d + bytes(4)),   # digest := the squeeze hash itself
    "resha": lambda d: sha(d),
    "b0": lambda d: sha(d + b"\x00"),
    "b1": lambda d: sha(d + b"\x01"),
    "pf00": lambda d: sha(bytes(4) + d),
}

n221 = le32([nonce & 0x3FFFFF, (nonce >> 22) & 0x1FFFFF, (nonce >> 43) & 0x1FFFFF])
NONCES = {
    "le8pad24_pf": [(nonce.to_bytes(8, "little") + bytes(24), "pf")],
    "felt221_pf": [(n221 + bytes(20), "pf")],
    "le8_df": [(nonce.to_bytes(8, "little"), "df")],
    "le8pad24_df": [(nonce.to_bytes(8, "little") + bytes(24), "df")],
    "felt221_df": [(n221 + bytes(20), "df")],
}

M = (1 << 28) - 1
POW = {
    "tz_le": lambda d: int.from_bytes(d, "little") & M == 0,
    "tz_be": lambda d: int.from_bytes(d, "big") & M == 0,
    "lz_be": lambda d: int.from_bytes(d, "big") >> (256 - 28) == 0,
}

stmt1_felts = np.stack([np.asarray(proof.plonk_total_sum, np.uint32), np.asarray(proof.poseidon_total_sum, np.uint32)])
OPS_STMT1 = {f: compile_family(f, stmt1_felts) for f in FAMILIES}
OPS_SAMPLES = {f: compile_family(f, samples) for f in FAMILIES}
OPS_LAST = {f: compile_family(f, last_poly) for f in FAMILIES}

hits = 0
checked = 0
for gname, g in GS.items():
    d0 = sha(bytes(32) + roots[0])
    d0 = sha(int(proof.log_size_plonk).to_bytes(4, "little") + bytes(28) + d0)
    d0 = sha(int(proof.log_size_poseidon).to_bytes(4, "little") + bytes(28) + d0)
    d0 = sha(d0 + roots[1])
    d0 = g(d0)  # z/alpha squeeze
    for f1 in FAMILIES:
        d1 = apply_ops(d0, OPS_STMT1[f1])
        d1 = sha(d1 + roots[2])
        d1 = g(d1)  # random_coeff
        d1 = sha(d1 + roots[3])
        d1 = g(d1)  # oods_t
        for f2 in FAMILIES:
            d2 = apply_ops(d1, OPS_SAMPLES[f2])
            d2 = g(d2)  # after_coeff
            d2 = sha(d2 + fl_root)
            d2 = g(d2)  # first-layer alpha
            for r in inner_roots:
                d2 = sha(d2 + r)
                d2 = g(d2)  # inner alpha
            for f3 in FAMILIES:
                d3 = apply_ops(d2, OPS_LAST[f3])
                for nname, nops in NONCES.items():
                    dn = apply_ops(d3, nops)
                    for pname, pf in POW.items():
                        checked += 1
                        if pf(dn):
                            hits += 1
                            print("PASS:", gname, f1, f2, f3, nname, pname, flush=True)
print("done", hits, "hits /", checked)
