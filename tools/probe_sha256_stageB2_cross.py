"""Stage B cross-product: independent mix_felts families per mix site.

Sites: stmt1 (2 felts), sampled values (S felts), last poly (128 felts).
Each family compiles to a fixed list of (payload_bytes, mode) ops where
mode 'pf' => d = sha(payload || d), 'df' => d = sha(d || payload).
Nonce + PoW-rule variants on top.  Oracle: pow_bits=28 trailing/leading
zeros of the post-nonce digest.
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
    """-> list of (payload, mode)."""
    L = [int(x) for x in np.asarray(felts, np.uint32).reshape(-1)]
    F = np.asarray(felts, np.uint32).reshape(-1, 4)
    pad8 = L + [0] * ((-len(L)) % 8)
    pairs = [pad8[i : i + 8] for i in range(0, len(pad8), 8)]
    if name == "pos_leaf_pf":
        return [(le32(hash_leaf_limbs(L)), "pf")]
    if name == "pos_leaf_df":
        return [(le32(hash_leaf_limbs(L)), "df")]
    if name == "pos_leaf_pf_be":
        return [(be32(hash_leaf_limbs(L)), "pf")]
    if name == "pos_leaf_df_be":
        return [(be32(hash_leaf_limbs(L)), "df")]
    if name == "pos_cap_pf":
        return [(le32(hash_cap_limbs(L)), "pf")]
    if name == "pos_cap_df":
        return [(le32(hash_cap_limbs(L)), "df")]
    if name == "pairs_pf":
        return [(le32(p), "pf") for p in pairs]
    if name == "pairs_df":
        return [(le32(p), "df") for p in pairs]
    if name == "pairs_pf_be":
        return [(be32(p), "pf") for p in pairs]
    if name == "oneop_pf":
        return [(le32(L), "pf")]
    if name == "oneop_df":
        return [(le32(L), "df")]
    if name == "oneop_df_be":
        return [(be32(L), "df")]
    if name == "perfelt_pf_pad":
        return [(le32(f) + bytes(16), "pf") for f in F]
    if name == "perfelt_df":
        return [(le32(f), "df") for f in F]
    if name == "perfelt_df_pad":
        return [(le32(f) + bytes(16), "df") for f in F]
    raise KeyError(name)


FAMILIES = [
    "pos_leaf_pf", "pos_leaf_df", "pos_leaf_pf_be", "pos_leaf_df_be",
    "pos_cap_pf", "pos_cap_df", "pairs_pf", "pairs_df", "pairs_pf_be",
    "oneop_pf", "oneop_df", "oneop_df_be", "perfelt_pf_pad", "perfelt_df",
    "perfelt_df_pad",
]


def apply_ops(d, ops):
    for pay, mode in ops:
        d = sha(pay + d) if mode == "pf" else sha(d + pay)
    return d


n221 = le32([nonce & 0x3FFFFF, (nonce >> 22) & 0x1FFFFF, (nonce >> 43) & 0x1FFFFF])
NONCES = {
    "le8pad24_pf": [(nonce.to_bytes(8, "little") + bytes(24), "pf")],
    "felt221_pf": [(n221 + bytes(20), "pf")],
    "le8_df": [(nonce.to_bytes(8, "little"), "df")],
    "le8pad24_df": [(nonce.to_bytes(8, "little") + bytes(24), "df")],
    "felt221_df": [(n221 + bytes(20), "df")],
    "be8_df": [(nonce.to_bytes(8, "big"), "df")],
    "be8pad24_pf": [(nonce.to_bytes(8, "big") + bytes(24), "pf")],
}

M = (1 << 28) - 1
POW = {
    "tz_le": lambda d: int.from_bytes(d, "little") & M == 0,
    "tz_be": lambda d: int.from_bytes(d, "big") & M == 0,
    "lz_be": lambda d: int.from_bytes(d, "big") >> (256 - 28) == 0,
    "lz_le": lambda d: int.from_bytes(d, "little") >> (256 - 28) == 0,
    "tz_be16": lambda d: int.from_bytes(d[:16], "big") & M == 0,
}

stmt1_felts = np.stack([np.asarray(proof.plonk_total_sum, np.uint32), np.asarray(proof.poseidon_total_sum, np.uint32)])
OPS_STMT1 = {f: compile_family(f, stmt1_felts) for f in FAMILIES}
OPS_SAMPLES = {f: compile_family(f, samples) for f in FAMILIES}
OPS_LAST = {f: compile_family(f, last_poly) for f in FAMILIES}

d0 = sha(bytes(32) + roots[0])
d0 = sha(int(proof.log_size_plonk).to_bytes(4, "little") + bytes(28) + d0)
d0 = sha(int(proof.log_size_poseidon).to_bytes(4, "little") + bytes(28) + d0)
d0 = sha(d0 + roots[1])

hits = 0
checked = 0
for f1 in FAMILIES:
    d1 = apply_ops(d0, OPS_STMT1[f1])
    d1 = sha(d1 + roots[2])
    d1 = sha(d1 + roots[3])
    for f2 in FAMILIES:
        d2 = apply_ops(d1, OPS_SAMPLES[f2])
        d2 = sha(d2 + fl_root)
        for r in inner_roots:
            d2 = sha(d2 + r)
        for f3 in FAMILIES:
            d3 = apply_ops(d2, OPS_LAST[f3])
            for nname, nops in NONCES.items():
                dn = apply_ops(d3, nops)
                for pname, pf in POW.items():
                    checked += 1
                    if pf(dn):
                        hits += 1
                        print("STAGE B PASS:", f1, f2, f3, nname, pname, flush=True)
print("done", hits, "hits /", checked, "combos")
