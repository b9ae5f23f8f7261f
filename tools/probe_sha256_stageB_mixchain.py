"""Stage B standalone: pin Sha256Channel.mix_felts via the PoW oracle.

Key fact: draws never mutate the digest (stage-0 confirmed), so the digest at
PoW-check time depends ONLY on the mix chain: roots (confirmed op), stmt0
(confirmed op), stmt1, sampled values, FRI roots, last poly, nonce.  The
28-bit trailing-zero PoW condition (pow_bits=28, hybrid_hash.bin) is a
2^-28 oracle over mix_felts + nonce encodings, independent of every draw.

New lead: components/last/fiat_shamir/src/lib.rs:42-55 shows the channel's
view of sampled values is Poseidon31 hash_leaf = permute_get_rate(
[0;8] || hash_column_get_capacity(limbs)) -- i.e. mix_felts is plausibly a
Poseidon pre-hash followed by one sha256 op.
"""
import hashlib, itertools, os, sys
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
last_poly = np.asarray(sp.fri_proof.last_layer_poly, np.uint32)  # (L,4)
samples = flatten_samples(spec, proof)  # (S,4)
nonce = int(proof.stark_proof.proof_of_work)

le32 = lambda limbs: b"".join(int(x).to_bytes(4, "little") for x in limbs)
be32 = lambda limbs: b"".join(int(x).to_bytes(4, "big") for x in limbs)


def hash_leaf_limbs(limbs):
    cols = np.asarray(limbs, np.uint32)[None]
    return [int(x) for x in np.asarray(vm.hash_leaf(cols))[0]]


def hash_cap_limbs(limbs):
    cols = np.asarray(limbs, np.uint32)[None]
    return [int(x) for x in np.asarray(vm.hash_columns_capacity(cols))[0]]


# mix_felts(felts) families; felts is (k,4) uint array; returns f(digest)->digest
def family(name):
    def limbs_of(felts):
        return [int(x) for x in np.asarray(felts, np.uint32).reshape(-1)]

    if name == "pos_leaf_pf":
        return lambda felts: (lambda h: (lambda d: sha(le32(h) + d)))(hash_leaf_limbs(limbs_of(felts)))
    if name == "pos_leaf_df":
        return lambda felts: (lambda h: (lambda d: sha(d + le32(h))))(hash_leaf_limbs(limbs_of(felts)))
    if name == "pos_leaf_pf_be":
        return lambda felts: (lambda h: (lambda d: sha(be32(h) + d)))(hash_leaf_limbs(limbs_of(felts)))
    if name == "pos_cap_pf":
        return lambda felts: (lambda h: (lambda d: sha(le32(h) + d)))(hash_cap_limbs(limbs_of(felts)))
    if name == "pos_cap_df":
        return lambda felts: (lambda h: (lambda d: sha(d + le32(h))))(hash_cap_limbs(limbs_of(felts)))

    def chain(ops):
        def run(d):
            for op in ops:
                d = op(d)
            return d
        return run

    if name == "pairs_pf":
        def f(felts):
            L = limbs_of(felts)
            L = L + [0] * ((-len(L)) % 8)
            return chain([(lambda pay: lambda d: sha(pay + d))(le32(L[i : i + 8])) for i in range(0, len(L), 8)])
        return f
    if name == "pairs_df":
        def f(felts):
            L = limbs_of(felts)
            L = L + [0] * ((-len(L)) % 8)
            return chain([(lambda pay: lambda d: sha(d + pay))(le32(L[i : i + 8])) for i in range(0, len(L), 8)])
        return f
    if name == "oneop_pf":
        return lambda felts: (lambda pay: lambda d: sha(pay + d))(le32(limbs_of(felts)))
    if name == "oneop_df":
        return lambda felts: (lambda pay: lambda d: sha(d + pay))(le32(limbs_of(felts)))
    if name == "perfelt_pf_pad":
        def f(felts):
            return chain([(lambda pay: lambda d: sha(pay + bytes(16) + d))(le32(fe)) for fe in np.asarray(felts, np.uint32)])
        return f
    if name == "perfelt_df":
        def f(felts):
            return chain([(lambda pay: lambda d: sha(d + pay))(le32(fe)) for fe in np.asarray(felts, np.uint32)])
        return f
    raise KeyError(name)


FAMILIES = [
    "pos_leaf_pf", "pos_leaf_df", "pos_leaf_pf_be", "pos_cap_pf", "pos_cap_df",
    "pairs_pf", "pairs_df", "oneop_pf", "oneop_df", "perfelt_pf_pad", "perfelt_df",
]

NONCES = {
    "le8pad24_pf": lambda d: sha(nonce.to_bytes(8, "little") + bytes(24) + d),
    "felt221_pf": lambda d: sha(
        le32([nonce & 0x3FFFFF, (nonce >> 22) & 0x1FFFFF, (nonce >> 43) & 0x1FFFFF]) + bytes(20) + d
    ),
    "le8_df": lambda d: sha(d + nonce.to_bytes(8, "little")),
    "be8pad24_pf": lambda d: sha(nonce.to_bytes(8, "big") + bytes(24) + d),
}

POW = {
    "le": lambda d: int.from_bytes(d, "little") & ((1 << 28) - 1) == 0,
    "be": lambda d: int.from_bytes(d, "big") & ((1 << 28) - 1) == 0,
}


def prefix_digest():
    d = sha(bytes(32) + roots[0])
    d = sha(int(proof.log_size_plonk).to_bytes(4, "little") + bytes(28) + d)
    d = sha(int(proof.log_size_poseidon).to_bytes(4, "little") + bytes(28) + d)
    d = sha(d + roots[1])
    return d


stmt1_felts = np.stack([np.asarray(proof.plonk_total_sum, np.uint32), np.asarray(proof.poseidon_total_sum, np.uint32)])
hits = []
for fam in FAMILIES:
    F = family(fam)
    d = prefix_digest()
    d = F(stmt1_felts)(d)
    d = sha(d + roots[2])
    d = sha(d + roots[3])
    d = F(samples)(d)
    d = sha(d + fl_root)
    for r in inner_roots:
        d = sha(d + r)
    d = F(last_poly)(d)
    for nname, nf in NONCES.items():
        dn = nf(d)
        for pname, pf in POW.items():
            if pf(dn):
                hits.append((fam, nname, pname))
                print("STAGE B PASS:", fam, nname, pname, flush=True)
print("done", len(hits), "hits /", len(FAMILIES) * len(NONCES) * len(POW), "combos")
