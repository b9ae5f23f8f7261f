"""Shared machinery for the stage-B SHA-256 mix-chain probes (B4/B5).

Premise (both stages): upstream stwo's Blake2sChannel mixes felts with the
raw COMPRESSION function (digest as chaining value, felts packed into
message blocks, no padding), so a faithful sha256 mirror would be invisible
to all plain-sha256 probes — hence the compression-function families.
Fixture loading, the pure-python sha256 compression function, the felt
limb-stream encoders, the mix-family compiler, and the PoW-oracle sweep
driver live here; each stage supplies its extra families/nonces/oracles.
"""
import hashlib
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.verifier.arrays import flatten_samples
from recursive_stwo_tpu.verifier.spec import VerifierSpec

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(
    HERE, "..", "recursive_stwo_tpu", "testdata", "hybrid_hash.bin"
)
sha = lambda b: hashlib.sha256(b).digest()  # noqa: E731

# ---- raw sha256 compression ----
K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
    0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
    0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
    0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
    0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
    0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208, 0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]
MASK = 0xFFFFFFFF
rotr = lambda x, n: ((x >> n) | (x << (32 - n))) & MASK  # noqa: E731


def compress(state_bytes, block):
    h = list(struct.unpack(">8I", state_bytes))
    w = list(struct.unpack(">16I", block))
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & MASK)
    a, b, c, d, e, f, g, hh = h
    for i in range(64):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (hh + S1 + ch + K[i] + w[i]) & MASK
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & MASK
        hh, g, f, e, d, c, b, a = g, f, e, (d + t1) & MASK, c, b, a, (t1 + t2) & MASK
    out = [(x + y) & MASK for x, y in zip(h, [a, b, c, d, e, f, g, hh])]
    return struct.pack(">8I", *out)


assert hashlib.sha256(b"x" * 64).digest() != compress(bytes(32), b"x" * 64)

data = open(FIXTURE, "rb").read()
proof = parse_plonk_with_poseidon_proof(data, hash_mode="bytes32")
spec = VerifierSpec.from_proof(proof)
sp = proof.stark_proof
roots = [bytes(np.asarray(h, np.uint8)) for h in sp.commitments]
fl_root = bytes(np.asarray(sp.fri_proof.first_layer.commitment, np.uint8))
inner_roots = [
    bytes(np.asarray(l.commitment, np.uint8)) for l in sp.fri_proof.inner_layers
]
last_poly = np.asarray(sp.fri_proof.last_layer_poly, np.uint32)
samples = flatten_samples(spec, proof)
nonce = int(proof.stark_proof.proof_of_work)

le32 = lambda limbs: b"".join(int(x).to_bytes(4, "little") for x in limbs)  # noqa: E731
be32 = lambda limbs: b"".join(int(x).to_bytes(4, "big") for x in limbs)  # noqa: E731


def limbstream(felts, limb_rev=False, felt_rev=False, be=False):
    F = np.asarray(felts, np.uint32).reshape(-1, 4)
    if felt_rev:
        F = F[::-1]
    if limb_rev:
        F = F[:, ::-1]
    enc = be32 if be else le32
    return enc(F.reshape(-1))


def compile_family(name, felts, extra=None):
    """-> ('ops', [(payload, 'pf'|'df'|'pf2'|'df2')]) or ('compress', bytes).

    `extra(name, felts)` may return a compiled family for stage-specific
    names (e.g. B5's "skip") or None to fall through."""
    if extra is not None:
        got = extra(name, felts)
        if got is not None:
            return got
    if name.startswith("comp_"):
        be = name.endswith("_be")
        return ("compress", limbstream(felts, be=be))
    base, *mods = name.split("+")
    limb_rev = "lr" in mods
    felt_rev = "fr" in mods
    be = "be" in mods
    dbl = "d2" in mods
    stream = limbstream(felts, limb_rev, felt_rev, be)
    nf = np.asarray(felts, np.uint32).reshape(-1, 4).shape[0]
    pf, df = ("pf2", "df2") if dbl else ("pf", "df")
    chunks = [
        stream[i : i + 32] + bytes(32 - len(stream[i : i + 32]))
        for i in range(0, len(stream), 32)
    ]
    if base == "pairs_pf":
        return ("ops", [(c, pf) for c in chunks])
    if base == "pairs_df":
        return ("ops", [(c, df) for c in chunks])
    if base == "oneop_pf":
        return ("ops", [(stream, pf)])
    if base == "oneop_df":
        return ("ops", [(stream, df)])
    if base == "len_oneop_pf":
        return ("ops", [(struct.pack("<I", nf) + stream, pf)])
    if base == "len_oneop_df":
        return ("ops", [(struct.pack("<Q", nf) + stream, df)])
    if base == "perfelt_pf":
        return ("ops", [(stream[i : i + 16] + bytes(16), pf) for i in range(0, len(stream), 16)])
    if base == "perfelt_df":
        return ("ops", [(stream[i : i + 16], df) for i in range(0, len(stream), 16)])
    raise KeyError(name)


def base_families():
    fams = []
    for b in ["pairs_pf", "pairs_df", "oneop_pf", "oneop_df", "perfelt_pf", "perfelt_df"]:
        for mods in ["", "+lr", "+fr", "+lr+fr", "+be", "+d2"]:
            fams.append(b + mods)
    fams += ["len_oneop_pf", "len_oneop_df", "comp_le", "comp_be"]
    return fams


def apply_family(d, compiled):
    kind, payload = compiled
    if kind == "compress":
        stream = payload + bytes((-len(payload)) % 64)
        for i in range(0, len(stream), 64):
            d = compress(d, stream[i : i + 64])
        return d
    for pay, mode in payload:
        if mode == "pf":
            d = sha(pay + d)
        elif mode == "df":
            d = sha(d + pay)
        elif mode == "pf2":
            d = sha(sha(pay + d))
        else:
            d = sha(sha(d + pay))
    return d


n221 = le32([nonce & 0x3FFFFF, (nonce >> 22) & 0x1FFFFF, (nonce >> 43) & 0x1FFFFF])


def base_nonces():
    return {
        "le8pad24_pf": lambda d: sha(nonce.to_bytes(8, "little") + bytes(24) + d),
        "felt221_pf": lambda d: sha(n221 + bytes(20) + d),
        "le8_df": lambda d: sha(d + nonce.to_bytes(8, "little")),
        "comp_le8": lambda d: compress(d, nonce.to_bytes(8, "little") + bytes(56)),
    }


M = (1 << 28) - 1


def base_pow():
    return {
        "tz_le": lambda d: int.from_bytes(d, "little") & M == 0,
        "tz_be": lambda d: int.from_bytes(d, "big") & M == 0,
        "lz_be": lambda d: int.from_bytes(d, "big") >> (256 - 28) == 0,
    }


stmt1_felts = np.stack([
    np.asarray(proof.plonk_total_sum, np.uint32),
    np.asarray(proof.poseidon_total_sum, np.uint32),
])


def run_sweep(families, nonces, pow_oracles, extra=None):
    """Full cross-site enumeration against the fixture's PoW oracle."""
    c_stmt1 = {f: compile_family(f, stmt1_felts, extra) for f in families}
    c_samples = {f: compile_family(f, samples, extra) for f in families}
    c_last = {f: compile_family(f, last_poly, extra) for f in families}

    d0 = sha(bytes(32) + roots[0])
    d0 = sha(int(proof.log_size_plonk).to_bytes(4, "little") + bytes(28) + d0)
    d0 = sha(int(proof.log_size_poseidon).to_bytes(4, "little") + bytes(28) + d0)
    d0 = sha(d0 + roots[1])

    hits = 0
    checked = 0
    for f1 in families:
        d1 = apply_family(d0, c_stmt1[f1])
        d1 = sha(d1 + roots[2])
        d1 = sha(d1 + roots[3])
        for f2 in families:
            d2 = apply_family(d1, c_samples[f2])
            d2 = sha(d2 + fl_root)
            for r in inner_roots:
                d2 = sha(d2 + r)
            for f3 in families:
                d3 = apply_family(d2, c_last[f3])
                for nname, nf in nonces.items():
                    dn = nf(d3)
                    for pname, pf in pow_oracles.items():
                        checked += 1
                        if pf(dn):
                            hits += 1
                            print("PASS:", f1, f2, f3, nname, pname, flush=True)
    print("done", hits, "hits /", checked)
    return hits, checked
