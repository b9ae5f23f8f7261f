"""Enumerate Sha256Channel semantic variants against hybrid_hash.bin oracles.

Stage 0: logup total-sum identity (validates mix_root, stmt0 felt mixing,
         z/alpha draw; false positive 2^-124).  Multiplicative form (no
         inversions): 1/t1+1/t2+1/t3 = -S  <=>
         t2*t3 + t1*t3 + t1*t2 + S*t1*t2*t3 = 0.
Stage A: composition identity at OODS.  Stage B: PoW >= 28 trailing zeros.

Run: python tools/probe_sha256.py
"""

import hashlib
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recursive_stwo_tpu.core.qm31 import QM31
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.verifier import composition as composition_mod
from recursive_stwo_tpu.verifier import points
from recursive_stwo_tpu.verifier.arrays import flatten_samples
from recursive_stwo_tpu.verifier.spec import VerifierSpec

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(HERE, "..", "recursive_stwo_tpu", "testdata", "hybrid_hash.bin")
P = 2147483647


def sha(b):
    return hashlib.sha256(b).digest()


# ---- pure-python QM31 (tuples mod P) --------------------------------------

def cmul(a, b, c, d):  # (a+bi)(c+di)
    return ((a * c - b * d) % P, (a * d + b * c) % P)


def qmul(x, y):
    pr = cmul(x[0], x[1], y[0], y[1])
    qs = cmul(x[2], x[3], y[2], y[3])
    ps = cmul(x[0], x[1], y[2], y[3])
    qr = cmul(x[2], x[3], y[0], y[1])
    return (
        (pr[0] + 2 * qs[0] - qs[1]) % P,
        (pr[1] + 2 * qs[1] + qs[0]) % P,
        (ps[0] + qr[0]) % P,
        (ps[1] + qr[1]) % P,
    )


def qadd(x, y):
    return tuple((a + b) % P for a, b in zip(x, y))


def qsub(x, y):
    return tuple((a - b) % P for a, b in zip(x, y))


def btc_num(v: int) -> bytes:
    """Bitcoin script minimal number encoding (non-negative)."""
    if v == 0:
        return b""
    out = bytearray()
    while v:
        out.append(v & 0xFF)
        v >>= 8
    if out[-1] & 0x80:
        out.append(0)
    return bytes(out)


class Chan:
    def __init__(self, v):
        self.v = v
        self.digest = sha(b"") if v["init"] == "sha_empty" else bytes(32)
        self.n_sent = v["counter_start"]

    def update(self, payload):
        if self.v["root_order"] == "digest_first":
            self.digest = sha(self.digest + payload)
        else:
            self.digest = sha(payload + self.digest)
        self.n_sent = self.v["counter_start"]

    def mix_root(self, root):
        self.update(root)

    def feltb(self, f):
        order = self.v["limb_order"]
        limbs = list(f) if order == "abcd" else list(f)[::-1]
        ser = self.v["felt_ser"]
        if ser == "u32x4_le":
            return b"".join(int(x).to_bytes(4, "little") for x in limbs)
        if ser == "u32x4_be":
            return b"".join(int(x).to_bytes(4, "big") for x in limbs)
        if ser == "btc":
            return b"".join(btc_num(int(x)) for x in limbs)
        raise ValueError(ser)

    def mix_felts(self, felts):
        felts = [tuple(int(x) for x in f) for f in felts]
        ch = self.v["felt_chain"]
        if ch == "all":
            self.update(b"".join(self.feltb(f) for f in felts))
        elif ch == "per_felt":
            for f in felts:
                self.update(self.feltb(f))
        elif ch == "pairs":
            for i in range(0, len(felts), 2):
                self.update(b"".join(self.feltb(f) for f in felts[i : i + 2]))
        elif ch == "pairs_pad":
            for i in range(0, len(felts), 2):
                chunk = felts[i : i + 2]
                if len(chunk) == 1:
                    chunk = [chunk[0], (0, 0, 0, 0)]
                self.update(b"".join(self.feltb(f) for f in chunk))
        else:
            raise ValueError(ch)

    def mix_u64(self, x):
        enc = self.v["u64_enc"]
        if enc == "le8":
            self.update(int(x).to_bytes(8, "little"))
        elif enc == "be8":
            self.update(int(x).to_bytes(8, "big"))
        elif enc == "felt221":
            lo = x & ((1 << 22) - 1)
            mid = (x >> 22) & ((1 << 21) - 1)
            hi = (x >> 43) & ((1 << 21) - 1)
            self.mix_felts([(lo, mid, hi, 0)])
        elif enc == "btc":
            self.update(btc_num(int(x)))
        else:
            raise ValueError(enc)

    def mix_stmt0(self, lp, lq):
        m = self.v["stmt0_mode"]
        if m == "two_u64":
            self.mix_u64(lp)
            self.mix_u64(lq)
        elif m == "felts":
            self.mix_felts([(lp, 0, 0, 0)])
            self.mix_felts([(lq, 0, 0, 0)])
        else:
            raise ValueError(m)

    def draw_bytes(self):
        m = self.v["draw_mode"]
        if m == "selfhash":
            self.digest = sha(self.digest)
            return self.digest
        if m == "extract_first":
            s = self.digest
            self.digest = sha(self.digest)
            return s
        if m in ("counter4", "counter8"):
            nb = 4 if m == "counter4" else 8
            enc = self.n_sent.to_bytes(nb, "little")
            s = (
                sha(enc + self.digest)
                if self.v["counter_pos"] == "prefix"
                else sha(self.digest + enc)
            )
            self.n_sent += 1
            return s
        raise ValueError(m)

    def extract_u32s(self, data):
        order = "little" if self.v["extract_enc"] == "le" else "big"
        return [int.from_bytes(data[4 * i : 4 * i + 4], order) for i in range(8)]

    def draw_base_felts(self):
        n_limb = 8 if self.v["felts_per_draw"] == 2 else 4
        while True:
            limbs = self.extract_u32s(self.draw_bytes())[:n_limb]
            if self.v["extract"] == "mask31":
                return [(x & 0x7FFFFFFF) % P for x in limbs]
            if all(x < 2 * P for x in limbs):
                return [x % P for x in limbs]

    def draw_felts(self, n):
        if self.v["draw_felts_mode"] == "per_call":
            return [tuple(self.draw_base_felts()[:4]) for _ in range(n)]
        limbs = []
        while len(limbs) < 4 * n:
            limbs.extend(self.draw_base_felts())
        return [tuple(limbs[4 * i : 4 * i + 4]) for i in range(n)]

    def draw_felt(self):
        return tuple(self.draw_base_felts()[:4])

    def draw_u32s(self):
        return self.extract_u32s(self.draw_bytes())

    def trailing_zeros(self):
        x = int.from_bytes(self.digest[:16], "little")
        return 128 if x == 0 else (x & -x).bit_length() - 1

    def fork(self):
        c = Chan(self.v)
        c.digest, c.n_sent = self.digest, self.n_sent
        return c


INPUTS = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def total_sum_ok(S, z, alpha):
    ts = []
    for idx, val in INPUTS:
        ia = tuple(v * idx % P for v in alpha)
        ts.append(qsub(qadd(val, ia), z))
    t1, t2, t3 = ts
    lhs = qadd(qadd(qmul(t2, t3), qmul(t1, t3)), qmul(t1, t2))
    rhs = qmul(S, qmul(t1, qmul(t2, t3)))
    return qadd(lhs, rhs) == (0, 0, 0, 0)


def main():
    data = open(FIXTURE, "rb").read()
    proof = parse_plonk_with_poseidon_proof(data, hash_mode="bytes32")
    spec = VerifierSpec.from_proof(proof)
    sp = proof.stark_proof
    roots = [bytes(np.asarray(h, np.uint8)) for h in sp.commitments]
    S = qadd(
        tuple(int(x) for x in proof.plonk_total_sum),
        tuple(int(x) for x in proof.poseidon_total_sum),
    )

    grid = dict(
        init=["zeros", "sha_empty"],
        root_order=["digest_first", "root_first"],
        stmt0_mode=["felts", "two_u64"],
        u64_enc=["le8", "be8", "felt221", "btc"],
        felt_ser=["u32x4_le", "u32x4_be", "btc"],
        limb_order=["abcd", "dcba"],
        felt_chain=["per_felt", "pairs_pad", "all"],
        draw_mode=["counter8", "counter4", "selfhash", "extract_first"],
        counter_pos=["suffix", "prefix"],
        counter_start=[0, 1],
        extract=["reduce2p", "mask31"],
        extract_enc=["le", "be"],
        felts_per_draw=[2, 1],
        draw_felts_mode=["flatten", "per_call"],
    )
    keys = list(grid)
    hits = []
    n_tried = 0
    seen = set()
    for combo in itertools.product(*grid.values()):
        v = dict(zip(keys, combo))
        # canonicalize away irrelevant dims to skip duplicates
        if v["stmt0_mode"] != "two_u64":
            v["u64_enc"] = "le8"
        if v["stmt0_mode"] == "two_u64" and v["u64_enc"] != "felt221":
            v["felt_ser"], v["limb_order"], v["felt_chain"] = "u32x4_le", "abcd", "all"
        if v["draw_mode"] not in ("counter4", "counter8"):
            v["counter_pos"], v["counter_start"] = "suffix", 0
        if v["felts_per_draw"] == 1:
            v["draw_felts_mode"] = "flatten"
        key = tuple(v[k] for k in keys)
        if key in seen:
            continue
        seen.add(key)
        n_tried += 1
        ch = Chan(v)
        ch.mix_root(roots[0])
        ch.mix_stmt0(proof.log_size_plonk, proof.log_size_poseidon)
        ch.mix_root(roots[1])
        z, alpha = ch.draw_felts(2)
        if total_sum_ok(S, z, alpha):
            hits.append(v)
            print("STAGE 0 PASS:", v)
    print(f"stage 0: {len(hits)} hits / {n_tried} tried")

    # Stage A: composition oracle (adds stmt1 mix_felts + 2 draws)
    samples = flatten_samples(spec, proof)[None]

    def qb(t):
        return QM31(*(np.array([x], np.uint32) for x in t))

    psum, qsum = qb(proof.plonk_total_sum), qb(proof.poseidon_total_sum)
    sampled_list = []
    for tree in sp.sampled_values:
        for col in tree:
            for row in col:
                sampled_list.append(tuple(int(x) for x in row))

    stage_a = []
    for v0 in hits:
        felt_dims = (
            itertools.product(["u32x4_le", "u32x4_be", "btc"],
                              ["abcd", "dcba"],
                              ["per_felt", "pairs_pad", "pairs", "all"])
            if v0["stmt0_mode"] == "two_u64"
            else [(v0["felt_ser"], v0["limb_order"], fc)
                  for fc in ["per_felt", "pairs_pad", "pairs", "all"]]
        )
        for felt_ser, limb_order, felt_chain in felt_dims:
            v = dict(v0, felt_ser=felt_ser, limb_order=limb_order,
                     felt_chain=felt_chain)
            ch = Chan(v)
            ch.mix_root(roots[0])
            ch.mix_stmt0(proof.log_size_plonk, proof.log_size_poseidon)
            ch.mix_root(roots[1])
            z, alpha = ch.draw_felts(2)
            ch.mix_felts([proof.plonk_total_sum, proof.poseidon_total_sum])
            ch.mix_root(roots[2])
            rc = ch.draw_felt()
            ch.mix_root(roots[3])
            oods_t = ch.draw_felt()
            ok = composition_mod.composition_check(
                spec, samples, psum, qsum, (qb(z), qb(alpha)), qb(rc),
                points.oods_point_from_t(qb(oods_t)),
            )
            if bool(np.asarray(ok)[0]):
                stage_a.append((v, ch))
                print("STAGE A PASS:", v)
    print(f"stage A: {len(stage_a)} hits")

    # Stage B: sampled mix + FRI roots + last poly + PoW nonce
    for v, ch in stage_a:
        for lastpoly in ["felts", "skip"]:
            for u64_enc in ["le8", "be8", "felt221", "btc"]:
                c2 = ch.fork()
                c2.mix_felts(sampled_list)
                c2.draw_felt()  # after_sampled_values_random_coeff
                c2.mix_root(bytes(np.asarray(
                    sp.fri_proof.first_layer.commitment, np.uint8)))
                c2.draw_felt()
                for layer in sp.fri_proof.inner_layers:
                    c2.mix_root(bytes(np.asarray(layer.commitment, np.uint8)))
                    c2.draw_felt()
                if lastpoly == "felts":
                    c2.mix_felts([tuple(int(x) for x in r)
                                  for r in sp.fri_proof.last_layer_poly])
                c3 = c2.fork()
                c3.v = dict(c2.v, u64_enc=u64_enc)
                c3.mix_u64(sp.proof_of_work)
                tz = c3.trailing_zeros()
                if tz >= spec.pow_bits:
                    print(">>> STAGE B PASS — SEMANTICS LOCKED")
                    print("   variant:", v, "lastpoly:", lastpoly,
                          "nonce_enc:", u64_enc, "tz:", tz)
                    raw = []
                    while len(raw) < spec.n_queries:
                        raw.extend(c3.draw_u32s())
                    print("   raw queries:",
                          [x & ((1 << spec.max_first_layer_log) - 1)
                           for x in raw[: spec.n_queries]])


if __name__ == "__main__":
    main()
