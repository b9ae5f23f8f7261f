"""Definitive stage-0 search for Sha256Channel semantics (total-sum oracle).

Full cartesian product over mix-side and draw-side dimensions, including
32-byte zero-padded felt ops (Poseidon-rate mirroring), digest-replace /
hash-alone / root-as-felts root mixing, per-limb & per-felt & batch draws,
counter and self-hash advances with domain tags, byte reversals, and
z/alpha order.  Run: python tools/probe_sha256_stage0.py
"""

import hashlib
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(HERE, "..", "recursive_stwo_tpu", "testdata", "hybrid_hash.bin")
P = 2147483647


def cmul(a, b, c, d):
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


def btc_num(v):
    if v == 0:
        return b""
    out = bytearray()
    while v:
        out.append(v & 0xFF)
        v >>= 8
    if out[-1] & 0x80:
        out.append(0)
    return bytes(out)


INPUTS = ((1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0)))


def make_checker(S):
    def ok(z, alpha):
        ts = []
        for idx, val in INPUTS:
            ia = tuple(v * idx % P for v in alpha)
            ts.append(qsub(qadd(val, ia), z))
        t1, t2, t3 = ts
        lhs = qadd(qadd(qmul(t2, t3), qmul(t1, t3)), qmul(t1, t2))
        rhs = qmul(S, qmul(t1, qmul(t2, t3)))
        return qadd(lhs, rhs) == (0, 0, 0, 0)

    return ok


def main():
    data = open(FIXTURE, "rb").read()
    proof = parse_plonk_with_poseidon_proof(data, hash_mode="bytes32")
    S = qadd(
        tuple(int(x) for x in proof.plonk_total_sum),
        tuple(int(x) for x in proof.poseidon_total_sum),
    )
    check = make_checker(S)
    roots = [bytes(np.asarray(h, np.uint8)) for h in proof.stark_proof.commitments]
    lp, lq = proof.log_size_plonk, proof.log_size_poseidon

    sha1 = lambda b: hashlib.sha256(b).digest()  # noqa: E731
    shad = lambda b: sha1(sha1(b))  # noqa: E731

    mix_dims = dict(
        hash_fn=["sha", "shad"],
        init=["zeros", "sha_empty"],
        cat_order=["df", "rf"],                    # digest||x vs x||digest
        root_mode=["cat", "replace", "hash_alone", "felts"],
        root_rev=[False, True],
        felt_ser=["u32le", "u32be", "btc", "perlimb_le4", "perlimb_btc"],
        limb_order=["abcd", "dcba"],
        felt_pad=["none", "pad32"],
        stmt0=["felts", "u64le8", "u64be8", "u64le4", "u64btc", "one_le4"],
    )
    draw_streams = []
    # u64-per-limb draws: each M31 = u64 (8 bytes) % P; 4 limbs per 32-byte
    # hash output (one felt per hash step).
    for adv in ("selfhash", "tag00", "c4s0", "c8s0"):
        for src in ("pre", "post"):
            if adv.startswith("c") and src == "post":
                continue
            for enc in ("le", "be"):
                for rev in (False, True):
                    draw_streams.append(("u64x4", adv, src, "first", enc, rev,
                                         "modp"))
    for gran in (1, 4, 8):
        for adv in ("selfhash", "tag00", "tag01", "c4s0", "c4s1", "c8s0", "c8s1"):
            for src in ("pre", "post"):
                if adv.startswith("c") and src == "post":
                    continue
                for win in ("first", "last"):
                    for enc in ("le", "be"):
                        for rev in (False, True):
                            for red in ("mask31", "modp", "shr1"):
                                draw_streams.append(
                                    (gran, adv, src, win, enc, rev, red)
                                )

    mkeys = list(mix_dims)
    seen = set()
    n_states = 0
    n_checks = 0
    hits = []
    for combo in itertools.product(*mix_dims.values()):
        v = dict(zip(mkeys, combo))
        uses_felts = v["stmt0"] == "felts" or v["root_mode"] == "felts"
        if not uses_felts:
            v["felt_ser"], v["limb_order"], v["felt_pad"] = "u32le", "abcd", "none"
        if v["root_mode"] != "cat" and v["stmt0"].startswith("one"):
            pass
        key = tuple(v[k] for k in mkeys)
        if key in seen:
            continue
        seen.add(key)
        n_states += 1

        H = sha1 if v["hash_fn"] == "sha" else shad
        init = H(b"") if v["init"] == "sha_empty" else bytes(32)

        def mix(d, payload):
            return H(payload + d) if v["cat_order"] == "rf" else H(d + payload)

        def feltb(f):
            limbs = list(f) if v["limb_order"] == "abcd" else list(f)[::-1]
            if v["felt_ser"] == "u32le":
                b = b"".join(int(x).to_bytes(4, "little") for x in limbs)
            elif v["felt_ser"] == "u32be":
                b = b"".join(int(x).to_bytes(4, "big") for x in limbs)
            else:
                b = b"".join(btc_num(int(x)) for x in limbs)
            return b

        def mix_felts2(d, f1, f2=None):
            """mix_felts of one or two felts as ONE channel op (or, for the
            perlimb_* serializations, one chained update per M31 limb)."""
            if v["felt_ser"].startswith("perlimb"):
                limbs = list(f1) + (list(f2) if f2 is not None else [])
                if v["limb_order"] == "dcba":
                    limbs = limbs[::-1]
                for x in limbs:
                    if v["felt_ser"] == "perlimb_le4":
                        d = mix(d, int(x).to_bytes(4, "little"))
                    else:
                        d = mix(d, btc_num(int(x)))
                return d
            payload = feltb(f1) + (feltb(f2) if f2 is not None else b"")
            if v["felt_pad"] == "pad32" and v["felt_ser"] != "btc":
                payload = payload.ljust(32, b"\x00")
            return mix(d, payload)

        def mix_root(d, root):
            r = root[::-1] if v["root_rev"] else root
            if v["root_mode"] == "replace":
                return r
            if v["root_mode"] == "hash_alone":
                return H(r)
            if v["root_mode"] == "felts":
                limbs = [
                    (int.from_bytes(r[4 * i : 4 * i + 4], "little") & 0x7FFFFFFF)
                    % P
                    for i in range(8)
                ]
                return mix_felts2(d, limbs[0:4], limbs[4:8])
            return mix(d, r)

        d = mix_root(init, roots[0])
        s0 = v["stmt0"]
        if s0 == "felts":
            d = mix_felts2(d, (lp, 0, 0, 0))
            d = mix_felts2(d, (lq, 0, 0, 0))
        elif s0 == "u64le8":
            d = mix(d, lp.to_bytes(8, "little"))
            d = mix(d, lq.to_bytes(8, "little"))
        elif s0 == "u64be8":
            d = mix(d, lp.to_bytes(8, "big"))
            d = mix(d, lq.to_bytes(8, "big"))
        elif s0 == "u64le4":
            d = mix(d, lp.to_bytes(4, "little"))
            d = mix(d, lq.to_bytes(4, "little"))
        elif s0 == "u64btc":
            d = mix(d, btc_num(lp))
            d = mix(d, btc_num(lq))
        else:  # one_le4
            d = mix(d, lp.to_bytes(4, "little") + lq.to_bytes(4, "little"))
        d = mix_root(d, roots[1])

        for gran, adv, src, win, enc, rev, red in draw_streams:
            o = "little" if enc == "le" else "big"
            state, ctr = d, (1 if adv.endswith("s1") else 0)
            limbs = []
            while len(limbs) < 8:
                if adv == "selfhash":
                    nxt = H(state)
                elif adv == "tag00":
                    nxt = H(state + b"\x00")
                elif adv == "tag01":
                    nxt = H(state + b"\x01")
                elif adv.startswith("c4"):
                    nxt = H(state + ctr.to_bytes(4, "little"))
                else:
                    nxt = H(state + ctr.to_bytes(8, "little"))
                if adv.startswith("c"):
                    srcb = nxt
                    ctr += 1
                else:
                    srcb = state if src == "pre" else nxt
                    state = nxt
                s = srcb[::-1] if rev else srcb
                if gran == "u64x4":
                    for i in range(4):
                        limbs.append(int.from_bytes(s[8 * i : 8 * i + 8], o) % P)
                    continue
                nb = 4 * gran
                chunk = s[:nb] if win == "first" else s[32 - nb :]
                for i in range(gran):
                    x = int.from_bytes(chunk[4 * i : 4 * i + 4], o)
                    if red == "mask31":
                        limbs.append((x & 0x7FFFFFFF) % P)
                    elif red == "modp":
                        limbs.append(x % P)
                    else:
                        limbs.append(x >> 1)
            for limbrev in (False, True):
                ll = (
                    limbs
                    if not limbrev
                    else limbs[3::-1] + limbs[7:3:-1]
                )
                for zswap in (False, True):
                    z, alpha = tuple(ll[0:4]), tuple(ll[4:8])
                    if zswap:
                        z, alpha = alpha, z
                    n_checks += 1
                    if check(z, alpha):
                        hit = dict(v, draw=(gran, adv, src, win, enc, rev, red),
                                   limbrev=limbrev, zswap=zswap)
                        hits.append(hit)
                        print("STAGE 0 PASS:", hit, flush=True)
    print(f"done: {len(hits)} hits; {n_states} mix states, {n_checks} checks")


if __name__ == "__main__":
    main()
