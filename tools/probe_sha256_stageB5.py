"""Stage B5: extends B4's cross-site PoW-oracle search with three new axes:
skip-site mix families (a transcript site omitted from the chain entirely),
additional PoW nonce limb conventions (le8/be8 with zero padding, sha256d'd
nonces), and double-hash variants of every B4 family.

Machinery in probe_sha256_stageB_common (shared with B4).  Result
(recorded in docs/sha256_channel_notes.md): 0 hits — all extended
families excluded too.
"""
from probe_sha256_stageB_common import (
    M,
    base_families,
    base_nonces,
    base_pow,
    compress,
    n221,
    nonce,
    run_sweep,
    sha,
)


def _extra(name, felts):
    if name == "skip":
        return ("ops", [])
    return None


def _families():
    return base_families() + ["skip"]


def _nonces():
    n = base_nonces()
    n.update({
        "le8pad24_pf_d2": lambda d: sha(sha(nonce.to_bytes(8, "little") + bytes(24) + d)),
        "felt221_pf_d2": lambda d: sha(sha(n221 + bytes(20) + d)),
        "le8_df_d2": lambda d: sha(sha(d + nonce.to_bytes(8, "little"))),
        "skip": lambda d: d,
    })
    return n


def _pow():
    p = base_pow()
    p.update({
        "tz_last4le": lambda d: int.from_bytes(d[28:32], "little") & M == 0,
        "tz_hi16le": lambda d: int.from_bytes(d[16:], "little") & M == 0,
        "tz_le16be": lambda d: int.from_bytes(d[:16], "big") & M == 0,
    })
    return p


if __name__ == "__main__":
    run_sweep(_families(), _nonces(), _pow(), extra=_extra)
