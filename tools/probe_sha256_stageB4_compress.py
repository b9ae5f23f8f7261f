"""Stage B, widest net: compression-function mixing + reversals + length
prefixes + sha256d, cross-site, PoW oracle.

Machinery in probe_sha256_stageB_common (shared with B5); this driver runs
the base family/nonce/oracle grid.  Result (recorded in
docs/sha256_channel_notes.md): 0 hits — all families excluded.
"""
from probe_sha256_stageB_common import (
    base_families,
    base_nonces,
    base_pow,
    run_sweep,
)

if __name__ == "__main__":
    run_sweep(base_families(), base_nonces(), base_pow())
