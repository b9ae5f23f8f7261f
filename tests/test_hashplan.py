"""Direct unit tests for the lane-major hash-plan scans
(verifier/hashplan.py): the jax scan path and the numpy loop path must
produce identical digests and verdicts for randomly-shaped synthetic
walks, and a wrong root/sibling must flip exactly the affected walk.

Semantics mirror /root/reference/primitives/merkle/src/lib.rs (node =
P(l || r) rate half, column digest = capacity absorb of 8-chunks)."""

import numpy as np
import pytest

from recursive_stwo_tpu.core import poseidon2
from recursive_stwo_tpu.verifier import hashplan

P = (1 << 31) - 1
B, Q = 3, 4


def _rand(rng, *shape):
    return rng.integers(0, P, shape, dtype=np.int64).astype(np.uint32)


def _node(l, r):
    return np.asarray(
        poseidon2.permute(np.concatenate([l, r], axis=-1))
    )[..., :8]


def _col_cap(cols):
    """Capacity absorb of (..., n) columns in chunks of 8."""
    n = cols.shape[-1]
    pad = (-n) % 8
    if pad:
        cols = np.concatenate(
            [cols, np.zeros(cols.shape[:-1] + (pad,), np.uint32)], axis=-1
        )
    cap = np.zeros(cols.shape[:-1] + (8,), np.uint32)
    for k in range(cols.shape[-1] // 8):
        chunk = cols[..., 8 * k : 8 * k + 8]
        cap = np.asarray(
            poseidon2.permute(np.concatenate([chunk, cap], axis=-1))
        )[..., 8:]
    return cap


def _leaf_fin(cap):
    return _node(np.zeros_like(cap), cap)[..., :8]


def _build_single(rng, depth, col_levels):
    """A consistent single-path walk: random per-query leaf positions,
    random sibling hashes, columns absorbed at `col_levels`; returns
    (SingleWalk ctor kwargs in raw (B, Q, ...) form, expected root)."""
    # every query of a proof shares one witness so all Q digests must
    # land on the proof's single root (the walk verdict is all-queries)
    queries = np.repeat(
        rng.integers(0, 1 << depth, (B, 1)).astype(np.uint32), Q, axis=1
    )
    sib = np.repeat(_rand(rng, B, 1, depth, 8), Q, axis=1)
    leaf_cols = np.repeat(_rand(rng, B, 1, 11), Q, axis=1)
    leaf = _leaf_fin(_col_cap(leaf_cols))
    col_caps_raw = {
        h: np.repeat(_rand(rng, B, 1, 5), Q, axis=1) for h in col_levels
    }

    cur = leaf.copy()
    for t in range(depth):
        bit = (queries >> t) & 1
        l = np.where(bit[..., None] != 0, sib[:, :, t], cur)
        r = np.where(bit[..., None] != 0, cur, sib[:, :, t])
        cur = _node(l, r)
        h = depth - 1 - t
        if h in col_caps_raw:
            cur = _node(cur, _col_cap(col_caps_raw[h]))
    root = cur[:, 0]  # (B, 8), identical across queries

    return dict(
        depth=depth,
        queries=queries,
        sibling_hashes=sib,
        leaf_cols=leaf_cols,
        col_cols=col_caps_raw,
        root=root,
    )


def _run(walks_raw, backend):
    """Assemble chains/leaf/walks through the public hashplan API on the
    given backend ('np' or 'jax') and return per-walk verdict arrays."""
    if backend == "jax":
        import jax.numpy as jnp

        cast = jnp.asarray
    else:
        cast = lambda x: x  # noqa: E731

    chains, chain_of = [], []
    for w in walks_raw:
        chain_of.append(
            dict(
                leaf=len(chains),
                cols={h: len(chains) + 1 + i
                      for i, h in enumerate(sorted(w["col_cols"]))},
            )
        )
        chains.append(cast(w["leaf_cols"]))
        for h in sorted(w["col_cols"]):
            chains.append(cast(w["col_cols"][h]))
    digests = hashplan.absorb_packed(chains)
    leafs = hashplan.leaf_rate_many(
        [digests[c["leaf"]] for c in chain_of]
    )
    singles = []
    for i, w in enumerate(walks_raw):
        singles.append(
            hashplan.SingleWalk(
                depth=w["depth"],
                queries=cast(w["queries"]),
                sibling_hashes=cast(w["sibling_hashes"]),
                col_caps={
                    h: digests[chain_of[i]["cols"][h]]
                    for h in w["col_cols"]
                },
                leaf=leafs[i],
                root=cast(w["root"]),
            )
        )
    oks, _ = hashplan.walk_scan(singles, [])
    return [np.asarray(o) for o in oks]


@pytest.fixture(scope="module")
def walks():
    rng = np.random.default_rng(7)
    return [
        _build_single(rng, 6, [2, 4]),
        _build_single(rng, 9, [0]),
        _build_single(rng, 4, []),
    ]


def test_walks_accept_np(walks):
    for ok in _run(walks, "np"):
        assert ok.shape == (B,) and ok.all()


def test_walks_accept_jax_matches_np(walks):
    np_oks = _run(walks, "np")
    jax_oks = _run(walks, "jax")
    for a, b in zip(np_oks, jax_oks):
        assert np.array_equal(a, b) and a.all()


def test_wrong_root_flips_only_that_walk(walks):
    bad = [dict(w) for w in walks]
    bad[1] = dict(bad[1], root=bad[1]["root"] ^ 1)
    oks = _run(bad, "np")
    assert oks[0].all() and oks[2].all() and not oks[1].any()


def test_corrupt_sibling_flips_only_that_walk(walks):
    bad = [dict(w) for w in walks]
    sib = bad[0]["sibling_hashes"].copy()
    sib[1, :, 2, 3] ^= 1  # proof 1 only
    bad[0] = dict(bad[0], sibling_hashes=sib)
    oks = _run(bad, "np")
    assert not oks[0][1] and oks[0][[0, 2]].all()
    assert oks[1].all() and oks[2].all()
