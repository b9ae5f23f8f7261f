"""Streamed (chunked) device prover: big-blowup shapes on the TPU.

The fully device-resident pipeline (device_prove.py) keeps every LDE and
Merkle level in HBM at once; at the fast_verifier presets (blowups 7-9,
max LDE domains 2^23-2^26, multi-proofs/src/main.rs:173-196) that exceeds
the 16G HBM of a single chip, and round 1-3 routed those shapes to a slow
2-core host flow (20-50 min/level).  This module restructures the prover so
HBM holds only O(base-domain) state:

* **Chunked circle-FFT evaluation.**  LDE coefficients are the base
  coefficients zero-padded into the larger FFT basis (the stwo basis is
  nested), and for every butterfly layer whose step exceeds the base size
  the second operand is zero — so each aligned output chunk of base size
  equals the base coefficients transformed with that chunk's twiddle
  slices.  LDE columns are therefore never materialized: tree commitment
  and quotient accumulation re-evaluate chunks on the fly and discard them.

* **On-device chunk geometry.**  A chunk's domain points form a fixed
  per-(domain, tile-size) table rotated by one per-chunk base point
  (circle group law: index arithmetic is affine in the bit-reversed
  position), so the host uploads 2 field elements per chunk instead of
  twiddle slices.  Twiddles, fold 1/x and 1/y tables are all derived
  in-kernel from the tile points.

* **Streamed Merkle commitment.**  Each kernel call hashes one span of
  leaf rows (absorbing every column level it covers) and folds it down to
  a cutoff level K; only levels K..0 (a few thousand digests) leave the
  device.  Decommitment recomputes the ≤ n_queries spans it touches and
  checks them against the stored summit digests.

The emitted proofs are byte-identical to the host flow / device pipeline
(tests/test_stream_prover.py; chain artifacts re-proved bit-exact).
Capability mirror of stwo's `prove_plonk_with_poseidon` consumed at
/root/reference/examples/multi-proofs/src/main.rs:141-147.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from ..core import circle as ccircle
from ..core import m31, poseidon2
from ..core import qm31 as q
from ..core.qm31 import QM31
from ..proof.containers import PcsConfig, PlonkWithPoseidonProof
from ..verifier.spec import VerifierSpec
from . import air, circle_fft, fri
from .channel import PoseidonChannel
from .commit import CommittedTree, _hash_leaf_level, _hash_node_level
from .device_prove import (
    DeviceTree,
    _absorb_columns,
    _composition_coeffs_jit,
    _interaction_cols_jit,
)

ORDER = 1 << 31


def _chunk_log_default() -> int:
    return int(os.environ.get("RSTPU_STREAM_CHUNK_LOG", "20"))


def _cutoff_default() -> int:
    return int(os.environ.get("RSTPU_STREAM_CUTOFF", "13"))


# below this size a single-level resident tree just uses the fused
# device tree (its full level set is small enough to keep in HBM)
_RES_STREAM_MIN = 23


# ---------------------------------------------------------------------------
# tile geometry (host tables, lru-cached)
#
# Bit-reversed position p = j*2^b + r decomposes as
#   br_T(p) = br_b(r) * 2^(T-b) + br_{T-b}(j)
# so the point index  I + br_T(p)*S  is (base point of tile j) + (tile-local
# offset of r): every tile is the same 2^b-point table rotated by one base
# point.  Circle domains additionally conjugate the second half of the
# bit-reversed order, which in tile coordinates is exactly the odd r.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def circle_tile_table(T: int, b: int) -> Tuple[np.ndarray, np.ndarray]:
    """(tx, ty) uint32 (2^b,): tile-local points (pre-conjugation)."""
    dom = ccircle.CanonicCoset(T).circle_domain()
    S = dom.half_coset.step_index
    brr = ccircle.bit_reverse_indices(b)
    half = 1 << (b - 1)
    local = np.where(brr < half, brr, brr - half).astype(np.uint64)
    step = np.uint64(((1 << (T - b)) * S) % ORDER)
    idx = (local * step) % np.uint64(ORDER)
    return ccircle.apoints_at_indices(idx)


@lru_cache(maxsize=None)
def circle_tile_bases(T: int, b: int) -> Tuple[np.ndarray, np.ndarray]:
    """(bx, by) uint32 (2^(T-b),): base point of every tile."""
    dom = ccircle.CanonicCoset(T).circle_domain()
    I, S = dom.half_coset.initial_index, dom.half_coset.step_index
    j = ccircle.bit_reverse_indices(T - b).astype(np.uint64)
    idx = (np.uint64(I) + j * np.uint64(S)) % np.uint64(ORDER)
    return ccircle.apoints_at_indices(idx)


@lru_cache(maxsize=None)
def line_tile_table(T: int, b: int) -> Tuple[np.ndarray, np.ndarray]:
    """Tile table for the half_odds(T) coset (line-fold domains, no
    conjugation; fri.line_fold_xinv indexing)."""
    coset = ccircle.Coset.half_odds(T)
    brr = ccircle.bit_reverse_indices(b).astype(np.uint64)
    step = np.uint64(((1 << (T - b)) * coset.step_index) % ORDER)
    idx = (brr * step) % np.uint64(ORDER)
    return ccircle.apoints_at_indices(idx)


@lru_cache(maxsize=None)
def line_tile_bases(T: int, b: int) -> Tuple[np.ndarray, np.ndarray]:
    coset = ccircle.Coset.half_odds(T)
    j = ccircle.bit_reverse_indices(T - b).astype(np.uint64)
    idx = (
        np.uint64(coset.initial_index) + j * np.uint64(coset.step_index)
    ) % np.uint64(ORDER)
    return ccircle.apoints_at_indices(idx)


@lru_cache(maxsize=None)
def _odd_mask(b: int) -> np.ndarray:
    return (np.arange(1 << b) & 1).astype(bool)


# ---------------------------------------------------------------------------
# traced tile kernels (numpy/jax agnostic m31 ops)
# ---------------------------------------------------------------------------


def _tile_points(bx, by, tx, ty, conj):
    """Rotate the tile table by per-tile base points.

    bx/by (G,), tx/ty (2^b,) -> (cx, cy) each (G, 2^b); `conj` is the odd
    mask for circle domains (None for line cosets)."""
    cx = m31.sub(
        m31.mul(bx[:, None], tx[None, :]), m31.mul(by[:, None], ty[None, :])
    )
    cy = m31.add(
        m31.mul(bx[:, None], ty[None, :]), m31.mul(by[:, None], tx[None, :])
    )
    if conj is not None:
        if type(cy).__module__.startswith("jax"):
            import jax.numpy as jnp

            cy = jnp.where(conj[None, :], m31.neg(cy), cy)
        else:
            cy = np.where(conj[None, :], m31.neg(cy), cy)
    return cx, cy


def _tile_twiddles(cx, cy, b: int) -> List:
    """Per-tile twiddle slices (layer k has trailing dim 2^(b-1-k)),
    mirroring circle_fft._twiddles restricted to the tile."""
    tws = [cy[..., 0::2]]
    cur = cx[..., 0::2]
    for _ in range(1, b):
        t = cur[..., 0::2]
        tws.append(t)
        cur = ccircle.apoint_double_x(t)
    return tws


def _eval_tiles(coeffs, tws, b: int):
    """Evaluate base coefficients (n_cols, 2^b) on G tiles at once ->
    (n_cols, G, 2^b).  Bit-exact restriction of circle_fft.evaluate over
    the zero-padded LDE basis."""
    xp_is_jax = type(coeffs).__module__.startswith("jax")
    if xp_is_jax:
        import jax.numpy as jnp

        xp = jnp
    else:
        xp = np
    n = 1 << b
    G = tws[0].shape[0] if b > 0 else 1
    v = xp.broadcast_to(coeffs[:, None, :], coeffs.shape[:1] + (G, n))
    for layer in reversed(range(b)):
        step = 1 << layer
        groups = n // (2 * step)
        g = v.reshape(v.shape[:-1] + (groups, 2, step))
        f0, f1 = g[..., 0, :], g[..., 1, :]
        t = tws[layer].reshape((G, groups, 1))
        tf1 = m31.mul(f1, t)
        v = xp.stack(
            [m31.add(f0, tf1), m31.sub(f0, tf1)], axis=-2
        ).reshape(v.shape)
    return v


# ---------------------------------------------------------------------------
# column sources
# ---------------------------------------------------------------------------


class CoeffSource:
    """Columns given by base-domain FFT coefficients; evaluated per chunk."""

    kind = "eval"

    def __init__(self, coeffs_dev, L: int):
        self.dev = coeffs_dev
        self.n_cols = int(coeffs_dev.shape[0])
        self.b = int(coeffs_dev.shape[1]).bit_length() - 1
        self.L = int(L)
        self._host = None

    @property
    def host(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self.dev, np.uint32)
        return self._host


class ResidentSource:
    """Columns resident on the device as a full (n_cols, 2^L) array."""

    kind = "res"

    def __init__(self, dev):
        self.dev = dev
        self.n_cols = int(dev.shape[0])
        self.b = 0


class _ColShape:
    """Shape-only stand-in so CommittedTree's planning code (which checks
    level membership and column counts) works without materialized data."""

    def __init__(self, shape):
        self.shape = shape


# ---------------------------------------------------------------------------
# streamed commit kernel
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _commit_chunk_jit(plan: tuple, C: int, K: int, flavor: str = "p31"):
    """plan: ((kind, L, n_cols, b), ...) desc by L.  One call hashes a span
    of 2^C leaf rows down to its 2^(C-(M-K)) summit digests at level K,
    absorbing every column level it covers.

    flavor "p31": hash semantics identical to commit._hash_leaf_level/
    _hash_node_level (Poseidon31 sponge).  flavor "sha256": the framework's
    SHA-256 tree rules (verifier/sha256_merkle.py) — leaf = sha256(cols),
    node = sha256(left || right [|| cols]) — run on the VPU via the
    backend-agnostic core.sha256 rounds."""
    import jax
    import jax.numpy as jnp

    from ..core import sha256 as sha_mod

    M = plan[0][1]
    consts = {}
    for kind, L, n_cols, b in plan:
        if kind == "eval":
            tx, ty = circle_tile_table(L, b)
            consts[L] = (
                jnp.asarray(tx),
                jnp.asarray(ty),
                jnp.asarray(_odd_mask(b)),
            )

    def leaf_hash(cols, rows):
        if flavor == "sha256":
            return sha_mod.sha256_words(cols.T)
        digest = _absorb_columns(cols, rows)
        return poseidon2.permute(
            jnp.concatenate([jnp.zeros_like(digest), digest], axis=1)
        )[:, :8]

    def pair_hash(h):
        if flavor == "sha256":
            return sha_mod.sha256_words(h.reshape(-1, 16))
        return poseidon2.permute(h.reshape(-1, 16))[:, :8]

    def pair_cols_hash(h, cols, rows):
        if flavor == "sha256":
            return sha_mod.sha256_words(
                jnp.concatenate([h.reshape(-1, 16), cols.T], axis=1)
            )
        h = poseidon2.permute(h.reshape(-1, 16))[:, :8]
        digest = _absorb_columns(cols, rows)
        return poseidon2.permute(
            jnp.concatenate([h, digest], axis=1)
        )[:, :8]

    @jax.jit
    def run(*args):
        ai = 0
        h = None
        cur = M
        for kind, L, n_cols, b in plan:
            rows = 1 << (C - (M - L))
            if kind == "eval":
                coeffs, bx, by = args[ai : ai + 3]
                ai += 3
                tx, ty, odd = consts[L]
                cx, cy = _tile_points(bx, by, tx, ty, odd)
                tws = _tile_twiddles(cx, cy, b)
                cols = _eval_tiles(coeffs, tws, b).reshape(n_cols, rows)
            else:
                cols = args[ai]
                ai += 1
            if h is None:
                h = leaf_hash(cols, rows)
            else:
                while cur > L + 1:
                    h = pair_hash(h)
                    cur -= 1
                h = pair_cols_hash(h, cols, rows)
            cur = L
        while cur > K:
            h = pair_hash(h)
            cur -= 1
        return h

    return run


@lru_cache(maxsize=None)
def _tile_eval_jit(L: int, b: int, n_cols: int):
    """Single-tile device evaluation (decommit support)."""
    import jax
    import jax.numpy as jnp

    tx, ty = circle_tile_table(L, b)
    consts = (jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(_odd_mask(b)))

    @jax.jit
    def run(coeffs, bx, by):
        cx, cy = _tile_points(bx, by, *consts)
        tws = _tile_twiddles(cx, cy, b)
        return _eval_tiles(coeffs, tws, b).reshape(n_cols, -1)

    return run


def _eval_tile_host(src: CoeffSource, t: int) -> np.ndarray:
    """Host (numpy) twin of _tile_eval_jit for CPU-only contexts."""
    tx, ty = circle_tile_table(src.L, src.b)
    bx, by = circle_tile_bases(src.L, src.b)
    cx, cy = _tile_points(
        np.array([bx[t]]), np.array([by[t]]), tx, ty, _odd_mask(src.b)
    )
    tws = _tile_twiddles(cx, cy, src.b)
    return np.asarray(
        _eval_tiles(src.host, tws, src.b), np.uint32
    ).reshape(src.n_cols, -1)


# ---------------------------------------------------------------------------
# streamed tree
# ---------------------------------------------------------------------------


class StreamedTree(CommittedTree):
    """Merkle tree committed by streaming chunks through the device.

    Device-side state after construction: nothing (summits are pulled to
    host).  `level_rows`/`column_rows` serve decommitment from the stored
    top levels (<= K) and on-demand recomputed spans (> K), each span
    integrity-checked against its stored summit digest.
    """

    def __init__(self, sources: Dict[int, object], chunk_log=None, cutoff=None,
                 flavor: str = "p31"):
        self.flavor = flavor
        self.sources = {int(L): s for L, s in sources.items()}
        M = self.max_log = max(self.sources)
        min_col = min(self.sources)
        need = max(
            [M - L + s.b for L, s in self.sources.items() if s.kind == "eval"]
            + [M - min_col]
            + [1]
        )
        C = min(M, max(need, chunk_log or _chunk_log_default()))
        K = min(cutoff or _cutoff_default(), min_col)
        K = max(K, M - C)
        self.C, self.K = C, K
        self.columns_by_log = {
            L: _ColShape((s.n_cols, 1 << L)) for L, s in self.sources.items()
        }

        plan = tuple(
            (s.kind, L, s.n_cols, s.b)
            for L, s in sorted(self.sources.items(), reverse=True)
        )
        self._plan = plan
        runner = _commit_chunk_jit(plan, C, K, flavor)
        import jax.numpy as jnp

        summits = []
        for j in range(1 << (M - C)):
            args = []
            for kind, L, n_cols, b in plan:
                s = self.sources[L]
                if kind == "eval":
                    G = 1 << (C - (M - L) - b)
                    bx, by = circle_tile_bases(L, b)
                    args += [
                        s.dev,
                        jnp.asarray(bx[j * G : (j + 1) * G]),
                        jnp.asarray(by[j * G : (j + 1) * G]),
                    ]
                else:
                    rows = 1 << (C - (M - L))
                    args.append(s.dev[:, j * rows : (j + 1) * rows])
            summits.append(runner(*args))
        level_k = np.concatenate([np.asarray(x, np.uint32) for x in summits])

        tops = [level_k]
        h = level_k
        for _ in range(K):
            h = self._host_node_level(h, None)
            tops.append(h)
        self._tops = tops  # index i: level K - i
        assert tops[-1].shape[0] == 1
        self._spans: Dict[int, Dict[int, np.ndarray]] = {}
        self._tiles: Dict[Tuple[int, int], np.ndarray] = {}

    @property
    def root(self) -> np.ndarray:
        return self._tops[-1][0]

    # -- host hash twins (span recompute + top finish) -----------------------

    def _host_leaf_level(self, cols: np.ndarray) -> np.ndarray:
        if self.flavor == "sha256":
            from ..verifier import sha256_merkle

            return sha256_merkle.hash_leaf_level(cols)
        return _hash_leaf_level(cols)

    def _host_node_level(self, children, cols) -> np.ndarray:
        if self.flavor == "sha256":
            from ..verifier import sha256_merkle

            return sha256_merkle.hash_node_level(children, cols)
        return _hash_node_level(children, cols)

    # -- decommit primitives -------------------------------------------------

    def _tile(self, L: int, t: int) -> np.ndarray:
        key = (L, t)
        if key not in self._tiles:
            src = self.sources[L]
            assert src.kind == "eval"
            try:
                import jax

                if jax.default_backend() != "cpu":
                    bx, by = circle_tile_bases(L, src.b)
                    self._tiles[key] = np.asarray(
                        _tile_eval_jit(L, src.b, src.n_cols)(
                            src.dev,
                            np.array([bx[t]]),
                            np.array([by[t]]),
                        ),
                        np.uint32,
                    )
                    return self._tiles[key]
            except Exception:
                pass
            self._tiles[key] = _eval_tile_host(src, t)
        return self._tiles[key]

    def _rows_host(self, L: int, lo: int, hi: int) -> np.ndarray:
        """(n_cols, hi-lo) column values at rows [lo, hi) of level L."""
        src = self.sources[L]
        if src.kind == "res":
            return np.asarray(src.dev[:, lo:hi], np.uint32)
        b = src.b
        parts = []
        t0, t1 = lo >> b, (hi - 1) >> b
        for t in range(t0, t1 + 1):
            tile = self._tile(L, t)
            s = max(lo, t << b) - (t << b)
            e = min(hi, (t + 1) << b) - (t << b)
            parts.append(tile[:, s:e])
        return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1)

    def _span(self, log: int, s: int) -> np.ndarray:
        """Digest array of span s at level `log` (> K), computing (and
        integrity-checking) the span on first touch."""
        if log in self._spans and s in self._spans[log]:
            return self._spans[log][s]
        M, K = self.max_log, self.K
        cols = {
            L: self._rows_host(L, s << (L - K), (s + 1) << (L - K))
            for L in self.sources
            if L >= K
        }
        h = self._host_leaf_level(cols[M])
        self._spans.setdefault(M, {})[s] = h
        for L in range(M - 1, K - 1, -1):
            h = self._host_node_level(h, cols.get(L))
            if L > K:
                self._spans.setdefault(L, {})[s] = h
        # summit self-check: the recomputed span must match the streamed
        # commit (guards the chunked re-evaluation end-to-end)
        assert (h == self._tops[0][s : s + 1]).all(), "span/summit mismatch"
        return self._spans[log][s]

    def level_rows(self, level_idx: int, indices) -> np.ndarray:
        log = self.max_log - level_idx
        idx = np.asarray(indices, np.int64)
        if log <= self.K:
            return self._tops[self.K - log][idx]
        out = np.empty((idx.size, 8), np.uint32)
        shift = log - self.K
        for i, v in enumerate(idx):
            s = int(v) >> shift
            out[i] = self._span(log, s)[int(v) - (s << shift)]
        return out

    def column_rows(self, log_size: int, indices) -> np.ndarray:
        src = self.sources[log_size]
        idx = np.asarray(indices, np.int64)
        if src.kind == "res":
            return np.asarray(src.dev[:, idx], np.uint32)
        out = np.empty((src.n_cols, idx.size), np.uint32)
        b = src.b
        for i, v in enumerate(idx):
            out[:, i] = self._tile(log_size, int(v) >> b)[:, int(v) & ((1 << b) - 1)]
        return out

    def n_columns_per_log_size(self) -> Dict[int, int]:
        return {L: s.n_cols for L, s in self.sources.items()}


def _coeff_sources(pairs) -> Dict[int, CoeffSource]:
    """[(L, coeffs_dev), ...] -> {L: CoeffSource}, concatenating blocks that
    share a domain log in call order (plonk before poseidon, mirroring
    device_prove._merge_t for the lp == lq chain levels)."""
    import jax.numpy as jnp

    by: Dict[int, list] = {}
    for L, c in pairs:
        by.setdefault(int(L), []).append(c)
    return {
        L: CoeffSource(
            blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks), L
        )
        for L, blocks in by.items()
    }


def _res_tree(cols_by_log: Dict[int, object], flavor: str = "p31") -> CommittedTree:
    """Resident-column tree: streamed above _RES_STREAM_MIN, fused below."""
    if max(cols_by_log) >= _RES_STREAM_MIN:
        return StreamedTree(
            {L: ResidentSource(c) for L, c in cols_by_log.items()},
            flavor=flavor,
        )
    if flavor == "sha256":
        from .commit import Sha256CommittedTree

        return Sha256CommittedTree(
            {L: np.asarray(c, np.uint32) for L, c in cols_by_log.items()}
        )
    return DeviceTree(cols_by_log)


# ---------------------------------------------------------------------------
# streamed quotients
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _quot_chunk_jit(spec, g: int, L: int, b: int, n_cols: int, Cq: int):
    """First-layer FRI quotients for one chunk of 2^Cq positions at log L;
    column values re-evaluated from base coefficients in-kernel."""
    import jax
    import jax.numpy as jnp

    from ..verifier import quotients as vquot

    tx, ty = circle_tile_table(L, b)
    consts = (jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(_odd_mask(b)))

    @jax.jit
    def run(coeffs_cat, bx, by, samples_flat, oods8, after4):
        cx, cy = _tile_points(bx, by, *consts)
        tws = _tile_twiddles(cx, cy, b)
        rows = _eval_tiles(coeffs_cat, tws, b)  # (n_cols, G, 2^b)
        N = rows.shape[1] * rows.shape[2]
        rows = jnp.moveaxis(rows.reshape(n_cols, N), 0, -1)[None]
        dx = cx.reshape(N)[None]
        dy = cy.reshape(N)[None]
        px = QM31(*(oods8[i][None] for i in range(4)))
        py = QM31(*(oods8[4 + i][None] for i in range(4)))
        after = QM31(*(after4[i][None] for i in range(4)))
        ans = vquot.fri_answers_for_group(
            spec, g, (px, py), after, samples_flat[None], rows, dx, dy
        )
        return jnp.stack([c[0] for c in ans])  # (4, N)

    return run


def _streamed_group_evals(
    spec: VerifierSpec,
    table_blocks: Dict[int, List],
    samples_flat: np.ndarray,
    oods8: np.ndarray,
    after4: np.ndarray,
    plog,
) -> Dict[int, QM31]:
    """table_blocks: {log: [coeff blocks in tree-major order]} (device).
    Returns resident first-layer quotient evals per log."""
    import jax.numpy as jnp

    d_samples = jnp.asarray(samples_flat)
    d_oods = jnp.asarray(oods8)
    d_after = jnp.asarray(after4)
    group_evals: Dict[int, QM31] = {}
    for g, L in enumerate(spec.all_log_sizes):
        blocks = table_blocks[L]
        coeffs_cat = (
            blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks)
        )
        n_cols = int(coeffs_cat.shape[0])
        b = int(coeffs_cat.shape[1]).bit_length() - 1
        Cq = min(L, max(b, _chunk_log_default()))
        runner = _quot_chunk_jit(spec, g, L, b, n_cols, Cq)
        bx, by = circle_tile_bases(L, b)
        G = 1 << (Cq - b)
        outs = []
        for j in range(1 << (L - Cq)):
            outs.append(
                runner(
                    coeffs_cat,
                    jnp.asarray(bx[j * G : (j + 1) * G]),
                    jnp.asarray(by[j * G : (j + 1) * G]),
                    d_samples,
                    d_oods,
                    d_after,
                )
            )
        evals = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        group_evals[L] = QM31(evals[0], evals[1], evals[2], evals[3])
        plog(f"quotients at log {L} streamed")
    return group_evals


# ---------------------------------------------------------------------------
# streamed FRI folds (1/y, 1/x derived in-kernel from tile points)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _join_fold_jit(level: int, join_log, first: bool, b: int):
    """Circle-fold the joining group (if any) and accumulate: mirrors
    device_prove._join_commit_jit minus the commit."""
    import jax
    import jax.numpy as jnp

    if join_log is not None:
        tx, ty = circle_tile_table(join_log, b)
        consts = (jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(_odd_mask(b)))

    @jax.jit
    def run(g4, join4, a2_4, alpha_fold4, bx, by):
        g = QM31(g4[0], g4[1], g4[2], g4[3])
        if join_log is not None:
            join = QM31(join4[0], join4[1], join4[2], join4[3])
            cx, cy = _tile_points(bx, by, *consts)
            yinv = m31.inv(cy[..., 0::2].reshape(-1))
            l = QM31(*(c[0::2] for c in join))
            r = QM31(*(c[1::2] for c in join))
            alpha = QM31(
                alpha_fold4[0], alpha_fold4[1], alpha_fold4[2], alpha_fold4[3]
            )
            fold_in = q.q_add(
                q.q_add(l, r),
                q.q_mul(q.q_mul_m31(q.q_sub(l, r), yinv), alpha),
            )
            if first:
                g = fold_in
            else:
                a2 = QM31(a2_4[0], a2_4[1], a2_4[2], a2_4[3])
                g = q.q_add(q.q_mul(a2, g), fold_in)
        return jnp.stack(list(g))

    return run


@lru_cache(maxsize=None)
def _line_fold_jit(level: int, b: int):
    import jax
    import jax.numpy as jnp

    tx, ty = line_tile_table(level, b)
    consts = (jnp.asarray(tx), jnp.asarray(ty), None)

    @jax.jit
    def run(g4, alpha4, bx, by):
        cx, _ = _tile_points(bx, by, *consts)
        xinv = m31.inv(cx[..., 0::2].reshape(-1))
        g = QM31(g4[0], g4[1], g4[2], g4[3])
        alpha = QM31(alpha4[0], alpha4[1], alpha4[2], alpha4[3])
        l = QM31(*(c[0::2] for c in g))
        r = QM31(*(c[1::2] for c in g))
        out = q.q_add(
            q.q_add(l, r),
            q.q_mul(q.q_mul_m31(q.q_sub(l, r), xinv), alpha),
        )
        return jnp.stack(list(out))

    return run


def _fold_b(log: int) -> int:
    return min(log, _chunk_log_default())


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------


def prove_streamed(
    trace: dict, config: PcsConfig, progress=None, channel=None,
    hash_flavor: str = "p31",
) -> PlonkWithPoseidonProof:
    """channel/hash_flavor select the Merkle-channel flavor: default
    Poseidon31; pass (prove_sha256.Sha256ProverChannel(), "sha256") for the
    Sha256Poseidon31 chain level (multi-proofs/src/main.rs:289-295)."""
    import logging

    import jax.numpy as jnp

    from . import device as _device_cache

    _device_cache._jnp()  # persistent compilation cache

    plog = progress or logging.getLogger(__name__).debug
    blowup = config.fri_config.log_blowup_factor

    plonk_pre, plonk_tr = air.plonk_columns(trace)
    pos_pre, pos_tr, lq = air.poseidon_columns(trace)
    lp = plonk_pre.shape[1].bit_length() - 1

    from ..verifier.spec import PLONK_LOG_EXPAND, POSEIDON_LOG_EXPAND
    from .device import _interpolate_jit

    bound = max(lp + PLONK_LOG_EXPAND, lq + POSEIDON_LOG_EXPAND)
    spec = VerifierSpec(
        log_size_plonk=lp,
        log_size_poseidon=lq,
        pow_bits=config.pow_bits,
        log_last_layer_degree_bound=config.fri_config.log_last_layer_degree_bound,
        log_blowup_factor=blowup,
        n_queries=config.fri_config.n_queries,
        n_inner_layers=bound - 2 - config.fri_config.log_last_layer_degree_bound,
    )
    assert spec.n_inner_layers == spec.expected_n_inner_layers
    dm1 = bound - 1

    channel = channel or PoseidonChannel()
    perm_p = air.coset_to_domain_perm(lp)
    perm_q = air.coset_to_domain_perm(lq)

    # ---- base-domain coefficients (device, resident; the only large
    #      persistent device state) ----
    c_p_pre = _interpolate_jit(lp)(jnp.asarray(plonk_pre[..., perm_p]))
    c_p_tr = _interpolate_jit(lp)(jnp.asarray(plonk_tr[..., perm_p]))
    c_q_pre = _interpolate_jit(lq)(jnp.asarray(pos_pre[..., perm_q]))
    c_q_tr = _interpolate_jit(lq)(jnp.asarray(pos_tr[..., perm_q]))
    plog("base coefficients interpolated")

    # ---- trees 0 + 1 (streamed) ----
    tree0 = StreamedTree(
        _coeff_sources([(lp + blowup, c_p_pre), (lq + blowup, c_q_pre)]),
        flavor=hash_flavor,
    )
    tree1 = StreamedTree(
        _coeff_sources([(lp + blowup, c_p_tr), (lq + blowup, c_q_tr)]),
        flavor=hash_flavor,
    )
    channel.mix_root(tree0.root)
    plog("tree0 (preprocessed) committed")
    channel.mix_one_felt([lp, 0, 0, 0])
    channel.mix_one_felt([lq, 0, 0, 0])
    channel.mix_root(tree1.root)
    plog("tree1 (trace) committed")

    z4, alpha4 = channel.draw_felts()

    # ---- interaction columns + tree 2 ----
    int_p, int_q, tot_p, tot_q = _interaction_cols_jit(lp, lq)(
        jnp.asarray(plonk_pre), jnp.asarray(plonk_tr),
        jnp.asarray(pos_pre), jnp.asarray(pos_tr),
        jnp.asarray(z4), jnp.asarray(alpha4),
    )
    c_int_p = _interpolate_jit(lp)(int_p[..., perm_p])
    c_int_q = _interpolate_jit(lq)(int_q[..., perm_q])
    plonk_total = np.asarray(tot_p, np.uint32)
    pos_total = np.asarray(tot_q, np.uint32)
    plog("interaction columns generated")
    channel.mix_two_felts(plonk_total, pos_total)
    tree2 = StreamedTree(
        _coeff_sources([(lp + blowup, c_int_p), (lq + blowup, c_int_q)]),
        flavor=hash_flavor,
    )
    channel.mix_root(tree2.root)
    plog("tree2 (interaction) committed")

    random_coeff4 = channel.draw_felt()

    # ---- composition polynomial + tree 3 ----
    split_coeffs = _composition_coeffs_jit(spec)(
        c_p_pre, c_p_tr, c_int_p, c_q_pre, c_q_tr, c_int_q,
        jnp.asarray(z4), jnp.asarray(alpha4), jnp.asarray(random_coeff4),
        tot_p, tot_q,
    )
    plog("composition coefficients computed")
    tree3 = StreamedTree(
        {dm1 + blowup: CoeffSource(split_coeffs, dm1 + blowup)},
        flavor=hash_flavor,
    )
    channel.mix_root(tree3.root)
    plog("tree3 (composition) committed")

    oods_t4 = channel.draw_felt()
    from . import device as device_mod
    from .prove import (
        _add_const,
        _assemble_samples,
        _factors_at_point,
        _oods_point,
    )

    oods = _oods_point(oods_t4)

    # ---- OODS samples (device sampling from resident coefficients) ----
    col_coeffs = {
        (0, "p"): c_p_pre,
        (0, "q"): c_q_pre,
        (1, "p"): c_p_tr,
        (1, "q"): c_q_tr,
        (2, "p"): c_int_p,
        (2, "q"): c_int_q,
        (3, "c"): split_coeffs,
    }
    shifted = {}
    for log in (lp, lq):
        step = ccircle.CanonicCoset(log).step()
        shifted[log] = _add_const(oods, ccircle.point_neg(step))

    samples_at = {}
    for key, cfs in col_coeffs.items():
        t, tag = key
        deg_log = int(cfs.shape[1]).bit_length() - 1
        samples_at[(key, 0)] = np.asarray(
            device_mod._sample_jit(deg_log)(
                cfs, np.asarray(_factors_at_point(deg_log, oods), np.uint32)
            )
        )
        if t == 2:
            samples_at[(key, -1)] = np.asarray(
                device_mod._sample_jit(deg_log)(
                    cfs,
                    np.asarray(
                        _factors_at_point(
                            deg_log, shifted[lp if tag == "p" else lq]
                        ),
                        np.uint32,
                    ),
                )
            )

    sampled_values = _assemble_samples(spec, lp, lq, bound, samples_at)
    plog("OODS samples computed")

    flat = [s for tree in sampled_values for col in tree for s in col]
    for k in range(0, len(flat), 2):
        chunk = flat[k : k + 2]
        if len(chunk) == 1:
            channel.mix_one_felt(chunk[0])
        else:
            channel.mix_two_felts(chunk[0], chunk[1])

    after_coeff4 = channel.draw_felt()

    # ---- FRI first-layer quotients (streamed) ----
    blocks_by_log: Dict[int, List] = {}
    for key, tag_coeffs in (
        ((0, "p"), c_p_pre), ((0, "q"), c_q_pre),
        ((1, "p"), c_p_tr), ((1, "q"), c_q_tr),
        ((2, "p"), c_int_p), ((2, "q"), c_int_q),
        ((3, "c"), split_coeffs),
    ):
        deg = int(tag_coeffs.shape[1]).bit_length() - 1
        blocks_by_log.setdefault(deg + blowup, []).append(tag_coeffs)

    samples_flat = np.concatenate(
        [col for tree in sampled_values for col in tree]
    ).astype(np.uint32)
    oods8 = np.concatenate(
        [np.asarray(oods[0], np.uint32), np.asarray(oods[1], np.uint32)]
    )
    group_evals = _streamed_group_evals(
        spec, blocks_by_log, samples_flat, oods8,
        np.asarray(after_coeff4, np.uint32), plog,
    )

    stark_proof = _fri_tail_streamed(
        spec, config, channel, [tree0, tree1, tree2, tree3],
        group_evals, sampled_values, plog, flavor=hash_flavor,
    )
    return PlonkWithPoseidonProof(
        log_size_plonk=lp,
        log_size_poseidon=lq,
        plonk_total_sum=np.array(plonk_total, np.uint32),
        poseidon_total_sum=np.array(pos_total, np.uint32),
        config=config,
        stark_proof=stark_proof,
    )


def prove_np_streamed(trace: dict, config, progress=None, channel=None,
                      tree_cls=None):
    """Streamed twin of prove_np (the PlonkWithoutPoseidon AIR, last-layer
    output system, examples/last-layer/src/main.rs:188-202).

    The base-domain phases (interaction columns, composition AIR eval) are
    small and stay on the host via prove_np's own helpers; everything
    O(LDE-domain) — tree commits, quotients, FRI layers — streams through
    the device kernels.  Byte-identical to prove_np (tests)."""
    import logging

    import jax.numpy as jnp

    from ..proof.containers import PlonkWithoutPoseidonProof
    from ..verifier.spec import NoPoseidonVerifierSpec
    from . import device as _device_cache
    from .commit import Sha256CommittedTree
    from .device import _interpolate_jit
    from .prove import (
        _add_const,
        _oods_point,
    )
    from .prove_np import _assemble_samples_np, _composition_evals_np

    _device_cache._jnp()
    plog = progress or logging.getLogger(__name__).debug
    flavor = "sha256" if tree_cls is Sha256CommittedTree else "p31"

    from ..recursion.composition import evaluate_plonk_np

    pre, tr = air.np_columns(trace)
    L = pre.shape[1].bit_length() - 1
    assert 1 << L == pre.shape[1]
    blowup = config.fri_config.log_blowup_factor
    spec = NoPoseidonVerifierSpec.for_rows(L, config)
    bound = spec.composition_log_degree_bound
    dm1 = bound - 1

    channel = channel or PoseidonChannel()
    perm = air.coset_to_domain_perm(L)

    c_pre = _interpolate_jit(L)(jnp.asarray(pre[..., perm]))
    tree0 = StreamedTree(
        {L + blowup: CoeffSource(c_pre, L + blowup)}, flavor=flavor
    )
    channel.mix_root(tree0.root)
    plog("tree0 (preprocessed) committed")

    channel.mix_one_felt([L, 0, 0, 0])

    c_tr = _interpolate_jit(L)(jnp.asarray(tr[..., perm]))
    tree1 = StreamedTree(
        {L + blowup: CoeffSource(c_tr, L + blowup)}, flavor=flavor
    )
    channel.mix_root(tree1.root)
    plog("tree1 (trace) committed")

    z4, alpha4 = channel.draw_felts()

    inter, total = air.interaction_columns(
        pre, tr, z4, alpha4, evaluate_plonk_np
    )
    channel.mix_one_felt(total)

    c_int = _interpolate_jit(L)(jnp.asarray(inter[..., perm]))
    tree2 = StreamedTree(
        {L + blowup: CoeffSource(c_int, L + blowup)}, flavor=flavor
    )
    channel.mix_root(tree2.root)
    plog("tree2 (interaction) committed")

    random_coeff4 = channel.draw_felt()

    comp_evals = _composition_evals_np(
        spec, bound, pre, tr, inter, z4, alpha4, random_coeff4, total
    )
    comp_rows = np.stack(
        [np.asarray(c, np.uint32) for c in comp_evals]
    )  # (4, 2^bound), bit-reversed domain order
    comp_coeffs = circle_fft.interpolate(comp_rows)
    half = 1 << dm1
    split_coeffs = jnp.asarray(
        np.concatenate([comp_coeffs[:, :half], comp_coeffs[:, half:]])
    )
    plog("composition coefficients computed")
    tree3 = StreamedTree(
        {dm1 + blowup: CoeffSource(split_coeffs, dm1 + blowup)},
        flavor=flavor,
    )
    channel.mix_root(tree3.root)
    plog("tree3 (composition) committed")

    oods_t4 = channel.draw_felt()
    oods = _oods_point(oods_t4)

    from . import device as device_mod
    from .prove import _factors_at_point

    col_coeffs = {0: c_pre, 1: c_tr, 2: c_int, 3: split_coeffs}
    step = ccircle.CanonicCoset(L).step()
    shifted = _add_const(oods, ccircle.point_neg(step))

    samples_at = {}
    for t, cfs in col_coeffs.items():
        deg_log = int(cfs.shape[1]).bit_length() - 1
        samples_at[(t, 0)] = np.asarray(
            device_mod._sample_jit(deg_log)(
                cfs, np.asarray(_factors_at_point(deg_log, oods), np.uint32)
            )
        )
        if t == 2:
            samples_at[(t, -1)] = np.asarray(
                device_mod._sample_jit(deg_log)(
                    cfs,
                    np.asarray(_factors_at_point(deg_log, shifted), np.uint32),
                )
            )

    sampled_values = _assemble_samples_np(spec, bound, samples_at)
    plog("OODS samples computed")

    flat = [s for tree in sampled_values for col in tree for s in col]
    for k in range(0, len(flat), 2):
        chunk = flat[k : k + 2]
        if len(chunk) == 1:
            channel.mix_one_felt(chunk[0])
        else:
            channel.mix_two_felts(chunk[0], chunk[1])

    after_coeff4 = channel.draw_felt()

    blocks_by_log: Dict[int, List] = {}
    for cfs in (c_pre, c_tr, c_int, split_coeffs):
        deg = int(cfs.shape[1]).bit_length() - 1
        blocks_by_log.setdefault(deg + blowup, []).append(cfs)

    samples_flat = np.concatenate(
        [col for tree in sampled_values for col in tree]
    ).astype(np.uint32)
    oods8 = np.concatenate(
        [np.asarray(oods[0], np.uint32), np.asarray(oods[1], np.uint32)]
    )
    group_evals = _streamed_group_evals(
        spec, blocks_by_log, samples_flat, oods8,
        np.asarray(after_coeff4, np.uint32), plog,
    )

    stark_proof = _fri_tail_streamed(
        spec, config, channel, [tree0, tree1, tree2, tree3],
        group_evals, sampled_values, plog, flavor=flavor,
    )
    return PlonkWithoutPoseidonProof(
        log_size=L,
        total_sum=np.array(total, np.uint32),
        config=config,
        stark_proof=stark_proof,
    )


def _fri_tail_streamed(spec, config, channel, trees, group_evals,
                       sampled_values, plog, flavor: str = "p31"):
    """FRI phase with streamed layer commits (mirrors
    device_prove._fri_tail_device; proofs are byte-identical)."""
    import jax.numpy as jnp

    from ..cs import scalar
    from ..proof.containers import FriLayerProof, FriProof, StarkProof

    plog("FRI first-layer quotients computed")
    first_tree = _res_tree(
        {L: fri._q_limbs(ev) for L, ev in group_evals.items()}, flavor
    )
    channel.mix_root(first_tree.root)
    alphas = [tuple(int(x) for x in channel.draw_felt())]
    M = spec.max_first_layer_log

    inner_trees: List = []
    inner_evals: List[QM31] = []
    g4 = jnp.zeros((4, 1 << (M - 1)), jnp.uint32)
    level = M - 1
    for i in range(spec.n_inner_layers):
        L = M - i
        alpha = alphas[i]
        a2 = scalar.q_mul(alpha, alpha)
        join_log = L if L in group_evals else None
        join4 = (
            fri._q_limbs(group_evals[L])
            if join_log is not None
            else jnp.zeros((4, 1), jnp.uint32)
        )
        if join_log is not None:
            b = _fold_b(join_log)
            bx, by = circle_tile_bases(join_log, b)
        else:
            b = _fold_b(level + 1)
            bx = by = np.zeros(1, np.uint32)
        g4 = _join_fold_jit(level, join_log, i == 0, b)(
            g4, join4,
            np.asarray(a2, np.uint32),
            np.asarray(alphas[M - L] if join_log is not None else (0,) * 4,
                       np.uint32),
            jnp.asarray(bx), jnp.asarray(by),
        )
        tree_i = _res_tree({level: g4}, flavor)
        inner_trees.append(tree_i)
        inner_evals.append(QM31(g4[0], g4[1], g4[2], g4[3]))
        channel.mix_root(tree_i.root)
        alphas.append(tuple(int(x) for x in channel.draw_felt()))
        bl = _fold_b(level)
        lbx, lby = line_tile_bases(level, bl)
        g4 = _line_fold_jit(level, bl)(
            g4, np.asarray(alphas[i + 1], np.uint32),
            jnp.asarray(lbx), jnp.asarray(lby),
        )
        level -= 1

    # ---- last layer (host: folded evals are small by now) ----
    g_host = QM31(*(np.asarray(c, np.uint32) for c in (g4[0], g4[1], g4[2], g4[3])))
    last_bound = config.fri_config.log_last_layer_degree_bound
    n_last = 1 << last_bound
    last_full = fri.line_interpolate(g_host, level)
    gap = level - last_bound
    keep = np.arange(n_last) << gap
    mask = np.zeros(1 << level, bool)
    mask[keep] = True
    assert not last_full[~mask].any(), "folded evals exceed last-layer bound"
    last_poly = last_full[keep]
    for k in range(0, n_last, 2):
        chunk = last_poly[k : k + 2]
        if len(chunk) == 1:
            channel.mix_one_felt(chunk[0])
        else:
            channel.mix_two_felts(chunk[0], chunk[1])

    # ---- PoW + queries (host) ----
    plog("FRI layers committed; grinding PoW")
    nonce = channel.grind_pow(config.pow_bits)
    plog("PoW ground")
    channel.mix_u64(nonce)
    raw_queries: List[int] = []
    for _ in range(-(-config.fri_config.n_queries // 8)):
        a, b_ = channel.draw_felts()
        raw_queries.extend(int(x) for x in a)
        raw_queries.extend(int(x) for x in b_)
    raw_queries = [
        v & ((1 << M) - 1) for v in raw_queries[: config.fri_config.n_queries]
    ]

    # ---- decommitments ----
    queried_values = []
    decommitments = []
    for t in range(4):
        depth = trees[t].max_log
        qs = [v >> (M - depth) for v in raw_queries]
        vals, dec = trees[t].decommit(qs)
        queried_values.append(vals)
        decommitments.append(dec)
    plog("tree decommitments expanded")

    first_layer = FriLayerProof(
        fri_witness=fri.first_layer_witness(group_evals, raw_queries, M),
        decommitment=fri.decommit_pair(first_tree, raw_queries),
        commitment=first_tree.root,
    )
    inner_layers = []
    cur_queries = [v >> 1 for v in raw_queries]
    for i in range(spec.n_inner_layers):
        inner_layers.append(
            FriLayerProof(
                fri_witness=fri.inner_layer_witness(inner_evals[i], cur_queries),
                decommitment=fri.decommit_pair(inner_trees[i], cur_queries),
                commitment=inner_trees[i].root,
            )
        )
        cur_queries = [v >> 1 for v in cur_queries]
    plog("FRI decommitments expanded")

    return StarkProof(
        commitments=np.stack([np.asarray(t.root, np.uint32) for t in trees]),
        sampled_values=sampled_values,
        decommitments=decommitments,
        queried_values=queried_values,
        proof_of_work=nonce,
        fri_proof=FriProof(
            first_layer=first_layer,
            inner_layers=inner_layers,
            last_layer_poly=last_poly,
            last_layer_log_size=config.fri_config.log_last_layer_degree_bound,
        ),
    )
