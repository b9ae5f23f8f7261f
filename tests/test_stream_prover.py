"""Streamed (chunked) device prover is bit-exact vs the host kernels.

Covers the three layers of the streamed design (prover/stream.py):
chunked circle-FFT evaluation, streamed Merkle commitment + span-recompute
decommitment, and the end-to-end streamed prove (byte-identical proofs).
Runs on the CPU backend with small chunk/cutoff parameters so the chunk
loop, summit assembly and span machinery are all genuinely exercised.
"""

import numpy as np
import pytest

from recursive_stwo_tpu.prover import circle_fft, commit
from recursive_stwo_tpu.prover import stream

pytestmark = pytest.mark.slow

P = (1 << 31) - 1
rng = np.random.default_rng(11)


def _rand(*shape):
    return rng.integers(0, P, size=shape, dtype=np.uint32)


@pytest.mark.parametrize("T,b", [(10, 6), (12, 9), (9, 9)])
def test_chunked_eval_matches_full(T, b):
    coeffs = _rand(3, 1 << b)
    full = circle_fft.evaluate(circle_fft.extend(coeffs, T))
    bx, by = stream.circle_tile_bases(T, b)
    tx, ty = stream.circle_tile_table(T, b)
    cx, cy = stream._tile_points(bx, by, tx, ty, stream._odd_mask(b))
    tws = stream._tile_twiddles(cx, cy, b)
    got = np.asarray(stream._eval_tiles(coeffs, tws, b), np.uint32)
    np.testing.assert_array_equal(got.reshape(3, 1 << T), full)


def test_line_tiles_match_fold_xinv():
    from recursive_stwo_tpu.core import m31
    from recursive_stwo_tpu.prover import fri

    T, b = 9, 6
    bx, by = stream.line_tile_bases(T, b)
    tx, ty = stream.line_tile_table(T, b)
    cx, _ = stream._tile_points(bx, by, tx, ty, None)
    xinv = m31.inv(np.asarray(cx, np.uint32)[:, 0::2].reshape(-1))
    np.testing.assert_array_equal(xinv, fri.line_fold_xinv(T))


def test_circle_tiles_match_fold_yinv():
    from recursive_stwo_tpu.core import m31
    from recursive_stwo_tpu.prover import fri

    T, b = 10, 7
    bx, by = stream.circle_tile_bases(T, b)
    tx, ty = stream.circle_tile_table(T, b)
    _, cy = stream._tile_points(bx, by, tx, ty, stream._odd_mask(b))
    yinv = m31.inv(np.asarray(cy, np.uint32)[:, 0::2].reshape(-1))
    np.testing.assert_array_equal(yinv, fri.circle_fold_yinv(T))


def _streamed_vs_host_tree(monkeypatch, sources_spec, chunk_log, cutoff):
    """Build the same tree via CommittedTree (full columns, host) and
    StreamedTree; compare root + a full decommit."""
    monkeypatch.setenv("RSTPU_STREAM_CHUNK_LOG", str(chunk_log))
    monkeypatch.setenv("RSTPU_STREAM_CUTOFF", str(cutoff))

    columns = {}
    sources = {}
    for L, n_cols, kind, blowup in sources_spec:
        if kind == "eval":
            base = _rand(n_cols, 1 << (L - blowup))
            coeffs = circle_fft.interpolate(base)
            columns[L] = circle_fft.evaluate(circle_fft.extend(coeffs, L))
            sources[L] = stream.CoeffSource(coeffs, L)
        else:
            columns[L] = _rand(n_cols, 1 << L)
            sources[L] = stream.ResidentSource(columns[L])

    host = commit.CommittedTree(columns)
    streamed = stream.StreamedTree(sources)
    np.testing.assert_array_equal(host.root, streamed.root)

    queries = sorted(rng.integers(0, 1 << max(columns), size=7).tolist())
    hv, hd = host.decommit(queries)
    sv, sd = streamed.decommit(queries)
    np.testing.assert_array_equal(hv, sv)
    np.testing.assert_array_equal(hd.hash_witness, sd.hash_witness)


def test_streamed_tree_mixed_sources(monkeypatch):
    _streamed_vs_host_tree(
        monkeypatch,
        [(12, 5, "eval", 3), (11, 7, "eval", 3), (10, 4, "res", 0)],
        chunk_log=10,
        cutoff=5,
    )


def test_streamed_tree_single_level(monkeypatch):
    _streamed_vs_host_tree(
        monkeypatch, [(11, 4, "res", 0)], chunk_log=8, cutoff=4
    )


def test_streamed_pair_decommit_matches_host(monkeypatch):
    """fri.decommit_pair over a StreamedTree equals the host tree."""
    from recursive_stwo_tpu.prover import fri

    monkeypatch.setenv("RSTPU_STREAM_CHUNK_LOG", "8")
    monkeypatch.setenv("RSTPU_STREAM_CUTOFF", "4")
    cols = {11: _rand(4, 1 << 11), 10: _rand(4, 1 << 10)}
    host = commit.CommittedTree(cols)
    streamed = stream.StreamedTree(
        {L: stream.ResidentSource(c) for L, c in cols.items()}
    )
    queries = sorted(set(rng.integers(0, 1 << 11, size=9).tolist()))
    hd = fri.decommit_pair(host, queries)
    sd = fri.decommit_pair(streamed, queries)
    np.testing.assert_array_equal(hd.hash_witness, sd.hash_witness)


def _small_trace():
    from recursive_stwo_tpu.cs import scalar
    from recursive_stwo_tpu.cs.system import PlonkWithPoseidonCS
    from recursive_stwo_tpu.gadgets.fields import QM31Var
    from recursive_stwo_tpu.gadgets.poseidon import Poseidon2Half

    cs = PlonkWithPoseidonCS()
    a = (123456789, 987654321, 555, 2**30)
    b = scalar.q_pow(a, 100)
    av = QM31Var.new_witness(cs, a)
    bv = QM31Var.new_witness(cs, b)
    av.pow(100).equalverify(bv)
    left = Poseidon2Half.new_witness(cs, list(range(8)))
    right = Poseidon2Half.new_witness(cs, list(range(8, 16)))
    Poseidon2Half.permute_get_rate(left, right)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    return cs.generate_trace()


def test_prove_streamed_bit_exact_vs_host(monkeypatch):
    """The streamed pipeline emits byte-identical proofs to the numpy host
    prover (CPU backend; small chunks force real chunk loops)."""
    import jax

    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.prover.prove import prove
    from recursive_stwo_tpu.prover.stream import prove_streamed

    from test_device_prover import _assert_proofs_equal

    monkeypatch.setenv("RSTPU_STREAM_CHUNK_LOG", "9")
    monkeypatch.setenv("RSTPU_STREAM_CUTOFF", "5")
    trace = _small_trace()
    # blowup 3 at lp=10-ish shapes: every tree commit is multi-chunk
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 3, 9))

    host_proof = prove(trace, config)
    with jax.default_device(jax.devices("cpu")[0]):
        stream_proof = prove_streamed(trace, config)
    _assert_proofs_equal(host_proof, stream_proof)


def test_prove_streamed_sha256_bit_exact_vs_host(monkeypatch):
    """The sha256-flavor streamed pipeline (Sha256Poseidon31 chain level)
    emits byte-identical proofs to the host sha-flavor prover."""
    import jax

    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.prover.commit import Sha256CommittedTree
    from recursive_stwo_tpu.prover.prove import prove
    from recursive_stwo_tpu.prover.prove_sha256 import Sha256ProverChannel
    from recursive_stwo_tpu.prover.stream import prove_streamed

    from test_device_prover import _assert_proofs_equal

    monkeypatch.setenv("RSTPU_STREAM_CHUNK_LOG", "9")
    monkeypatch.setenv("RSTPU_STREAM_CUTOFF", "5")
    monkeypatch.setenv("RSTPU_STREAM_LOG", "off")  # host twin stays host
    trace = _small_trace()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 3, 9))

    host_proof = prove(
        trace, config,
        channel=Sha256ProverChannel(), tree_cls=Sha256CommittedTree,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        stream_proof = prove_streamed(
            trace, config, channel=Sha256ProverChannel(),
            hash_flavor="sha256",
        )
    _assert_proofs_equal(host_proof, stream_proof)


def test_prove_np_streamed_bit_exact_vs_host(monkeypatch):
    """The streamed without-poseidon pipeline (last-layer output system)
    emits byte-identical proofs to prove_np, in both tree flavors."""
    import jax

    from recursive_stwo_tpu.cs.system import PlonkWithoutPoseidonCS
    from recursive_stwo_tpu.gadgets.fields import QM31Var
    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.prover.commit import Sha256CommittedTree
    from recursive_stwo_tpu.prover.prove_np import prove_np
    from recursive_stwo_tpu.prover.prove_sha256 import Sha256ProverChannel
    from recursive_stwo_tpu.prover.stream import prove_np_streamed

    monkeypatch.setenv("RSTPU_STREAM_CHUNK_LOG", "9")
    monkeypatch.setenv("RSTPU_STREAM_CUTOFF", "5")
    monkeypatch.setenv("RSTPU_STREAM_LOG", "off")

    from recursive_stwo_tpu.cs import scalar

    cs = PlonkWithoutPoseidonCS()
    a = (12345, 678, 91011, 1213)
    b = scalar.q_pow(a, 31)
    av = QM31Var.new_witness(cs, a)
    bv = QM31Var.new_witness(cs, b)
    av.pow(31).equalverify(bv)
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    trace = cs.generate_trace()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 3, 9))

    def _np_proofs_equal(x, y):
        assert x.log_size == y.log_size
        np.testing.assert_array_equal(x.total_sum, y.total_sum)
        sx, sy = x.stark_proof, y.stark_proof
        np.testing.assert_array_equal(sx.commitments, sy.commitments)
        assert sx.proof_of_work == sy.proof_of_work
        for qa, qb in zip(sx.queried_values, sy.queried_values):
            np.testing.assert_array_equal(qa, qb)
        for da, db in zip(sx.decommitments, sy.decommitments):
            np.testing.assert_array_equal(da.hash_witness, db.hash_witness)
        np.testing.assert_array_equal(
            sx.fri_proof.last_layer_poly, sy.fri_proof.last_layer_poly
        )

    host = prove_np(trace, config)
    with jax.default_device(jax.devices("cpu")[0]):
        streamed = prove_np_streamed(trace, config)
    _np_proofs_equal(host, streamed)

    host_sha = prove_np(
        trace, config,
        channel=Sha256ProverChannel(), tree_cls=Sha256CommittedTree,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        streamed_sha = prove_np_streamed(
            trace, config,
            channel=Sha256ProverChannel(), tree_cls=Sha256CommittedTree,
        )
    _np_proofs_equal(host_sha, streamed_sha)


def test_prove_streamed_verifies(monkeypatch):
    """Streamed proofs pass the framework's fixture-validated verifier."""
    import jax

    from recursive_stwo_tpu.proof.containers import FriConfig, PcsConfig
    from recursive_stwo_tpu.prover.stream import prove_streamed
    from recursive_stwo_tpu.verifier import hints, verify
    from recursive_stwo_tpu.verifier.spec import VerifierSpec

    monkeypatch.setenv("RSTPU_STREAM_CHUNK_LOG", "9")
    monkeypatch.setenv("RSTPU_STREAM_CUTOFF", "5")
    trace = _small_trace()
    config = PcsConfig(pow_bits=5, fri_config=FriConfig(1, 3, 9))
    with jax.default_device(jax.devices("cpu")[0]):
        proof = prove_streamed(trace, config)
    spec = VerifierSpec.from_proof(proof)
    pa = hints.prepare(spec, [proof])
    inputs3 = [(1, (1, 0, 0, 0)), (2, (0, 1, 0, 0)), (3, (0, 0, 1, 0))]
    checks = verify.verify_batch(spec, pa, inputs3)
    failing = [k for k, v in checks.items() if not bool(np.asarray(v)[0])]
    assert not failing, failing
