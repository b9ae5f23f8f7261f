"""Multi-device verification tests on the 8-way virtual CPU mesh.

The driver's dryrun exercises the same path out-of-repo; these tests pin it
in CI: sharded all-pass verification, fault isolation (a corrupted proof on
one shard flips only its verdict plus the collective), and both the
pjit/out_shardings and shard_map+psum expressions of the reduction.
Ref: SURVEY.md §2 parallelism items 3-4.
"""

import numpy as np
import pytest

import jax

from recursive_stwo_tpu.parallel import mesh as mesh_mod
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.verifier import hints, verify
from recursive_stwo_tpu.verifier.spec import VerifierSpec

import pytest

pytestmark = pytest.mark.slow

FIXTURES = "/root/reference/components/test_data"
N_DEV = 8


@pytest.fixture(scope="module")
def cpu_mesh():
    devs = jax.devices("cpu")
    assert len(devs) >= N_DEV, "conftest must force 8 virtual CPU devices"
    return mesh_mod.make_mesh(devs[:N_DEV])


@pytest.fixture(scope="module")
def batch16():
    with open(f"{FIXTURES}/small_proof.bin", "rb") as f:
        proof = parse_plonk_with_poseidon_proof(f.read())
    spec = VerifierSpec.from_proof(proof)
    pa = hints.prepare(spec, [proof] * 16)
    return spec, pa


def test_verify_sharded_all_pass(cpu_mesh, batch16):
    spec, pa = batch16
    ok, all_ok = mesh_mod.verify_sharded(spec, pa, verify.INPUTS_ONE, cpu_mesh)
    assert ok.shape == (16,)
    assert bool(np.asarray(ok).all()) and bool(all_ok)


def test_verify_shard_map_all_pass(cpu_mesh, batch16):
    spec, pa = batch16
    ok, all_ok = mesh_mod.verify_shard_map(
        spec, pa, verify.INPUTS_ONE, cpu_mesh
    )
    assert bool(np.asarray(ok).all()) and bool(all_ok)


def _corrupt_one(pa, idx: int):
    """Flip one nonce limb of proof `idx` (breaks its PoW check only)."""
    nl = np.asarray(pa.nonce_limbs).copy()
    nl[idx, 0] ^= 1
    return pa._replace(nonce_limbs=nl)


@pytest.mark.parametrize("bad_idx", [3, 15])
def test_fault_isolation_sharded(cpu_mesh, batch16, bad_idx):
    """One corrupted proof on one shard: exactly its verdict flips, the
    collective all_ok goes False, all other shards are unaffected."""
    spec, pa = batch16
    bad = _corrupt_one(pa, bad_idx)
    ok, all_ok = mesh_mod.verify_sharded(spec, bad, verify.INPUTS_ONE, cpu_mesh)
    ok = np.asarray(ok)
    assert not bool(all_ok)
    assert not ok[bad_idx]
    expect = np.ones(16, bool)
    expect[bad_idx] = False
    np.testing.assert_array_equal(ok, expect)


def test_fault_isolation_shard_map(cpu_mesh, batch16):
    spec, pa = batch16
    bad = _corrupt_one(pa, 9)  # lands on shard 4 of 8 (2 proofs per shard)
    ok, all_ok = mesh_mod.verify_shard_map(
        spec, bad, verify.INPUTS_ONE, cpu_mesh
    )
    ok = np.asarray(ok)
    assert not bool(all_ok)
    assert not ok[9]
    assert ok.sum() == 15


def test_uneven_batch_pads_to_mesh(cpu_mesh, batch16):
    """Batches that do not divide the mesh size are padded with replicas of
    a valid proof; verdicts for the real prefix are returned."""
    spec, pa = batch16
    sub = jax.tree.map(lambda x: np.asarray(x)[:11], pa)
    ok, all_ok = mesh_mod.verify_sharded_padded(
        spec, sub, verify.INPUTS_ONE, cpu_mesh
    )
    assert ok.shape == (11,)
    assert bool(np.asarray(ok).all()) and bool(all_ok)

    bad = _corrupt_one(sub, 10)
    ok, all_ok = mesh_mod.verify_sharded_padded(
        spec, bad, verify.INPUTS_ONE, cpu_mesh
    )
    assert not bool(all_ok)
    assert not np.asarray(ok)[10] and np.asarray(ok)[:10].all()


def test_two_level_host_chip_mesh(batch16):
    """(host, chip) = (2, 4) mesh: two-stage verdict reduction (psum over
    the ICI axis, then the DCN axis); a corrupted proof on host 1 shows up
    in that host's partial count, not host 0's, and flips the global
    verdict only — the multi-host wire pattern (SURVEY §2 parallelism 3-4,
    §5 distributed backend)."""
    spec, pa = batch16
    devs = jax.devices("cpu")[:8]
    mesh2 = mesh_mod.make_mesh_2d(devs, (2, 4))

    ok, per_host_bad, all_ok = mesh_mod.verify_shard_map_2d(spec, pa, mesh=mesh2)
    assert np.asarray(ok).all() and bool(all_ok)
    assert np.asarray(per_host_bad).tolist() == [0, 0]

    # corrupt proof 12 -> lands on host 1 (batch 16 over 8 shards of 2)
    bad = jax.tree.map(lambda x: np.array(x), pa)
    bad = bad._replace(
        samples_flat=bad.samples_flat.copy()
    )
    bad.samples_flat[12, 0, 0] ^= 1
    ok2, per_host_bad2, all_ok2 = mesh_mod.verify_shard_map_2d(
        spec, bad, mesh=mesh2
    )
    ok2 = np.asarray(ok2)
    assert not ok2[12] and ok2[np.arange(16) != 12].all()
    assert np.asarray(per_host_bad2).tolist() == [0, 1]
    assert not bool(all_ok2)
