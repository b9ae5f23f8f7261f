"""Multi-chip scaling for batched proof verification.

The workload is data-parallel over proofs: each proof's verification is an
independent static-shape program, so we shard the batch axis of every proof
tensor across a 1-D `proofs` mesh and let XLA place the (tiny) collective at
the end — a `psum` that aggregates per-shard verdicts into the global
"all proofs valid" consistency check (the TPU analogue of the reference's
in-process assert sweeps, see SURVEY.md §2).

Multi-host: `jax.distributed.initialize()` before building the mesh extends
the same code path over DCN; per-host batches stay host-local, only the
verdict reduction crosses hosts.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..verifier import verify as verify_mod
from ..verifier.arrays import ProofArrays
from ..verifier.spec import VerifierSpec


def make_mesh(devices=None, axis: str = "proofs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_proof_arrays(pa: ProofArrays, mesh: Mesh, axis: str = "proofs") -> ProofArrays:
    """Place batched proof tensors with the batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), pa)


def verify_sharded(
    spec: VerifierSpec,
    pa: ProofArrays,
    inputs=verify_mod.INPUTS_ONE,
    mesh: Mesh = None,
    axis: str = "proofs",
):
    """Batched verification over a device mesh.

    Returns (ok_per_proof (B,), all_ok ()) — `all_ok` is the collective
    verdict reduction (an AND == psum of failures being zero)."""
    mesh = mesh or make_mesh()
    pa = shard_proof_arrays(pa, mesh, axis)

    @partial(jax.jit, out_shardings=(NamedSharding(mesh, P(axis)), None))
    def run(arrs):
        checks = verify_mod.verify_batch(spec, arrs, inputs)
        ok = checks["ok"]
        return ok, jnp.all(ok)

    return run(pa)


def verify_sharded_padded(
    spec: VerifierSpec,
    pa: ProofArrays,
    inputs=verify_mod.INPUTS_ONE,
    mesh: Mesh = None,
    axis: str = "proofs",
):
    """verify_sharded for batch sizes that do not divide the mesh: the batch
    is padded by replicating row 0 (a structurally valid proof) up to the
    next mesh multiple; verdicts are truncated back to the real prefix and
    the collective verdict ignores the padding."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    B = np.asarray(pa.commitments).shape[0]
    pad = (-B) % n_dev
    if pad:
        def _pad(x):
            x = np.asarray(x)
            reps = np.repeat(x[:1], pad, axis=0)
            return np.concatenate([x, reps], axis=0)

        pa = jax.tree.map(_pad, pa)
    ok, _ = verify_sharded(spec, pa, inputs, mesh, axis)
    ok = ok[:B]
    return ok, jnp.all(ok)


def verify_shard_map(
    spec: VerifierSpec,
    pa: ProofArrays,
    inputs=verify_mod.INPUTS_ONE,
    mesh: Mesh = None,
    axis: str = "proofs",
):
    """Same computation expressed with shard_map + explicit psum, exercising
    the collective path (used by the multi-chip dry run)."""
    from jax import shard_map

    mesh = mesh or make_mesh()
    pa = jax.tree.map(jnp.asarray, pa)

    def local(arrs):
        checks = verify_mod.verify_batch(spec, arrs, inputs)
        ok = checks["ok"]
        n_bad = jnp.sum(~ok).astype(jnp.uint32)
        total_bad = jax.lax.psum(n_bad, axis)
        return ok, total_bad

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis),  # prefix spec: shard every leaf's batch axis
        out_specs=(P(axis), P()),
    )
    ok, total_bad = jax.jit(fn)(pa)
    return ok, total_bad == 0


def make_mesh_2d(devices=None, shape=None, axes=("host", "chip")) -> Mesh:
    """Hierarchical hosts x chips mesh: outer axis rides DCN, inner axis
    ICI.  On real multi-host pods, `jax.distributed.initialize()` +
    jax.devices() yields the global device list and this reshape puts each
    host's local chips contiguous on the inner axis (JAX device order is
    host-major), so the inner psum stays on ICI."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (2, n // 2)
    assert shape[0] * shape[1] == n
    return Mesh(np.array(devices).reshape(shape), axes)


def verify_shard_map_2d(
    spec: VerifierSpec,
    pa: ProofArrays,
    inputs=verify_mod.INPUTS_ONE,
    mesh: Mesh = None,
):
    """verify_shard_map over a (host, chip) mesh with a two-stage verdict
    reduction: failures psum over 'chip' (intra-host, ICI) first, then
    over 'host' (DCN) — the wire pattern of a real multi-host deployment,
    where only one scalar per host crosses DCN.

    Returns (ok (B,), per_host_bad (n_hosts,), all_ok ())."""
    from jax import shard_map

    mesh = mesh or make_mesh_2d()
    host_ax, chip_ax = mesh.axis_names
    pa = jax.tree.map(jnp.asarray, pa)

    def local(arrs):
        checks = verify_mod.verify_batch(spec, arrs, inputs)
        ok = checks["ok"]
        n_bad = jnp.sum(~ok).astype(jnp.uint32)
        bad_ici = jax.lax.psum(n_bad, chip_ax)        # intra-host (ICI)
        bad_global = jax.lax.psum(bad_ici, host_ax)   # cross-host (DCN)
        return ok, bad_ici[None], bad_global

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P((host_ax, chip_ax)),
        out_specs=(P((host_ax, chip_ax)), P(host_ax), P()),
    )
    ok, per_host_bad, total_bad = jax.jit(fn)(pa)
    return ok, per_host_bad, total_bad == 0
