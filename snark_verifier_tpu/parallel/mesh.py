"""Multi-chip parallelism: device meshes, sharded verification, sharded MSM.

The scaling layer the reference lacks (SURVEY §2.3): proof batches are
data-parallel across chips (`NamedSharding` over the batch axis of the
jitted verifier), and large MSMs shard their points across the mesh with
partial results combined via an `all_gather` + local group-law tree-sum
(the EC analogue of a psum — point addition is not an XLA reduction op, so
partials ride ICI as 3x16 u32 coordinates and fold on every chip).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import msm as M
from snark_verifier_tpu.ops.curve import G1


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_verifier(verify_fn, mesh: Mesh, axis: str = "dp"):
    """jit the batched verifier with the proof batch sharded over the mesh."""
    data_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(
        verify_fn,
        in_shardings=(data_sharding, data_sharding),
        out_shardings=NamedSharding(mesh, P(axis)),
    )


def make_mesh_2d(n_hosts: int, chips_per_host: int) -> Mesh:
    """Two-level mesh for multi-host deployments: the slow "dcn" axis spans
    hosts, the fast "ici" axis spans a host's chips.  Shardings should keep
    heavy collectives on "ici" and cross "dcn" only with per-host scalars /
    single points (BASELINE config 5's N>=2-host topology)."""
    devs = jax.devices()
    n = n_hosts * chips_per_host
    assert len(devs) >= n, "not enough devices for the requested 2D mesh"
    return Mesh(
        np.array(devs[:n]).reshape(n_hosts, chips_per_host), ("dcn", "ici")
    )


def shard_verifier_2d(verify_fn, mesh: Mesh):
    """Batch-verify over a (dcn, ici) mesh: pure data parallelism over the
    flattened device grid — each proof's verification is chip-local, so NO
    collective crosses either axis; DCN carries only the initial scatter."""
    data_sharding = NamedSharding(mesh, P(("dcn", "ici")))
    return jax.jit(
        verify_fn,
        in_shardings=(data_sharding, data_sharding),
        out_shardings=data_sharding,
    )


def pad_msm_inputs(points: G1, scalars_canon, multiple: int):
    """Pad an MSM's points with the identity and scalars with 0 so the point
    count divides the mesh size (identity contributes nothing)."""
    import jax.numpy as jnp

    n = points.x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return points, scalars_canon
    ident = C.g1_identity((pad,))
    pts = G1(
        jnp.concatenate([points.x, ident.x]),
        jnp.concatenate([points.y, ident.y]),
        jnp.concatenate([points.z, ident.z]),
    )
    scal = jnp.concatenate(
        [scalars_canon, jnp.zeros((pad,) + scalars_canon.shape[1:], scalars_canon.dtype)]
    )
    return pts, scal


def sharded_msm(points: G1, scalars_canon, mesh: Mesh, axis: str = "dp", window: int = 8):
    """One large MSM with points/scalars sharded across the mesh.

    Each chip runs bucket-Pippenger over its local shard; the n_dev partial
    sums are all-gathered over ICI and tree-summed on every chip
    (the TPU mapping of the reference's rayon partial-result fold,
    util/msm.rs:311-336).  Inputs whose length does not divide the mesh are
    padded with identity points.
    """
    n_dev = mesh.devices.size
    points, scalars_canon = pad_msm_inputs(points, scalars_canon, n_dev)
    n = points.x.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(G1(P(axis), P(axis), P(axis)), P(axis)),
        out_specs=G1(P(), P(), P()),
        check_vma=False,
    )
    def _local(pts, scal):
        partial = M.msm_serial(pts, scal, window)
        gathered = jax.lax.all_gather(partial, axis)  # G1 with leading n_dev
        total = C.g1_tree_sum(gathered)
        return G1(total.x, total.y, total.z)

    return _local(points, scalars_canon)


def sharded_msm_2d(points: G1, scalars_canon, mesh: Mesh, window: int = 8):
    """Hierarchical large MSM over a (dcn, ici) mesh.

    Points shard over the flattened grid; partial sums fold in two stages so
    the heavy exchange stays on ICI: (1) all_gather + tree-sum across the
    host-local "ici" axis (chips_per_host partials x 3x16 u32 words over
    ICI), (2) all_gather of ONE point per host across "dcn" + tree-sum —
    DCN carries n_hosts * 192 bytes total, independent of MSM size."""
    n_dev = mesh.devices.size
    points, scalars_canon = pad_msm_inputs(points, scalars_canon, n_dev)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            G1(P(("dcn", "ici")), P(("dcn", "ici")), P(("dcn", "ici"))),
            P(("dcn", "ici")),
        ),
        out_specs=G1(P(), P(), P()),
        check_vma=False,
    )
    def _local(pts, scal):
        partial = M.msm_serial(pts, scal, window)
        host_total = C.g1_tree_sum(jax.lax.all_gather(partial, "ici"))
        total = C.g1_tree_sum(jax.lax.all_gather(host_total, "dcn"))
        return G1(total.x, total.y, total.z)

    return _local(points, scalars_canon)
