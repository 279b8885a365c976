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


def sharded_msm(points: G1, scalars_canon, mesh: Mesh, axis: str = "dp", window: int = 8):
    """One large MSM with points/scalars sharded across the mesh.

    Each chip runs bucket-Pippenger over its local shard; the n_dev partial
    sums are all-gathered over ICI and tree-summed on every chip
    (the TPU mapping of the reference's rayon partial-result fold,
    util/msm.rs:311-336).
    """
    n_dev = mesh.devices.size
    n = points.x.shape[0]
    assert n % n_dev == 0, "pad points to a multiple of the mesh size"

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
