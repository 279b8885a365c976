"""Multi-chip sharding on the virtual 8-device CPU mesh: 1-chip vs N-chip
results must agree bit-exactly (SURVEY §4's multi-node equivalence tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import msm as M
from snark_verifier_tpu.ops.limbs import ints_to_limbs
from snark_verifier_tpu.parallel.mesh import make_mesh, sharded_msm
from snark_verifier_tpu.util import bn254 as bn


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_msm_matches_single_chip():
    mesh = make_mesh(8)
    n = 32
    pts = [bn.g1_mul(bn.G1_GEN, i + 3) for i in range(n)]
    scalars = [bn.R - 5 * i - 1 for i in range(n)]
    g1 = C.g1_from_affine_ints(pts)
    scal = jnp.asarray(ints_to_limbs(scalars))

    single = C.g1_to_affine_ints(M.msm_serial(g1, scal, 8))[0]
    with mesh:
        total = sharded_msm(g1, scal, mesh)
    multi = C.g1_to_affine_ints(total)[0]
    assert single == multi == bn.g1_msm(scalars, pts)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_msm_2d_and_padding():
    """2-host x 4-chip hierarchical MSM (DCN story, BASELINE config 5 shape):
    bit-equal to single-chip, including a point count that does NOT divide
    the mesh (identity padding)."""
    from snark_verifier_tpu.parallel.mesh import make_mesh_2d, sharded_msm_2d

    mesh = make_mesh_2d(2, 4)
    n = 37  # deliberately not a multiple of 8
    pts = [bn.g1_mul(bn.G1_GEN, 2 * i + 5) for i in range(n)]
    scalars = [bn.R - 7 * i - 3 for i in range(n)]
    g1 = C.g1_from_affine_ints(pts)
    scal = jnp.asarray(ints_to_limbs(scalars))

    with mesh:
        total = sharded_msm_2d(g1, scal, mesh)
    multi = C.g1_to_affine_ints(total)[0]
    assert multi == bn.g1_msm(scalars, pts)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_verifier_2d_matches_flat():
    from snark_verifier_tpu.parallel.batch import (
        build_verifier,
        pack_instances,
        pack_proofs,
    )
    from snark_verifier_tpu.parallel.mesh import make_mesh_2d, shard_verifier_2d
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.sdk import gen_proof
    from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
    from snark_verifier_tpu.system.halo2.srs import gen_srs

    srs = gen_srs(4)
    protocol, pk = build_standard_plonk(4, srs)
    instances = [[[i + 50]] for i in range(8)]
    proofs = [
        gen_proof(pk, ins, "gwc", cache_name=f"shard2d_{i}")
        for i, ins in enumerate(instances)
    ]
    fn = build_verifier(protocol, KzgGwc, srs.g[0])
    pa, ia = pack_proofs(proofs), pack_instances(instances)

    flat = jax.jit(fn)(pa, ia)
    mesh = make_mesh_2d(2, 4)
    out = shard_verifier_2d(fn, mesh)(pa, ia)
    assert bool(np.asarray(out["ok"]).all())
    for key in ("lhs_x", "lhs_y", "rhs_x", "rhs_y"):
        assert np.array_equal(np.asarray(out[key]), np.asarray(flat[key]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_msm_at_scale_2e16():
    """At-scale sharded MSM (BASELINE config-5 ingredient): 2^16 points
    split across the 8-device mesh, ICI-folded, bit-equal to the host
    oracle on structured inputs (64 distinct points/scalars tiled, so the
    oracle sum is cheap to compute exactly)."""
    mesh = make_mesh(8)
    n = 1 << 16
    reps = n // 64
    base_pts = [bn.g1_mul(bn.G1_GEN, i + 3) for i in range(64)]
    base_scal = [bn.R - 5 * i - 1 for i in range(64)]
    g1 = C.g1_from_affine_ints(base_pts * reps)
    scal = jnp.asarray(np.tile(ints_to_limbs(base_scal), (reps, 1)))

    with mesh:
        total = sharded_msm(g1, scal, mesh)
    multi = C.g1_to_affine_ints(total)[0]
    # oracle: sum_i reps * s_i * P_i
    expect = bn.g1_msm([s * reps % bn.R for s in base_scal], base_pts)
    assert multi == expect


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_config5_shaped_batch_2d_mesh():
    """Config-5-shaped batch: 1024 proofs sharded over the 2-host x 4-chip
    virtual mesh, ok-mask all true and accumulators bit-equal to the flat
    single-device run (the DCN/ICI data-parallel production shape)."""
    from snark_verifier_tpu.parallel.batch import (
        build_verifier,
        pack_instances,
        pack_proofs,
    )
    from snark_verifier_tpu.parallel.mesh import make_mesh_2d, shard_verifier_2d
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.sdk import gen_proof
    from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
    from snark_verifier_tpu.system.halo2.srs import gen_srs

    srs = gen_srs(4)
    protocol, pk = build_standard_plonk(4, srs)
    uniq = [[[i + 90]] for i in range(8)]
    proofs = [
        gen_proof(pk, ins, "gwc", cache_name=f"cfg5_{i}")
        for i, ins in enumerate(uniq)
    ]
    B = 1024
    reps = B // len(proofs)
    pa = jnp.tile(pack_proofs(proofs), (reps, 1))
    ia = jnp.tile(pack_instances(uniq), (reps, 1, 1))

    fn = build_verifier(protocol, KzgGwc, srs.g[0])
    flat = jax.jit(fn)(pa, ia)
    mesh = make_mesh_2d(2, 4)
    out = shard_verifier_2d(fn, mesh)(pa, ia)
    assert out["ok"].shape[0] == B
    assert bool(np.asarray(out["ok"]).all())
    for key in ("lhs_x", "lhs_y", "rhs_x", "rhs_y"):
        assert np.array_equal(np.asarray(out[key]), np.asarray(flat[key]))
