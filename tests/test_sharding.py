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
