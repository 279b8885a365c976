"""Native C++ BN254 MSM vs the python oracle."""

import random

import pytest

from snark_verifier_tpu.util import bn254 as bn
from snark_verifier_tpu.util import native_ec

rng = random.Random(17)


@pytest.mark.skipif(not native_ec.available(), reason="g++ / native lib unavailable")
def test_native_msm_matches_oracle():
    n = 50
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    scal = [rng.randrange(bn.R) for _ in range(n)]
    scal[0] = 0
    scal[1] = 1
    scal[2] = bn.R - 1
    pts[3] = None
    assert native_ec.msm(scal, pts) == bn.g1_msm(scal, pts)


@pytest.mark.skipif(not native_ec.available(), reason="g++ / native lib unavailable")
def test_native_msm_edge_cases():
    g = bn.G1_GEN
    # all-zero scalars -> identity
    assert native_ec.msm([0, 0], [g, g]) is None
    # duplicate points, cancelling scalars
    assert native_ec.msm([5, bn.R - 5], [g, g]) is None
    assert native_ec.msm([7], [g]) == bn.g1_mul(g, 7)


def test_fast_msm_fallback_equivalence():
    n = 10
    pts = [bn.g1_mul(bn.G1_GEN, i + 2) for i in range(n)]
    scal = [rng.randrange(bn.R) for _ in range(n)]
    assert bn.fast_msm(scal, pts) == bn.g1_msm(scal, pts)
