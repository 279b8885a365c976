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


def test_native_fr_ntt_matches_python():
    """The native C++ NTT (bn254_fr_ntt) must be bit-exact vs the python
    oracle path, both directions, including the coset helpers."""
    import random

    from snark_verifier_tpu.util import bn254, native_ec
    from snark_verifier_tpu.util.poly import _ntt_py

    if not native_ec.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(3)
    for k in (6, 9, 12):
        n = 1 << k
        vals = [rng.randrange(bn254.R) for _ in range(n)]
        omega = bn254.root_of_unity(k)
        assert native_ec.fr_ntt(vals, omega) == _ntt_py(vals, omega)
        fwd = native_ec.fr_ntt(vals, omega)
        back = native_ec.fr_ntt(
            fwd, bn254.inv_mod(omega, bn254.R), bn254.inv_mod(n, bn254.R)
        )
        assert back == vals
    base = rng.randrange(bn254.R)
    want = [v * pow(base, i, bn254.R) % bn254.R for i, v in enumerate(vals[:256])]
    assert native_ec.fr_powmul(vals[:256], base) == want


def test_prover_native_vs_python_bit_identical():
    """create_proof must emit identical bytes with and without the native
    NTT path (SVTPU_NATIVE=0 forces python)."""
    import os

    from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
    from snark_verifier_tpu.system.halo2.prover import create_proof
    from snark_verifier_tpu.system.halo2.srs import gen_srs

    srs = gen_srs(6)
    protocol, pk = build_standard_plonk(6, srs)
    p_native = create_proof(pk, [[42]], "gwc")
    os.environ["SVTPU_NATIVE"] = "0"
    try:
        p_python = create_proof(pk, [[42]], "gwc")
    finally:
        del os.environ["SVTPU_NATIVE"]
    assert p_native == p_python
