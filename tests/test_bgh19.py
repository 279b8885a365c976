"""BGH19 structural tests (verifier-side; e2e pending a halo2-IPA prover)."""

from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs import Query
from snark_verifier_tpu.pcs.ipa.bgh19 import _query_set_coeffs, _query_sets
from snark_verifier_tpu.system.halo2.transcript import NativeBlake2bTranscript
from snark_verifier_tpu.util import bn254 as bn


def test_query_set_grouping():
    loader = NativeLoader()
    e = lambda v: loader.load_const(v)
    w = bn.root_of_unity(4)
    queries = [
        Query(0, 1, e(10)),
        Query(1, 1, e(11)),
        Query(2, 1, e(12)),
        Query(2, w, e(13)),
        Query(3, 1, e(14)),
    ]
    sets = _query_sets(queries)
    assert len(sets) == 2
    assert sets[0].shifts == [1]
    assert sets[0].polys == [0, 1, 3]
    assert sets[1].shifts == [1, w]
    assert sets[1].polys == [2]


def test_query_set_coeffs_barycentric():
    """The evaluated coefficients interpolate correctly: for a set with
    shifts {1, w}, r(x3) computed via the coeffs must equal the Lagrange
    interpolation through (x*1, e0), (x*w, e1)."""
    loader = NativeLoader()
    e = lambda v: loader.load_const(v)
    w = bn.root_of_unity(4)
    x_v, x3_v = 987654321, 123456789
    e0, e1 = 111, 222
    queries = [Query(0, 1, e(e0)), Query(0, w, e(e1))]
    sets = _query_sets(queries)
    coeffs = _query_set_coeffs(sets, e(x_v), e(x3_v))

    got = (
        loader.sum_products(
            [(c.evaluated(), ev) for c, ev in zip(coeffs[0].eval_coeffs, sets[0].evals[0])]
        )
        * coeffs[0].r_eval_coeff.evaluated()
    ).value

    # reference Lagrange interpolation at x3 over points (x, e0), (x*w, e1)
    p0, p1 = x_v, x_v * w % bn.R
    l0 = (x3_v - p1) * bn.inv_mod((p0 - p1) % bn.R, bn.R) % bn.R
    l1 = (x3_v - p0) * bn.inv_mod((p1 - p0) % bn.R, bn.R) % bn.R
    exp = (e0 * l0 + e1 * l1) % bn.R
    assert got == exp


def test_blake2b_transcript_roundtrip():
    loader = NativeLoader()
    t = NativeBlake2bTranscript(loader=loader)
    pt = bn.g1_mul(bn.G1_GEN, 77)
    from snark_verifier_tpu.loader import EcPoint

    t.write_scalar(loader.load_const(12345))
    t.write_ec_point(EcPoint(loader, pt))
    c1 = t.squeeze_challenge()
    proof = t.finalize()

    r = NativeBlake2bTranscript(proof, loader)
    s = r.read_scalar()
    p = r.read_ec_point()
    c2 = r.squeeze_challenge()
    assert s.value == 12345
    assert p.value == pt
    assert c1.value == c2.value
    # different absorption -> different challenge
    r2 = NativeBlake2bTranscript(proof, loader)
    r2.read_scalar()
    assert r2.squeeze_challenge().value != c1.value
