"""BGH19 tests: structure + full prover->verifier->decider e2e on BN254 AND
pallas (the reference's IPA curve, system/halo2/test/ipa/native.rs)."""

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


import random

import pytest

from snark_verifier_tpu.errors import AssertionFailure
from snark_verifier_tpu.loader import EcPoint
from snark_verifier_tpu.pcs.ipa import IpaAs, IpaProvingKey
from snark_verifier_tpu.pcs.ipa.bgh19 import Bgh19
from snark_verifier_tpu.util.curves import pallas
from snark_verifier_tpu.util.msm_symbolic import Msm


def _peval(c, z, r):
    acc = 0
    for v in reversed(c):
        acc = (acc * z + v) % r
    return acc


def _absorb(transcript, loader, commits, evals, x):
    for c in commits:
        transcript.common_ec_point(EcPoint(loader, c))
    for v in evals:
        transcript.common_scalar(loader.load_const(v))
    transcript.common_scalar(loader.load_const(x))


@pytest.mark.parametrize("curve", [bn, pallas], ids=["bn254", "pallas"])
def test_bgh19_end_to_end(curve):
    k, npoly = 3, 4
    r = curve.R
    pk = IpaProvingKey.rand(k, zk=True, seed=5, curve=curve)
    rng = random.Random(9)
    polys = [[rng.randrange(r) for _ in range(1 << k)] for _ in range(npoly)]
    w = curve.root_of_unity(k)
    specs = [(0, 1), (1, 1), (2, 1), (2, w), (3, 1)]
    x = rng.randrange(r)
    commits = [pk.commit(p, 0) for p in polys]  # unblinded commits, zk base
    evals = [_peval(polys[p], sh * x % r, r) for p, sh in specs]

    lp = NativeLoader(curve)
    tw = NativeBlake2bTranscript(loader=lp)
    _absorb(tw, lp, commits, evals, x)
    Bgh19.create_proof(pk, polys, specs, x, tw)
    stream = tw.finalize()

    def verify(evals_v):
        lv = NativeLoader(curve)
        tr = NativeBlake2bTranscript(stream, lv)
        _absorb(tr, lv, commits, evals_v, x)
        queries = [
            Query(p, sh, lv.load_const(ev)) for (p, sh), ev in zip(specs, evals_v)
        ]
        proof = Bgh19.read_proof(pk.svk(), queries, tr)
        commitments = [Msm.base(EcPoint(lv, c)) for c in commits]
        acc = Bgh19.verify(pk.svk(), commitments, lv.load_const(x), queries, proof)
        assert IpaAs.decide(pk.dk(), acc) is True

    verify(evals)

    # negative: a single wrong claimed eval must fail the final IPA check
    bad = list(evals)
    bad[2] = (bad[2] + 1) % r
    with pytest.raises(AssertionFailure):
        verify(bad)
