"""prover_fast (threaded native FrVec prover) vs prover (python-int oracle).

The fast prover must be byte-identical on every circuit family, multiopen
scheme, transcript, and zk mode — the same self-check discipline the
reference SDK applies by re-verifying cached proofs
(snark-verifier-sdk/src/halo2.rs:163-177).  Also covers the FrVec kernel
layer itself (native/bn254_native.cpp v2) against python-int arithmetic.
"""

import random

import pytest

from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util import frvec as fv

pytestmark = pytest.mark.skipif(
    not fv.available(), reason="native bn254 library unavailable"
)

R = bn254.R


def test_frvec_ops_vs_oracle():
    rng = random.Random(7)
    n = 257
    xs = [rng.randrange(R) for _ in range(n)]
    ys = [rng.randrange(R) for _ in range(n)]
    X, Y = fv.FrVec.from_ints(xs), fv.FrVec.from_ints(ys)
    assert X.to_ints() == xs
    assert (X + Y).to_ints() == [(a + b) % R for a, b in zip(xs, ys)]
    assert (X - Y).to_ints() == [(a - b) % R for a, b in zip(xs, ys)]
    assert (X * Y).to_ints() == [a * b % R for a, b in zip(xs, ys)]
    c = rng.randrange(R)
    assert X.scale(c).to_ints() == [a * c % R for a in xs]
    assert X.add_scaled(Y, c).to_ints() == [(a + c * b) % R for a, b in zip(xs, ys)]
    xs2 = list(xs)
    xs2[17] = 0
    inv = fv.FrVec.from_ints(xs2).inv().to_ints()
    assert inv[17] == 0
    assert all(inv[i] * xs2[i] % R == 1 for i in range(n) if i != 17)
    pp = X.prefix_prod().to_ints()
    acc = 1
    for i, v in enumerate(xs):
        acc = acc * v % R
        assert pp[i] == acc
    assert fv.FrVec.pow_series(c, n).to_ints() == [pow(c, i, R) for i in range(n)]
    assert X.rotate(3).to_ints() == xs[3:] + xs[:3]
    assert X.rotate(-1).to_ints() == xs[-1:] + xs[:-1]


def test_frvec_ntt_horner_div_vs_oracle():
    from snark_verifier_tpu.util import poly as up

    rng = random.Random(8)
    k = 8
    vals = [rng.randrange(R) for _ in range(1 << k)]
    om = bn254.root_of_unity(k)
    want = up._ntt_py(vals, om)
    assert fv.FrVec.from_ints(vals).ntt(om).to_ints() == want
    sc = rng.randrange(R)
    assert fv.FrVec.from_ints(vals).ntt(om, sc).to_ints() == [
        v * sc % R for v in want
    ]
    x = rng.randrange(R)
    assert fv.horner(fv.FrVec.from_ints(vals), x) == up.eval_poly(vals, x)
    q, rem = fv.div_linear(fv.FrVec.from_ints(vals), x)
    q2, rem2 = up.divide_by_linear(vals, x)
    assert q.to_ints() == q2 and rem == rem2


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
@pytest.mark.parametrize("transcript_kind", ["evm", "poseidon"])
def test_prover_fast_byte_identical(scheme, transcript_kind):
    from snark_verifier_tpu.system.halo2 import circuits, prover, prover_fast
    from snark_verifier_tpu.system.halo2.srs import gen_srs

    srs = gen_srs(8)
    # (name, pk, instances, zk)
    cases = [
        ("std", circuits.build_standard_plonk(8, srs)[1], [[7]], False),
        ("std-zk", circuits.build_standard_plonk(8, srs, zk=True)[1], [[7]], True),
        ("lookup", circuits.build_lookup_plonk(8, srs)[1], [[7]], False),
        (
            "lookup-zk",
            circuits.build_lookup_plonk(8, srs, zk=True)[1],
            [[7]],
            True,
        ),
        ("fib", circuits.build_fibonacci(6, srs)[1], [], False),
    ]
    for name, pk, inst, zk in cases:
        kw1 = dict(rng=random.Random(42)) if zk else {}
        kw2 = dict(rng=random.Random(42)) if zk else {}
        a = prover.create_proof(pk, inst, scheme, transcript_kind, **kw1)
        b = prover_fast.create_proof_fast(pk, inst, scheme, transcript_kind, **kw2)
        assert a == b, f"prover_fast diverges on {name}"


def test_native_msm2_and_srs_gen_vs_oracle():
    from snark_verifier_tpu.util import native_ec

    rng = random.Random(9)
    n = 128
    scalars = [rng.randrange(R) for _ in range(n)]
    pts = []
    pt = bn254.G1_GEN
    for _ in range(n):
        pts.append(pt)
        pt = bn254.g1_add(pt, bn254.G1_GEN)
    pts[5] = None
    want = bn254.g1_msm(scalars, pts)
    pm = native_ec.g1_to_mont(pts)
    su = fv.FrVec.from_ints(scalars).to_canonical_u64()
    assert native_ec.msm2(su, pm) == want
    assert native_ec.g1_from_mont(pm) == pts

    tau = 0xDEADBEEF12345678
    got = native_ec.g1_from_mont(native_ec.srs_gen_mont(tau, 32))
    acc = 1
    for i in range(32):
        assert got[i] == bn254.g1_mul(bn254.G1_GEN, acc)
        acc = acc * tau % R
