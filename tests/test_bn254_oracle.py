"""Tests for the pure-Python BN254 oracle (the root of the correctness chain)."""

import random

import pytest

from snark_verifier_tpu.util import bn254 as bn


rng = random.Random(0)


def test_field_constants():
    assert bn.P % 4 == 3  # -1 is a QNR, so u^2 = -1 gives a valid Fq2
    assert pow(bn.FR_ROOT_OF_UNITY, 1 << bn.FR_S, bn.R) == 1
    assert pow(bn.FR_ROOT_OF_UNITY, 1 << (bn.FR_S - 1), bn.R) == bn.R - 1


def test_root_of_unity():
    for k in [1, 4, 10]:
        w = bn.root_of_unity(k)
        assert pow(w, 1 << k, bn.R) == 1
        assert pow(w, 1 << (k - 1), bn.R) == bn.R - 1


def test_batch_inv():
    vals = [rng.randrange(1, bn.R) for _ in range(20)] + [0]
    out = bn.batch_inv_mod(vals, bn.R)
    for v, o in zip(vals, out):
        if v == 0:
            assert o == 0
        else:
            assert v * o % bn.R == 1


def test_fq2_arith():
    for _ in range(20):
        a = (rng.randrange(bn.P), rng.randrange(bn.P))
        b = (rng.randrange(bn.P), rng.randrange(bn.P))
        assert bn.fq2_mul(a, b) == bn.fq2_mul(b, a)
        assert bn.fq2_mul(a, bn.fq2_inv(a)) == bn.FQ2_ONE
        assert bn.fq2_sqr(a) == bn.fq2_mul(a, a)
        # distributivity
        assert bn.fq2_mul(a, bn.fq2_add(b, b)) == bn.fq2_add(bn.fq2_mul(a, b), bn.fq2_mul(a, b))


def test_fq6_fq12_arith():
    def rand_fq2():
        return (rng.randrange(bn.P), rng.randrange(bn.P))

    def rand_fq6():
        return (rand_fq2(), rand_fq2(), rand_fq2())

    for _ in range(5):
        a = (rand_fq6(), rand_fq6())
        b = (rand_fq6(), rand_fq6())
        assert bn.fq12_mul(a, b) == bn.fq12_mul(b, a)
        assert bn.fq12_mul(a, bn.fq12_inv(a)) == bn.FQ12_ONE
    # Frobenius == pow p
    a = ((rand_fq6(), rand_fq6()))
    assert bn.fq12_frob(a, 1) == bn.fq12_pow(a, bn.P)


def test_g1_group():
    g = bn.G1_GEN
    assert bn.g1_is_on_curve(g)
    assert bn.g1_add(g, bn.g1_neg(g)) is None
    a, b = rng.randrange(bn.R), rng.randrange(bn.R)
    assert bn.g1_mul(g, a + b) == bn.g1_add(bn.g1_mul(g, a), bn.g1_mul(g, b))
    assert bn.g1_mul(g, bn.R) is None
    assert bn.g1_is_on_curve(bn.g1_mul(g, 12345))


def test_g2_group():
    g = bn.G2_GEN
    assert bn.g2_is_on_curve(g)
    a, b = rng.randrange(bn.R), rng.randrange(bn.R)
    assert bn.g2_mul(g, a + b) == bn.g2_add(bn.g2_mul(g, a), bn.g2_mul(g, b))
    assert bn.g2_mul(g, bn.R) is None
    assert bn.g2_is_on_curve(bn.g2_mul(g, 9999))


def test_g2_frobenius_is_p_power():
    q = bn.g2_mul(bn.G2_GEN, 777)
    assert bn._g2_frobenius(q) == bn.g2_mul(q, bn.P)
    assert bn.g2_is_on_curve(bn._g2_frobenius(q))


@pytest.mark.slow
def test_pairing_bilinear():
    p = bn.G1_GEN
    q = bn.G2_GEN
    e = bn.pairing(p, q)
    assert e != bn.FQ12_ONE
    # e(aP, bQ) == e(P, Q)^(ab)
    a, b = 3, 5
    lhs = bn.pairing(bn.g1_mul(p, a), bn.g2_mul(q, b))
    rhs = bn.fq12_pow(e, a * b)
    assert lhs == rhs
    # non-degenerate order r
    assert bn.fq12_pow(e, bn.R) == bn.FQ12_ONE


@pytest.mark.slow
def test_pairing_check_kzg_style():
    # e(sG, H) * e(-G, sH) == 1  — shape of the KZG decider equation
    # (pcs/kzg/decider.rs:70-82).
    s = 123456789
    lhs = bn.g1_mul(bn.G1_GEN, s)
    assert bn.pairing_check([
        (lhs, bn.G2_GEN),
        (bn.g1_neg(bn.G1_GEN), bn.g2_mul(bn.G2_GEN, s)),
    ])
    assert not bn.pairing_check([
        (lhs, bn.G2_GEN),
        (bn.g1_neg(bn.G1_GEN), bn.g2_mul(bn.G2_GEN, s + 1)),
    ])
