"""Bit-exact tests of JAX limb field ops against the pure-Python oracle."""

import random

import numpy as np
import pytest

from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops.limbs import NLIMB
from snark_verifier_tpu.util import bn254 as bn

rng = random.Random(42)


def rand_vals(spec, n):
    vals = [rng.randrange(spec.modulus) for _ in range(n - 2)] + [0, spec.modulus - 1]
    return vals[:n]


@pytest.mark.parametrize("spec", [F.FQ, F.FR], ids=["Fq", "Fr"])
def test_encode_decode_roundtrip(spec):
    vals = rand_vals(spec, 8)
    enc = spec.encode(vals)
    assert enc.shape == (8, NLIMB)
    dec = spec.decode(enc)
    assert list(dec) == vals


@pytest.mark.parametrize("spec", [F.FQ, F.FR], ids=["Fq", "Fr"])
def test_add_sub_neg(spec):
    m = spec.modulus
    a_vals, b_vals = rand_vals(spec, 16), rand_vals(spec, 16)[::-1]
    a, b = spec.encode(a_vals), spec.encode(b_vals)
    got = spec.decode(F.add(a, b, spec))
    assert list(got) == [(x + y) % m for x, y in zip(a_vals, b_vals)]
    got = spec.decode(F.sub(a, b, spec))
    assert list(got) == [(x - y) % m for x, y in zip(a_vals, b_vals)]
    got = spec.decode(F.neg(a, spec))
    assert list(got) == [(-x) % m for x in a_vals]


@pytest.mark.parametrize("spec", [F.FQ, F.FR], ids=["Fq", "Fr"])
def test_mont_mul(spec):
    m = spec.modulus
    a_vals, b_vals = rand_vals(spec, 32), rand_vals(spec, 32)[::-1]
    a, b = spec.encode(a_vals), spec.encode(b_vals)
    got = spec.decode(F.mont_mul(a, b, spec))
    assert list(got) == [x * y % m for x, y in zip(a_vals, b_vals)]
    # multi-dim batch
    a2 = a.reshape(4, 8, NLIMB)
    b2 = b.reshape(4, 8, NLIMB)
    got2 = spec.decode(F.mont_mul(a2, b2, spec)).reshape(-1)
    assert list(got2) == [x * y % m for x, y in zip(a_vals, b_vals)]


def test_mont_mul_edge_cases():
    spec = F.FQ
    m = spec.modulus
    edge = [0, 1, m - 1, m - 2, (1 << 255) % m, 2**16 - 1, 2**16, 2**255 % m]
    a = spec.encode(edge)
    for y in [0, 1, m - 1, 12345]:
        b = spec.encode([y] * len(edge))
        got = spec.decode(F.mont_mul(a, b, spec))
        assert list(got) == [x * y % m for x in edge]


@pytest.mark.parametrize("spec", [F.FQ, F.FR], ids=["Fq", "Fr"])
def test_pow_and_inv(spec):
    m = spec.modulus
    vals = [rng.randrange(1, m) for _ in range(4)]
    a = spec.encode(vals)
    got = spec.decode(F.pow_const(a, 65537, spec))
    assert list(got) == [pow(x, 65537, m) for x in vals]
    got = spec.decode(F.inv(a, spec))
    assert list(got) == [pow(x, -1, m) for x in vals]
    # inversion of zero -> zero
    z = spec.encode([0])
    assert list(spec.decode(F.inv(z, spec))) == [0]


@pytest.mark.parametrize("spec", [F.FR], ids=["Fr"])
def test_batch_inv(spec):
    m = spec.modulus
    vals = [rng.randrange(m) for _ in range(9)] + [0, 1, m - 1]
    a = spec.encode(vals)
    got = spec.decode(F.batch_inv(a, spec))
    expect = bn.batch_inv_mod(vals, m)
    assert list(got) == expect
    # batched along axis 0 with trailing batch dim
    a2 = np.stack([a, a], axis=1)  # (12, 2, 16)
    got2 = spec.decode(F.batch_inv(a2, spec, axis=0))
    for col in range(2):
        assert list(got2[:, col]) == expect


def test_to_from_mont():
    spec = F.FR
    vals = rand_vals(spec, 8)
    canon = np.stack([np.asarray(
        [int(v) >> (16 * i) & 0xFFFF for i in range(NLIMB)], dtype=np.uint32)
        for v in vals])
    mont = F.to_mont(canon, spec)
    assert list(spec.decode(mont)) == vals
    back = np.asarray(F.from_mont(mont, spec))
    assert (back == canon).all()


def test_jit_and_vmap():
    import jax

    spec = F.FR
    m = spec.modulus
    vals = rand_vals(spec, 8)
    a = spec.encode(vals)
    f = jax.jit(lambda x, y: F.mont_mul(x, y, spec))
    got = spec.decode(f(a, a))
    assert list(got) == [x * x % m for x in vals]
    g = jax.vmap(lambda x: F.mont_sqr(x, spec))
    got = spec.decode(g(a))
    assert list(got) == [x * x % m for x in vals]
