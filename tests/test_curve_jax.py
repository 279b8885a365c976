"""Bit-exact tests of batched G1 Jacobian ops against the oracle."""

import random

import jax
import numpy as np
import pytest

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.util import bn254 as bn

rng = random.Random(7)


def rand_points(n):
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    return pts


def test_affine_roundtrip():
    pts = rand_points(4) + [None]
    p = C.g1_from_affine_ints(pts)
    assert C.g1_to_affine_ints(p) == pts
    assert bool(np.asarray(C.g1_is_on_curve(p)).all())


def test_double():
    pts = rand_points(5) + [None]
    p = C.g1_from_affine_ints(pts)
    got = C.g1_to_affine_ints(C.g1_double(p))
    exp = [bn.g1_double(pt) for pt in pts]
    assert got == exp


def test_add_generic_and_edges():
    pts_a = rand_points(3)
    pts_b = rand_points(3)
    # edge cases: a+a (double), a + (-a) (infinity), inf + b, a + inf, inf+inf
    pts_a += [pts_a[0], pts_a[1], None, pts_a[2], None]
    pts_b += [pts_a[0], bn.g1_neg(pts_a[1]), pts_b[0], None, None]
    a = C.g1_from_affine_ints(pts_a)
    b = C.g1_from_affine_ints(pts_b)
    got = C.g1_to_affine_ints(C.g1_add(a, b))
    exp = [bn.g1_add(x, y) for x, y in zip(pts_a, pts_b)]
    assert got == exp


def test_add_mixed_jacobian_z():
    # points with non-trivial Z: double twice then add — exercises generic path
    pts = rand_points(4)
    p = C.g1_from_affine_ints(pts)
    p2 = C.g1_double(p)
    p4 = C.g1_double(p2)
    got = C.g1_to_affine_ints(C.g1_add(p4, p2))
    exp = [bn.g1_mul(pt, 6) for pt in pts]
    assert got == exp


def test_add_affine():
    pts_a = rand_points(3) + [None, rand_points(1)[0]]
    pts_b = rand_points(3) + [rand_points(1)[0], None]
    a = C.g1_from_affine_ints(pts_a)
    b_aff = C.g1_from_affine_ints(pts_b)
    got = C.g1_to_affine_ints(
        C.g1_add_affine(a, b_aff.x, b_aff.y, C.g1_is_identity(b_aff))
    )
    exp = [bn.g1_add(x, y) for x, y in zip(pts_a, pts_b)]
    assert got == exp


def test_tree_sum():
    pts = rand_points(7)
    p = C.g1_from_affine_ints(pts)
    got = C.g1_to_affine_ints(C.g1_tree_sum(p))[0]
    exp = None
    for pt in pts:
        exp = bn.g1_add(exp, pt)
    assert got == exp


def test_normalize():
    pts = rand_points(3) + [None]
    p = C.g1_from_affine_ints(pts)
    p = C.g1_double(C.g1_double(p))
    norm = C.g1_normalize(p)
    z = C.FQ.decode(np.asarray(norm.z))
    assert list(z) == [1, 1, 1, 0]
    got = C.g1_to_affine_ints(norm)
    exp = [bn.g1_mul(pt, 4) for pt in pts]
    assert got == exp
