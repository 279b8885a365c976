"""Bit-exactness of the Pallas TPU kernels against the python-int oracle.

The fused kernels (ops/field_pallas.py, ops/curve_pallas.py) are the perf
path on real TPUs; on CPU they execute through the Pallas interpreter
(field_pallas.interpret()), so this suite enforces the CLAUDE.md invariant
("every device kernel must be bit-exact against the oracle") without
hardware.  Shapes cover the tier boundaries: n=1, n=LANES, n=FIXED_TOTAL,
n=FIXED_TOTAL+1 (spills into the next power-of-two tier).
"""

import numpy as np
import pytest

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import curve_pallas as CP
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops import field_pallas as FP
from snark_verifier_tpu.ops.limbs import limbs_to_int
from snark_verifier_tpu.util import bn254

# Small tier so interpret mode stays fast: LANES=128 lanes/block, 2 blocks.
TIER_LANES = 128
TIER_TOTAL = 256


@pytest.fixture
def small_tier(monkeypatch):
    monkeypatch.setattr(FP, "LANES", TIER_LANES)
    monkeypatch.setattr(FP, "FIXED_TOTAL", TIER_TOTAL)

    def fresh():
        FP.mont_mul_pallas.clear_cache()
        CP.g1_add_pallas.clear_cache()
        CP.g1_double_pallas.clear_cache()
        CP.g1_add_select_pallas.clear_cache()

    fresh()
    yield
    fresh()


def _rand_fq(rng, n):
    return [rng.randrange(bn254.P) for _ in range(n)]


def _decode(arr):
    flat = np.asarray(arr).reshape(-1, 16)
    return [F.FQ.from_mont_int(limbs_to_int(r)) for r in flat]


@pytest.mark.parametrize("n", [1, TIER_LANES, TIER_TOTAL, TIER_TOTAL + 1])
def test_mont_mul_pallas_bit_exact(small_tier, n):
    import random

    rng = random.Random(1234 + n)
    a = _rand_fq(rng, n)
    b = _rand_fq(rng, n)
    out = FP.mont_mul_pallas(
        np.asarray(F.FQ.encode(a)), np.asarray(F.FQ.encode(b)), F.FQ
    )
    got = _decode(out)
    want = [x * y % bn254.P for x, y in zip(a, b)]
    assert got == want


def test_mont_mul_pallas_edge_values(small_tier):
    """0, 1, p-1 products, including 0*0."""
    vals = [0, 1, bn254.P - 1, bn254.P - 2, 2]
    a = [x for x in vals for _ in vals]
    b = [y for _ in vals for y in vals]
    out = FP.mont_mul_pallas(
        np.asarray(F.FQ.encode(a)), np.asarray(F.FQ.encode(b)), F.FQ
    )
    assert _decode(out) == [x * y % bn254.P for x, y in zip(a, b)]


def _points(rng, n, with_identity=True):
    """Projective G1 batch: random multiples of G with identities mixed in."""
    pts = []
    for i in range(n):
        if with_identity and i % 7 == 3:
            pts.append(None)
        else:
            pts.append(bn254.g1_mul(bn254.G1_GEN, rng.randrange(1, 1 << 64)))
    return pts


def _g1_from(pts):
    return C.g1_from_affine_ints(pts)


def _affine_ints(g: C.G1):
    return C.g1_to_affine_ints(g)


def _oracle_add(p, q):
    return bn254.g1_add(p, q)


@pytest.mark.parametrize("n", [1, TIER_LANES, TIER_TOTAL + 1])
def test_g1_add_pallas_bit_exact(small_tier, n):
    import random

    rng = random.Random(99 + n)
    ps, qs = _points(rng, n), _points(rng, n)
    got = _affine_ints(CP.g1_add_pallas(_g1_from(ps), _g1_from(qs)))
    want = [_oracle_add(p, q) for p, q in zip(ps, qs)]
    assert list(got) == want


@pytest.mark.parametrize("n", [1, TIER_LANES])
def test_g1_double_pallas_bit_exact(small_tier, n):
    import random

    rng = random.Random(7 + n)
    ps = _points(rng, n)
    got = _affine_ints(CP.g1_double_pallas(_g1_from(ps)))
    want = [_oracle_add(p, p) for p in ps]
    assert list(got) == want


@pytest.mark.parametrize("n", [1, TIER_LANES, TIER_TOTAL + 1])
def test_g1_add_select_pallas_bit_exact(small_tier, n):
    """cond ? p+q : p — the fused conditional-accumulate (tree/scan folds)."""
    import random

    rng = random.Random(17 + n)
    ps, qs = _points(rng, n), _points(rng, n)
    cond = np.asarray([i % 3 != 0 for i in range(n)])
    got = _affine_ints(CP.g1_add_select_pallas(cond, _g1_from(ps), _g1_from(qs)))
    want = [_oracle_add(p, q) if c else p for p, q, c in zip(ps, qs, cond)]
    assert list(got) == want


def test_g1_add_t_transposed_layout(small_tier):
    """The (16, L) transposed wrappers match the oracle (incl. identities)."""
    import random

    rng = random.Random(5)
    n = TIER_LANES
    ps, qs = _points(rng, n), _points(rng, n)
    gp, gq = _g1_from(ps), _g1_from(qs)

    def to_t(g):
        return tuple(np.asarray(c).reshape(n, 16).T for c in (g.x, g.y, g.z))

    outs = CP.g1_add_t(to_t(gp), to_t(gq))
    got = C.G1(*(np.asarray(o).T.reshape(n, 16) for o in outs))
    want = [_oracle_add(p, q) for p, q in zip(ps, qs)]
    assert list(_affine_ints(got)) == want

    douts = CP.g1_double_t(to_t(gp))
    dgot = C.G1(*(np.asarray(o).T.reshape(n, 16) for o in douts))
    assert list(_affine_ints(dgot)) == [_oracle_add(p, p) for p in ps]
