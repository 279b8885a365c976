"""Bit-exactness of the fused-window Pallas MSM (ops/msm_pallas.py) against
the python-int oracle, via the Pallas interpreter on a small lane tier.

Interpreted kernels are ~10^4x slower than compiled ones, so these tests use
the `nwindows` hook with 32-bit scalars (9 signed windows instead of 64);
the window recurrence is identical for every window, so covering 9 of them
covers the logic.  Full-width scalars run on real TPU via bench.py, which
asserts verification of whole proof batches through this path.
"""

import random

import numpy as np
import pytest

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import field_pallas as FP
from snark_verifier_tpu.ops import msm_pallas as MP
from snark_verifier_tpu.ops.limbs import ints_to_limbs
from snark_verifier_tpu.util import bn254

TIER_LANES = 128
TIER_TOTAL = 128
NWIN = 9  # scalars < 2^32 < 2^(4 * 9 - 1)


@pytest.fixture
def small_tier(monkeypatch):
    monkeypatch.setattr(FP, "LANES", TIER_LANES)
    monkeypatch.setattr(FP, "FIXED_TOTAL", TIER_TOTAL)
    MP.msm_batched_fused.clear_cache()
    yield
    MP.msm_batched_fused.clear_cache()


def test_signed_digits_reconstruct():
    rng = random.Random(3)
    scalars = [rng.randrange(bn254.R) for _ in range(33)] + [0, 1, bn254.R - 1]
    d = np.asarray(MP.signed_digits(np.asarray(ints_to_limbs(scalars))))
    assert d.min() >= -8 and d.max() <= 8
    for s, row in zip(scalars, d):
        assert sum(int(v) << (4 * w) for w, v in enumerate(row)) == s


def _oracle_msm(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = bn254.g1_add(acc, bn254.g1_mul(p, s))
    return acc


@pytest.mark.parametrize("B,n", [(2, 3), (3, 8)])
def test_msm_batched_fused_bit_exact(small_tier, B, n):
    rng = random.Random(100 * B + n)
    pts = [
        [
            None
            if (b + i) % 5 == 4
            else bn254.g1_mul(bn254.G1_GEN, rng.randrange(1, 1 << 96))
            for i in range(n)
        ]
        for b in range(B)
    ]
    scalars = [[rng.randrange(1 << 32) for _ in range(n)] for _ in range(B)]
    # include zero and one scalars
    scalars[0][0] = 0
    if n > 1:
        scalars[-1][-1] = 1

    g1 = C.g1_from_affine_ints([p for row in pts for p in row])
    g1 = C.G1(
        g1.x.reshape(B, n, 16), g1.y.reshape(B, n, 16), g1.z.reshape(B, n, 16)
    )
    scal = np.stack([ints_to_limbs(row) for row in scalars])
    out = MP.msm_batched_fused(g1, scal, NWIN)
    got = C.g1_to_affine_ints(out)
    want = [_oracle_msm(pr, sr) for pr, sr in zip(pts, scalars)]
    assert list(got) == want
