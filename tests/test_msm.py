"""MSM engines vs the oracle's naive MSM (util/msm.rs semantics)."""

import random

import numpy as np
import jax.numpy as jnp

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops import msm as M
from snark_verifier_tpu.ops.limbs import ints_to_limbs
from snark_verifier_tpu.util import bn254 as bn

rng = random.Random(3)


def rand_case(n, with_edge=True):
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    scalars = [rng.randrange(bn.R) for _ in range(n)]
    if with_edge and n >= 3:
        scalars[0] = 0
        scalars[1] = 1
        pts[2] = None  # identity base
    return pts, scalars


def test_msm_batched():
    B, n = 2, 5
    cases = [rand_case(n) for _ in range(B)]
    pts = C.g1_from_affine_ints([p for c in cases for p in c[0]])
    pts = C.G1(*(v.reshape(B, n, -1) for v in pts))
    scal = np.stack([ints_to_limbs(c[1]) for c in cases])  # (B, n, 16)
    out = M.msm_batched(pts, jnp.asarray(scal))
    got = C.g1_to_affine_ints(out)
    exp = [bn.g1_msm(c[1], c[0]) for c in cases]
    assert got == exp


def test_scalar_mul():
    pt = bn.g1_mul(bn.G1_GEN, 987654321)
    ks = [0, 1, 2, bn.R - 1, rng.randrange(bn.R)]
    p = C.g1_from_affine_ints([pt] * len(ks))
    s = jnp.asarray(ints_to_limbs(ks))
    got = C.g1_to_affine_ints(M.scalar_mul(p, s))
    exp = [bn.g1_mul(pt, k) for k in ks]
    assert got == exp


def test_msm_serial():
    n = 37
    pts, scalars = rand_case(n)
    p = C.g1_from_affine_ints(pts)
    s = jnp.asarray(ints_to_limbs(scalars))
    got = C.g1_to_affine_ints(M.msm_serial(p, s, 8))
    exp = bn.g1_msm(scalars, pts)
    assert got[0] == exp


def test_msm_serial_straddling_window():
    # window=5 straddles 16-bit limb boundaries — exercises digit extraction
    n = 9
    pts, scalars = rand_case(n, with_edge=False)
    p = C.g1_from_affine_ints(pts)
    s = jnp.asarray(ints_to_limbs(scalars))
    got = C.g1_to_affine_ints(M.msm_serial(p, s, 5))
    exp = bn.g1_msm(scalars, pts)
    assert got[0] == exp


def test_msm_serial_chunked_matches():
    """Window-chunked large-N path: bit-identical to msm_serial + oracle."""
    n = 21
    pts, scalars = rand_case(n)
    p = C.g1_from_affine_ints(pts)
    s = jnp.asarray(ints_to_limbs(scalars))
    got = C.g1_to_affine_ints(M.msm_serial_chunked(p, s, 8, win_chunk=8))
    exp = bn.g1_msm(scalars, pts)
    assert got[0] == exp
    # and a chunk width that forces 4 chunks
    got2 = C.g1_to_affine_ints(M.msm_serial_chunked(p, s, 8, win_chunk=4))
    assert got2[0] == exp


def test_msm_all_equal_scalars():
    """One giant digit run per window — the adversarial case for the
    gather-based flush (exactly one run completes per level, at the padded
    boundary) and for the packed single-key sort (maximal equal keys)."""
    n = 50
    pts = [bn.g1_mul(bn.G1_GEN, i + 3) for i in range(n)]
    scalars = [123456789] * n
    p = C.g1_from_affine_ints(pts)
    s = jnp.asarray(ints_to_limbs(scalars))
    got = C.g1_to_affine_ints(M.msm_serial(p, s, 8))
    exp = bn.g1_msm(scalars, pts)
    assert got[0] == exp


def test_msm_equal_points_collide():
    # duplicated points and duplicated scalars stress bucket segmentation
    pt = bn.g1_mul(bn.G1_GEN, 5)
    pts = [pt] * 6
    scalars = [7, 7, 7, 9, 9, bn.R - 1]
    p = C.g1_from_affine_ints(pts)
    s = jnp.asarray(ints_to_limbs(scalars))
    got = C.g1_to_affine_ints(M.msm_serial(p, s, 8))
    exp = bn.g1_msm(scalars, pts)
    assert got[0] == exp


def test_bucket_totals_transposed_matches(monkeypatch):
    """Round-5 transposed bit-reversed fold (`_bucket_totals_t`): per-window
    totals bit-identical to the XLA-layout reference fold, including runs
    that straddle pair boundaries (multi-level partial flushes) and the
    all-equal giant-run case."""
    n_orig, w = 13, 4
    pts, scalars = rand_case(n_orig)
    scalars[-3:] = [5, 5, 0]  # force split runs + zero digits
    nbuckets = 1 << w
    nwin = 64
    n = 16
    digits = M._window_digits(jnp.asarray(ints_to_limbs(scalars)), w, nwin, nbuckets)
    dig = jnp.zeros((nwin, n), jnp.uint32).at[:, :n_orig].set(digits.T)
    ident_n = C.g1_identity((n,))
    pb = C.g1_from_affine_ints(pts)
    pts_pad = C.G1(
        ident_n.x.at[:n_orig].set(pb.x),
        ident_n.y.at[:n_orig].set(pb.y),
        ident_n.z.at[:n_orig].set(pb.z),
    )
    t_old = C.g1_to_affine_ints(M._bucket_totals(pts_pad, dig, nbuckets))
    t_new = C.g1_to_affine_ints(M._bucket_totals_t(pts_pad, dig, nbuckets))
    assert t_old == t_new


def test_msm_serial_signed_windows(monkeypatch):
    """Signed w-bit windows (halved bucket count): oracle-exact through both
    fold implementations, incl. non-power-of-two bucket counts (2^(w-1)+1)
    and the negated-point path."""
    n = 21
    pts, scalars = rand_case(n)
    exp = bn.g1_msm(scalars, pts)
    p = C.g1_from_affine_ints(pts)
    s = jnp.asarray(ints_to_limbs(scalars))
    for tree in ("0", "1"):
        monkeypatch.setenv("SVTPU_MSM_TREE", tree)
        # the env is read at TRACE time: drop the cached trace so both
        # fold implementations really compile and run
        M.msm_serial.clear_cache()
        got = C.g1_to_affine_ints(M.msm_serial(p, s, 5, True))
        assert got[0] == exp, f"tree={tree}"
    monkeypatch.setenv("SVTPU_MSM_TREE", "1")
    M._chunk_runs.clear_cache()
    got = C.g1_to_affine_ints(M.msm_serial_chunked(p, s, 8, win_chunk=8, signed=True))
    assert got[0] == exp
