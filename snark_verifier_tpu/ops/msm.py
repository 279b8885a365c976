"""Multi-scalar multiplication engines for TPU.

TPU-native re-design of the reference's Pippenger MSM
(/root/reference/snark-verifier/src/util/msm.rs:259-343).  Two regimes:

* `msm_batched` — many independent small MSMs (one per proof in a verify
  batch; n ~ 15..80 terms).  Uses in-graph 4-bit windowed tables: per batch
  element the cost is ``14n`` table adds + 64 windows x (4 doublings + a
  tree-sum of n gathered table entries).  This beats per-term double-and-add
  (~380 point ops/term) by ~5x and is fully vectorized over the proof batch.

* `msm_serial` — one large MSM (IPA decider / SRS-sized inputs), windowed
  signed-bucket Pippenger with bucket accumulation by sorted segmented
  reduction (sort digit keys, tree-combine equal-key runs, then the
  suffix-scan bucket aggregation).  All shapes static; `lax` control flow.

Scalars enter in **canonical** (non-Montgomery) limb form — the digit
decomposition reads plain bits.  Use `ops.field.from_mont` first if needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops.curve import G1
from snark_verifier_tpu.ops.limbs import LIMB_BITS, NLIMB

WINDOW = 4
NWINDOWS = (NLIMB * LIMB_BITS) // WINDOW  # 64 windows of 4 bits


def _digits(scalars_canon):
    """(..., NLIMB) canonical limbs -> (..., NWINDOWS) 4-bit digits, LSB first."""
    shifts = jnp.arange(0, LIMB_BITS, WINDOW, dtype=jnp.uint32)  # (4,)
    d = (scalars_canon[..., :, None] >> shifts) & ((1 << WINDOW) - 1)
    return d.reshape(*scalars_canon.shape[:-1], NWINDOWS)


def _build_tables(points: G1):
    """Table[k] = k * P for k in 0..15; shape (16,) + points.batch_shape.

    Built with a scan (body = one add) so the add graph is compiled once.
    """

    def step(prev, _):
        nxt = C.g1_add(prev, points)
        return nxt, tuple(nxt)

    _, rest = jax.lax.scan(step, points, None, length=(1 << WINDOW) - 2)
    ident = C.g1_identity(points.batch_shape)
    return G1(
        jnp.concatenate([ident.x[None], points.x[None], rest[0]]),
        jnp.concatenate([ident.y[None], points.y[None], rest[1]]),
        jnp.concatenate([ident.z[None], points.z[None], rest[2]]),
    )


def _double_n(p: G1, n: int) -> G1:
    """n successive doublings via scan (body = one double)."""

    def step(cur, _):
        return C.g1_double(cur), None

    out, _ = jax.lax.scan(step, p, None, length=n)
    return out


def msm_batched(points: G1, scalars_canon) -> G1:
    """Batched small MSM.

    points: G1 with batch shape (..., n); scalars_canon: (..., n, NLIMB)
    canonical limbs.  Returns G1 with batch shape (...,).

    On TPU (config.use_pallas()) this routes to the point-scan Pallas
    implementation (ops/msm_pallas.py: lane = proof, sequential grid over
    the n points with in-kernel table select + VMEM-resident accumulator,
    signed 4-bit windows); the XLA windowed-table path below is the
    bit-exact CPU reference.  Override with SVTPU_MSM_FUSED=0/1.  The fused
    path lays tables out per (point, proof-lane), so batches much smaller
    than a lane block would waste the padding — those fall back to XLA."""
    import os

    from snark_verifier_tpu import config

    batch = points.batch_shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    fused = os.environ.get("SVTPU_MSM_FUSED")
    use_fused = config.use_pallas() if fused is None else fused == "1"
    if use_fused and B >= 64:
        from snark_verifier_tpu.ops.msm_pallas import msm_batched_fused

        return msm_batched_fused(points, scalars_canon)
    return _msm_batched_xla(points, scalars_canon)


@jax.jit
def _msm_batched_xla(points: G1, scalars_canon) -> G1:
    table = _build_tables(points)  # (16, ..., n)
    digits = _digits(scalars_canon)  # (..., n, 64)
    digits_t = jnp.moveaxis(digits, -1, 0)[::-1]  # (64, ..., n) MSB-first

    def window_step(acc: G1, dig):
        acc = _double_n(acc, WINDOW)
        # gather T[dig_i] for each term i
        idx = dig[None, ..., None].astype(jnp.int32)  # (1, ..., n, 1)
        picked = G1(
            jnp.take_along_axis(table.x, idx, axis=0)[0],
            jnp.take_along_axis(table.y, idx, axis=0)[0],
            jnp.take_along_axis(table.z, idx, axis=0)[0],
        )
        contrib = C.g1_tree_sum(picked, axis=len(picked.batch_shape) - 1)
        return C.g1_add(acc, contrib), None

    batch_shape = points.batch_shape[:-1]
    acc0 = C.g1_identity(batch_shape)
    acc, _ = jax.lax.scan(window_step, acc0, digits_t)
    return acc


@jax.jit
def scalar_mul(point: G1, scalar_canon) -> G1:
    """Single-table windowed scalar multiplication (batched over leading dims)."""
    p = G1(point.x[..., None, :], point.y[..., None, :], point.z[..., None, :])
    s = scalar_canon[..., None, :]
    return msm_batched(p, s)


# ---------------------------------------------------------------------------
# Large-N Pippenger (single MSM) — sort + segmented-scan bucket accumulation.
# ---------------------------------------------------------------------------


def _signed_window_digits(scalars_canon, window: int, nwin: int):
    """(n, 16) canonical limbs -> (n, nwin) int32 signed w-bit digits in
    [-(2^(w-1) - 1), 2^(w-1)], LSB-first balanced redecomposition (same
    scheme as msm_pallas.signed_digits at w=4).  Halves the bucket count:
    |digit| <= 2^(w-1), with the sign applied as a point negation.  The top
    window of a 254-bit scalar always absorbs the final borrow."""
    raw = _window_digits(scalars_canon, window, nwin, 1 << window)
    raw_t = raw.T.astype(jnp.int32)  # (nwin, n) LSB-first

    def step(carry, v):
        t = v + carry
        hi = (t > (1 << (window - 1))).astype(jnp.int32)
        return hi, t - (hi << window)

    _, d = jax.lax.scan(step, jnp.zeros(raw_t.shape[1:], jnp.int32), raw_t)
    return d.T


@functools.partial(jax.jit, static_argnums=(2, 3))
def msm_serial(points: G1, scalars_canon, window: int = 8, signed: bool = False) -> G1:
    """One large MSM over N points: window-parallel Pippenger with a
    segmented pairwise TREE reduction for the bucket accumulation
    (semantics of util/msm.rs:259-343; layout re-designed for the VPU).

    All ceil(256/w) windows are one leading batch axis, so the whole MSM is
    ~log2(N) wide vector steps instead of nwin sequential window passes:
      1. per-window w-bit digits, per-window argsort of the shared points,
      2. bucket sums by a pairwise tree reduce over the sorted digit runs —
         each level pairs adjacent elements, merges same-digit pairs, and
         flushes completed run sums into the bucket array (the flush
         targets are disjoint within a level, so a plain scatter works);
         total add work ~2N per window vs N*log2(N) for the previous
         Hillis-Steele prefix scan,
      3. per-window weighted bucket aggregation (suffix scan over buckets),
      4. Horner combine across windows (w doublings + 1 add per window).

    Working set is ~(nwin, n) points; for N where that exceeds HBM use
    `msm_serial_chunked` (same math, windows processed in chunks).
    """
    n_orig = points.x.shape[0]
    nwin = (NLIMB * LIMB_BITS + window - 1) // window

    # pad N to a power of two with identity points / zero digits
    n = 1 << max(0, (n_orig - 1)).bit_length()
    if signed:
        nbuckets = (1 << (window - 1)) + 1
        sd = _signed_window_digits(scalars_canon, window, nwin)  # (n0, nwin)
        digits = jnp.abs(sd).astype(jnp.uint32)
        neg = jnp.zeros((nwin, n), jnp.bool_).at[:, :n_orig].set((sd < 0).T)
    else:
        nbuckets = 1 << window
        digits = _window_digits(scalars_canon, window, nwin, nbuckets)
        neg = None
    dig = jnp.zeros((nwin, n), jnp.uint32).at[:, :n_orig].set(digits.T)
    ident_n = C.g1_identity((n,))
    pts_pad = G1(
        ident_n.x.at[:n_orig].set(points.x),
        ident_n.y.at[:n_orig].set(points.y),
        ident_n.z.at[:n_orig].set(points.z),
    )

    totals = _totals_dispatch(pts_pad, dig, nbuckets, neg)  # (nwin,)
    return _horner_combine(totals, window)


def _use_tree_t() -> bool:
    """Transposed bit-reversed fold (round 5): default on TPU (where the
    per-call layout round-trip dominates), off on CPU (the XLA-layout path
    is the compact reference; `_bucket_totals_t` has dedicated CPU tests).
    Override with SVTPU_MSM_TREE=0/1."""
    import os

    from snark_verifier_tpu import config

    forced = os.environ.get("SVTPU_MSM_TREE")
    if forced is not None:
        return forced == "1"
    return config.use_pallas()


def _totals_dispatch(pts_pad: G1, dig, nbuckets: int, neg=None) -> G1:
    if _use_tree_t():
        return _bucket_totals_t(pts_pad, dig, nbuckets, neg)
    return _bucket_totals(pts_pad, dig, nbuckets, neg)


def _bucket_totals(pts_pad: G1, dig, nbuckets: int, neg=None) -> G1:
    """Steps 1-3 of the window-parallel Pippenger: per-window argsort,
    pairwise tree reduction of sorted digit runs into buckets, weighted
    suffix-scan aggregation.  dig: (nwin, n) -> per-window totals (nwin,).

    Flush placement is GATHER-based (round 4): XLA scatter on TPU
    serializes per update and the per-level flush scatters cost ~half the
    2^20 MSM wall time despite carrying <=255 real flushes per level.
    Because the digit runs are sorted and contiguous, a run of digit b can
    complete at most ONCE per level (only its last even-position element
    can face a different successor), so the flush position for bucket b is
    recoverable with an i32 cumsum of flush markers + a batched
    searchsorted + a 256-wide gather — no scatter anywhere."""
    nwin, n = dig.shape
    idx_bits = max(1, (n - 1).bit_length())
    dig_bits = max(1, int(nbuckets - 1).bit_length())
    # INVARIANT (flush_into depends on it): `seg` stays sorted per row for
    # the whole tree reduction, so each level holds at most ONE completed
    # run per digit and the cumsum-difference position encoding in
    # flush_into picks a unique gather index.  Any future reordering of the
    # sort/pairing scheme that breaks per-row sortedness silently corrupts
    # the flush (two completed runs of one digit would alias).
    if idx_bits + dig_bits <= 32:
        # single-operand sort of (digit << idx_bits | index) packed keys —
        # measurably cheaper than argsort's key/value pair sort (round 4)
        iota = jnp.arange(n, dtype=jnp.uint32)[None, :]
        sk = jax.lax.sort((dig << idx_bits) | iota, dimension=1)
        order = (sk & ((1 << idx_bits) - 1)).astype(jnp.int32)
        seg = (sk >> idx_bits).astype(jnp.int32)
    else:
        order = jnp.argsort(dig, axis=1)  # (nwin, n)
        seg = jnp.take_along_axis(dig, order, axis=1).astype(jnp.int32)
    cur = G1(pts_pad.x[order], pts_pad.y[order], pts_pad.z[order])
    if neg is not None:  # signed windows: digit sign folds into the point
        neg_sorted = jnp.take_along_axis(neg, order, axis=1)
        cur = G1(cur.x, F.select(neg_sorted, F.neg(cur.y, C.FQ), cur.y), cur.z)
    ident_cur = C.g1_identity((nwin, n))
    cur = C.g1_select(seg == 0, ident_cur, cur)

    buckets = C.g1_identity((nwin, nbuckets))
    bvals = jnp.arange(nbuckets, dtype=jnp.int32)

    def flush_into(buckets, flush: G1, seg_e, valid):
        """buckets[w, b] += flush[w, j] for the unique valid j with
        seg_e[w, j] == b (if any).  seg_e is non-decreasing per row."""
        m = seg_e.shape[1]
        # position index: S[w, j] = sum_{i<=j} valid * (i+1), u32 — the
        # prefix may wrap for huge n, but the [lo, hi) difference holds at
        # most ONE marker (< 2^31), so the wrapped difference is exact
        s = jnp.cumsum(
            jnp.where(valid, jnp.arange(1, m + 1, dtype=jnp.uint32), jnp.uint32(0)),
            axis=1,
        )
        s = jnp.concatenate([jnp.zeros((nwin, 1), jnp.uint32), s], axis=1)
        # run bounds of digit b among the seg_e row (batched searchsorted)
        lo = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(seg_e)
        hi = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="right"))(seg_e)
        pos1 = jnp.take_along_axis(s, hi, axis=1) - jnp.take_along_axis(s, lo, axis=1)
        present = pos1 > 0  # (nwin, nbuckets)
        pos = jnp.maximum(pos1.astype(jnp.int32) - 1, 0)
        picked = G1(
            jnp.take_along_axis(flush.x, pos[..., None], axis=1),
            jnp.take_along_axis(flush.y, pos[..., None], axis=1),
            jnp.take_along_axis(flush.z, pos[..., None], axis=1),
        )
        # present ? buckets + picked : buckets, fused
        return C.g1_add_select(present, buckets, picked)

    m = n
    while m > 1:
        # even/odd via reshape + unit-stride index: stride-2 middle-axis
        # slices (x[:, 0::2]) are slow strided memory ops on TPU
        def _eo(a):
            r = a.reshape(nwin, m // 2, 2, *a.shape[2:])
            return r[:, :, 0], r[:, :, 1]

        ex, ox_ = _eo(cur.x)
        ey, oy_ = _eo(cur.y)
        ez, oz_ = _eo(cur.z)
        even = G1(ex, ey, ez)
        odd = G1(ox_, oy_, oz_)
        seg_e, seg_o = _eo(seg)
        same = seg_e == seg_o
        # same ? odd+even : odd, fused (complete add is symmetric in p, q)
        cur = C.g1_add_select(same, odd, even)
        # a pair crossing a run boundary completes seg_e's run: flush it
        buckets = flush_into(buckets, even, seg_e, ~same)
        seg = seg_o
        m //= 2

    # the last surviving run per row
    buckets = flush_into(buckets, cur, seg, jnp.ones_like(seg, jnp.bool_))

    # pad bucket count to a power of two with identities for the scan
    npad = 1 << max(1, (nbuckets - 1).bit_length())
    if npad != nbuckets:
        ident_ext = C.g1_identity((nwin, npad - nbuckets))
        buckets = G1(
            jnp.concatenate([buckets.x, ident_ext.x], axis=1),
            jnp.concatenate([buckets.y, ident_ext.y], axis=1),
            jnp.concatenate([buckets.z, ident_ext.z], axis=1),
        )

    # weighted bucket aggregation: sum_b b*S_b = sum_{b>=1} suffix_b
    suffix = _g1_suffix_scan(
        G1(
            jnp.moveaxis(buckets.x, 1, 0),
            jnp.moveaxis(buckets.y, 1, 0),
            jnp.moveaxis(buckets.z, 1, 0),
        )
    )  # (nbuckets, nwin, 16)
    return C.g1_tree_sum(G1(suffix.x[1:], suffix.y[1:], suffix.z[1:]))  # (nwin,)


def _horner_combine(totals: G1, window: int) -> G1:
    """acc = sum_w 2^(w*window) * totals_w, MSB-first (w dbl + 1 add each).

    On TPU this is ONE pallas kernel with a sequential window grid (the
    ~nwin*(window+1) lane-width-1 point ops of the scan below are pure
    dispatch latency through the axon runtime); the scan is the bit-exact
    CPU reference path."""
    from snark_verifier_tpu import config

    if config.use_pallas():
        from snark_verifier_tpu.ops.curve_pallas import horner_combine_pallas

        return horner_combine_pallas(totals, window)
    nwin = totals.x.shape[0]

    def horner(acc: G1, w):
        acc = _double_n(acc, window)
        t = G1(totals.x[w], totals.y[w], totals.z[w])
        return C.g1_add(acc, t), None

    acc0 = C.g1_identity(())
    acc, _ = jax.lax.scan(horner, acc0, jnp.arange(nwin - 1, -1, -1))
    return acc


# ---------------------------------------------------------------------------
# Transposed bit-reversed tree fold (round 5).
#
# The round-4 `_bucket_totals` pays a (batch, 16) <-> (16, lanes) layout
# round-trip inside EVERY per-level `g1_add_select` call (the Pallas wrapper
# transposes and pads 9 coordinate slabs per call) plus a strided even/odd
# reshape; at the >= 2^20-lane levels those copies rival the fold kernel
# itself.  This path instead:
#
#   * keeps the whole working set in kernel-native (16, lanes) slabs — the
#     one transpose happens at the chunk boundary;
#   * stores the sorted runs in BIT-REVERSED order, so every tree level
#     pairs element s with element s + m/2: the even/odd deinterleave
#     becomes two contiguous half-slices (natural-adjacent pairing on a
#     bit-reversed array IS stride-(m/2) pairing — the FFT butterfly trick);
#   * defers the per-level bucket-flush ADDS: each level contributes an
#     identity-masked (nwin, nbuckets) candidate layer (pure selects), and
#     ONE pairwise tree over the ~log2(n)+1 layers replaces the per-level
#     small-lane flush adds (a bucket receives one PARTIAL run sum per level
#     it completes at — a run split across pair boundaries flushes more than
#     once, so the layers must be ADDED, not selected);
#   * finds flush POSITIONS with ONE level-0 searchsorted per chunk: the
#     run of bucket b occupies [lo_b >> l, hi_b >> l) in level-l natural
#     coordinates (the level-(l+1) element j survives pair (2j, 2j+1) and
#     keeps the bucket of natural element 2j+1, so run bounds halve
#     EXACTLY), a level flushes b iff its run is nonempty with an
#     even-positioned last element, and the flushed partial sum is that
#     element — natural pair index (hi-1)>>1, bit-reversed into storage.
#     This replaces the round-4 per-level cumsum + batched-searchsorted
#     machinery (~25 ms per big level on-chip) with two shifts and a
#     compare per level.
# ---------------------------------------------------------------------------


def _bitrev_vals(idx, bits: int):
    """Elementwise bit-reverse of int32 indices in `bits` bits."""
    r = jnp.zeros_like(idx)
    for b in range(bits):
        r = r | (((idx >> b) & 1) << (bits - 1 - b))
    return r


def _tier_pad(L: int) -> int:
    """Lane padding for raw transposed kernel calls: the fixed Mosaic tier
    on TPU (one compile per tier), plain LANES alignment in interpret."""
    from snark_verifier_tpu.ops import field_pallas as FP

    if FP.interpret():
        return L
    return FP._padded_total(L)


def _bucket_totals_t(pts_pad: G1, dig, nbuckets: int, neg=None) -> G1:
    """Same contract as `_bucket_totals` (dig (nwin, n) -> per-window totals
    (nwin,)), transposed bit-reversed implementation.  `neg` (nwin, n) bool
    marks signed-window digits whose point enters negated."""
    return _buckets_aggregate(_bucket_runs_t(pts_pad, dig, nbuckets, neg))


def _buckets_aggregate(buckets: G1) -> G1:
    """(nwin, npad) bucket sums -> weighted per-window totals (nwin,) via
    the Blelloch suffix scan.  Split from the run reduction so the chunked
    MSM pays the scan's ~2*log2(npad) sequential small-lane stages ONCE per
    MSM instead of once per window chunk."""
    nwin, npad = buckets.batch_shape
    suffix = _g1_suffix_scan(
        G1(
            jnp.moveaxis(buckets.x, 1, 0),
            jnp.moveaxis(buckets.y, 1, 0),
            jnp.moveaxis(buckets.z, 1, 0),
        )
    )
    return C.g1_tree_sum(G1(suffix.x[1:], suffix.y[1:], suffix.z[1:]))  # (nwin,)


def _bucket_runs_t(pts_pad: G1, dig, nbuckets: int, neg=None) -> G1:
    """Tree-reduce the sorted digit runs into per-window bucket sums
    (nwin, npad) with npad = nbuckets rounded up to a power of two
    (identity-padded)."""
    from snark_verifier_tpu.ops import field_pallas as FP
    from snark_verifier_tpu.ops.curve_pallas import g1_add_select_t
    from snark_verifier_tpu.ops.limbs import int_to_limbs

    nwin, n = dig.shape
    idx_bits = max(1, (n - 1).bit_length())
    dig_bits = max(1, int(nbuckets - 1).bit_length())
    # INVARIANT: the digit runs are sorted and contiguous, so the level-l
    # run bounds are exactly [lo0 >> l, hi0 >> l) and each level flushes at
    # most one partial sum per bucket (the run's even-positioned last
    # element).  Any reordering that breaks per-row sortedness silently
    # corrupts the flush.
    if idx_bits + dig_bits <= 32:
        iota = jnp.arange(n, dtype=jnp.uint32)[None, :]
        sk = jax.lax.sort((dig << idx_bits) | iota, dimension=1)
        order = (sk & ((1 << idx_bits) - 1)).astype(jnp.int32)
        seg = (sk >> idx_bits).astype(jnp.int32)
    else:
        order = jnp.argsort(dig, axis=1)
        seg = jnp.take_along_axis(dig, order, axis=1).astype(jnp.int32)

    bits = max(1, (n - 1).bit_length())
    assert n == 1 << bits or n == 1, "caller pads n to a power of two"
    rev_n = _bitrev_vals(jnp.arange(n, dtype=jnp.int32), bits)
    gidx = jnp.take(order, rev_n, axis=1)  # (nwin, n) stored gather
    seg_st = jnp.take(seg, rev_n, axis=1)

    one16 = jnp.asarray(int_to_limbs(C.FQ.r_mod))  # Montgomery 1

    def slab(c):  # gather in (batch, 16) major order, transpose once
        return jnp.transpose(c[gidx], (2, 0, 1))  # (16, nwin, n)

    sx, sz = slab(pts_pad.x), slab(pts_pad.z)
    if neg is None:
        sy = slab(pts_pad.y)
    else:  # signed windows: digit sign folds into the gathered point
        ng = pts_pad.y[gidx]  # (nwin, n, 16)
        neg_st = jnp.take_along_axis(neg, gidx, axis=1)
        sy = jnp.transpose(F.select(neg_st, F.neg(ng, C.FQ), ng), (2, 0, 1))
    zmask = (seg_st == 0)[None]
    sx = jnp.where(zmask, 0, sx)
    sy = jnp.where(zmask, one16[:, None, None], sy)
    sz = jnp.where(zmask, 0, sz)

    bvals = jnp.arange(nbuckets, dtype=jnp.int32)
    layers = []  # per-level identity-masked flush candidates

    # level-0 run bounds per bucket: one searchsorted with integer queries
    # 0..nbuckets gives lo_b = hi_{b-1} in a single pass
    qb = jnp.arange(nbuckets + 1, dtype=jnp.int32)
    bounds = jax.vmap(lambda row: jnp.searchsorted(row, qb, side="left"))(seg)
    lo0, hi0 = bounds[:, :-1], bounds[:, 1:]  # (nwin, nbuckets)

    import os as _os

    ablate = _os.environ.get("SVTPU_MSM_ABLATE", "")  # timing-only debug:
    # "noflush" skips the per-level candidate layers, "nofold" skips the
    # per-level add kernel — both produce WRONG results; bench/probe use only

    m = n
    lv = 0
    while m > 1:
        half = m // 2
        lo_sl = (sx[:, :, :half], sy[:, :, :half], sz[:, :, :half])
        hi_sl = (sx[:, :, half:], sy[:, :, half:], sz[:, :, half:])
        same_st = seg_st[:, :half] == seg_st[:, half:]

        L = nwin * half
        Lp = _tier_pad(L)

        def flat(t):
            f = [c.reshape(NLIMB, L) for c in t]
            if Lp != L:
                f = [jnp.pad(c, ((0, 0), (0, Lp - L))) for c in f]
            return tuple(f)

        mflat = same_st.astype(jnp.uint32).reshape(1, L)
        if Lp != L:
            mflat = jnp.pad(mflat, ((0, 0), (0, Lp - L)))
        # merged = same ? hi + lo : hi  (hi survives: next level's runs)
        if ablate == "nofold":
            nsx, nsy, nsz = hi_sl
        else:
            ox, oy, oz = g1_add_select_t(mflat, flat(hi_sl), flat(lo_sl))
            nsx, nsy, nsz = (
                o[:, :L].reshape(NLIMB, nwin, half) for o in (ox, oy, oz)
            )

        # bucket b's run at this level is [lo0 >> lv, hi0 >> lv); it flushes
        # a partial sum iff nonempty with an even-positioned last element,
        # sitting in the (pre-merge) LO half at the bit-reversed pair index
        if ablate != "noflush":
            lo_l, hi_l = lo0 >> lv, hi0 >> lv
            present = jnp.logical_and(lo_l < hi_l, ((hi_l - 1) & 1) == 0)
            t_nat = jnp.maximum(hi_l - 1, 0) >> 1
            hb = max(0, (half - 1).bit_length()) if half > 1 else 0
            pos_st = _bitrev_vals(t_nat, hb) if hb else t_nat
            idx = jnp.broadcast_to(pos_st[None], (NLIMB, nwin, nbuckets))
            px = jnp.take_along_axis(lo_sl[0], idx, axis=2)
            py = jnp.take_along_axis(lo_sl[1], idx, axis=2)
            pz = jnp.take_along_axis(lo_sl[2], idx, axis=2)
            pm = present[None]
            layers.append((
                jnp.where(pm, px, 0),
                jnp.where(pm, py, one16[:, None, None]),
                jnp.where(pm, pz, 0),
            ))

        sx, sy, sz = nsx, nsy, nsz
        seg_st = seg_st[:, half:]
        m = half
        lv += 1

    # the last surviving run per row (the maximal digit present) is one
    # more candidate layer
    lastm = jnp.broadcast_to(
        (bvals[None, :] == seg[:, -1:])[None], (1, nwin, nbuckets)
    )
    layers.append((
        jnp.where(lastm, sx, 0),
        jnp.where(lastm, sy, one16[:, None, None]),
        jnp.where(lastm, sz, 0),
    ))

    # fold the layers with a pairwise tree of full-width adds (a bucket can
    # receive one partial sum from SEVERAL levels when its run straddles
    # pair boundaries)
    bx, by, bz = _layer_tree_fold(layers, nwin, nbuckets, one16)

    # pad buckets to a power of two with identities (signed windows have
    # 2^(w-1)+1 buckets); identity high buckets add nothing to the suffixes
    npad = 1 << max(1, (nbuckets - 1).bit_length())
    if npad != nbuckets:
        ext = ((0, 0), (0, 0), (0, npad - nbuckets))
        bx = jnp.pad(bx, ext)
        by = jnp.concatenate(
            [by, jnp.broadcast_to(one16[:, None, None], (NLIMB, nwin, npad - nbuckets))],
            axis=2,
        )
        bz = jnp.pad(bz, ext)

    return G1(
        jnp.transpose(bx, (1, 2, 0)),
        jnp.transpose(by, (1, 2, 0)),
        jnp.transpose(bz, (1, 2, 0)),
    )  # (nwin, npad, 16)


def _layer_tree_fold(layers, nwin: int, nbuckets: int, one16):
    """Pairwise-add a list of identity-masked (16, nwin, nbuckets) coordinate
    triples down to one, with every add running at layers*nwin*nbuckets
    lanes (one fused kernel call per round instead of per-level small-lane
    flush adds)."""
    from snark_verifier_tpu.ops.curve_pallas import g1_add_select_t

    while len(layers) > 1:
        odd = layers.pop() if len(layers) % 2 else None
        half = len(layers) // 2
        lo, hi = layers[:half], layers[half:]
        L = half * nwin * nbuckets
        Lp = _tier_pad(((L + 511) // 512) * 512)

        def cat(ts, c):
            f = jnp.stack([t[c] for t in ts], axis=1).reshape(NLIMB, L)
            return jnp.pad(f, ((0, 0), (0, Lp - L))) if Lp != L else f

        p = (cat(lo, 0), cat(lo, 1), cat(lo, 2))
        q = (cat(hi, 0), cat(hi, 1), cat(hi, 2))
        mask = jnp.ones((1, Lp), jnp.uint32)
        ox, oy, oz = g1_add_select_t(mask, p, q)
        merged = [
            tuple(
                o[:, i * nwin * nbuckets : (i + 1) * nwin * nbuckets].reshape(
                    NLIMB, nwin, nbuckets
                )
                for o in (ox, oy, oz)
            )
            for i in range(half)
        ]
        layers = merged + ([odd] if odd is not None else [])
    return layers[0]


@functools.partial(jax.jit, static_argnums=(2,))
def _chunk_totals(pts_pad: G1, dig, nbuckets: int, neg=None) -> G1:
    return _totals_dispatch(pts_pad, dig, nbuckets, neg)


@functools.partial(jax.jit, static_argnums=(2,))
def _chunk_runs(pts_pad: G1, dig, nbuckets: int, neg=None) -> G1:
    return _bucket_runs_t(pts_pad, dig, nbuckets, neg)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _msm_prologue(points: G1, scalars_canon, window: int, signed: bool,
                  n: int, nwin: int):
    """Digits + padded points in ONE dispatch.  Every eager op outside jit
    pays the ~25 ms axon tunnel floor regardless of size (CLAUDE.md); the
    round-5 chunked-MSM driver spent ~1.2 s of its 3.9 s wall in ~50 such
    dispatches before this was hoisted."""
    n_orig = points.x.shape[0]
    if signed:
        sd = _signed_window_digits(scalars_canon, window, nwin)
        digits = jnp.abs(sd).astype(jnp.uint32)
        negs = jnp.zeros((nwin, n), jnp.bool_).at[:, :n_orig].set((sd < 0).T)
    else:
        digits = _window_digits(scalars_canon, window, nwin, 1 << window)
        negs = None
    dig = jnp.zeros((nwin, n), jnp.uint32).at[:, :n_orig].set(digits.T)
    ident_n = C.g1_identity((n,))
    pts_pad = G1(
        ident_n.x.at[:n_orig].set(points.x),
        ident_n.y.at[:n_orig].set(points.y),
        ident_n.z.at[:n_orig].set(points.z),
    )
    return pts_pad, dig, negs


@functools.partial(jax.jit, static_argnums=(2, 4))
def _chunk_runs_at(pts_pad: G1, dig_all, nbuckets: int, lo, win_chunk: int,
                   neg_all=None) -> G1:
    """One window chunk, sliced INSIDE the jit at a traced offset so all
    chunks share one compiled program and one dispatch each."""
    dchunk = jax.lax.dynamic_slice_in_dim(dig_all, lo, win_chunk, axis=0)
    nchunk = (
        jax.lax.dynamic_slice_in_dim(neg_all, lo, win_chunk, axis=0)
        if neg_all is not None
        else None
    )
    return _bucket_runs_t(pts_pad, dchunk, nbuckets, nchunk)


@functools.partial(jax.jit, static_argnums=(1,))
def _aggregate_horner_jit(parts, window: int) -> G1:
    """parts: list of per-chunk bucket G1s (concatenated in-graph)."""
    buckets = G1(
        jnp.concatenate([p.x for p in parts]),
        jnp.concatenate([p.y for p in parts]),
        jnp.concatenate([p.z for p in parts]),
    )
    return _horner_combine(_buckets_aggregate(buckets), window)


@functools.partial(jax.jit, static_argnums=(1,))
def _horner_jit(totals: G1, window: int) -> G1:
    return _horner_combine(totals, window)


def msm_serial_chunked(points: G1, scalars_canon, window: int = 8,
                       win_chunk: int = 8, signed: bool = False) -> G1:
    """Memory-bounded large-N Pippenger: identical math to `msm_serial`, but
    the ceil(256/w) windows are processed `win_chunk` at a time, so the
    working set is ~(win_chunk, n) points instead of (nwin, n) — at n = 2^20
    and w = 8 that is ~1.6 GB instead of ~6.4 GB (before XLA slack).  The
    per-chunk computation compiles ONCE (same shapes every chunk when
    win_chunk divides nwin); totals are concatenated and Horner-combined."""
    n_orig = points.x.shape[0]
    nwin = (NLIMB * LIMB_BITS + window - 1) // window
    assert nwin % win_chunk == 0, "win_chunk must divide the window count"

    n = 1 << max(0, (n_orig - 1)).bit_length()
    nbuckets = ((1 << (window - 1)) + 1) if signed else (1 << window)
    tree_t = _use_tree_t()
    if tree_t:
        # fully-jitted pipeline: 1 prologue + 1 dispatch per chunk + 1
        # aggregate (eager ops each cost the ~25 ms tunnel floor)
        pts_pad, dig_all, neg_all = _msm_prologue(
            points, scalars_canon, window, signed, n, nwin
        )
        parts = [
            _chunk_runs_at(pts_pad, dig_all, nbuckets, lo, win_chunk, neg_all)
            for lo in range(0, nwin, win_chunk)
        ]
        return _aggregate_horner_jit(parts, window)

    if signed:
        sd = _signed_window_digits(scalars_canon, window, nwin)  # (n0, nwin)
        digits = jnp.abs(sd).astype(jnp.uint32)
        negs = (sd < 0).T  # (nwin, n0)
    else:
        digits = _window_digits(scalars_canon, window, nwin, nbuckets)
        negs = None
    ident_n = C.g1_identity((n,))
    pts_pad = G1(
        ident_n.x.at[:n_orig].set(points.x),
        ident_n.y.at[:n_orig].set(points.y),
        ident_n.z.at[:n_orig].set(points.z),
    )
    parts = []
    for lo in range(0, nwin, win_chunk):
        dchunk = (
            jnp.zeros((win_chunk, n), jnp.uint32)
            .at[:, :n_orig]
            .set(digits.T[lo : lo + win_chunk])
        )
        nchunk = None
        if negs is not None:
            nchunk = (
                jnp.zeros((win_chunk, n), jnp.bool_)
                .at[:, :n_orig]
                .set(negs[lo : lo + win_chunk])
            )
        parts.append(_chunk_totals(pts_pad, dchunk, nbuckets, nchunk))
    merged = G1(
        jnp.concatenate([p.x for p in parts]),
        jnp.concatenate([p.y for p in parts]),
        jnp.concatenate([p.z for p in parts]),
    )
    return _horner_jit(merged, window)


def _window_digits(scalars_canon, window, nwin, nbuckets):
    """(n, NLIMB) canonical limbs -> (n, nwin) w-bit digits (LSB-first)."""
    bit_idx = np.arange(nwin) * window
    limb_idx = bit_idx // LIMB_BITS
    shift = bit_idx % LIMB_BITS
    lo = (scalars_canon[:, limb_idx] >> jnp.asarray(shift, jnp.uint32)) & (nbuckets - 1)
    carry_bits = LIMB_BITS - shift
    hi_idx = np.minimum(limb_idx + 1, NLIMB - 1)
    hi = jnp.where(
        jnp.asarray(carry_bits < window) & jnp.asarray(hi_idx > limb_idx),
        (scalars_canon[:, hi_idx] << jnp.asarray(carry_bits % LIMB_BITS, jnp.uint32))
        & (nbuckets - 1),
        0,
    )
    return (lo | hi).astype(jnp.uint32)


def _g1_suffix_scan(buckets: G1) -> G1:
    """Suffix sums S'_b = sum_{c >= b} S_c.

    Work-efficient Blelloch scan on the reversed axis: ~3n adds total
    (up-sweep n-1, down-sweep n-1, inclusive combine n) instead of the
    previous Hillis-Steele fold's n*log2(n) — at window >= 12 the bucket
    aggregation otherwise rivals the run-reduction itself."""
    n = buckets.x.shape[0]
    assert n & (n - 1) == 0, "bucket count is a power of two"

    def rev(p: G1) -> G1:
        return G1(p.x[::-1], p.y[::-1], p.z[::-1])

    def blocks(p: G1, m: int):
        def r(a):
            return a.reshape((n // m, m) + a.shape[1:])

        return G1(r(p.x), r(p.y), r(p.z))

    def unblocks(p: G1):
        def r(a):
            return a.reshape((n,) + a.shape[2:])

        return G1(r(p.x), r(p.y), r(p.z))

    def col(p: G1, j: int):
        return G1(p.x[:, j], p.y[:, j], p.z[:, j])

    def set_col(p: G1, j: int, v: G1):
        def s(a, b):
            return jnp.concatenate([a[:, :j], b[:, None], a[:, j + 1 :]], axis=1)

        return G1(s(p.x, v.x), s(p.y, v.y), s(p.z, v.z))

    orig = rev(buckets)
    x = orig
    logn = n.bit_length() - 1
    # up-sweep (reduce)
    for d in range(logn):
        m = 2 << d
        b = blocks(x, m)
        s = C.g1_add(col(b, m // 2 - 1), col(b, m - 1))
        x = unblocks(set_col(b, m - 1, s))
    # root <- identity, down-sweep
    ident1 = C.g1_identity((1,) + buckets.batch_shape[1:])
    x = G1(
        jnp.concatenate([x.x[: n - 1], ident1.x], axis=0),
        jnp.concatenate([x.y[: n - 1], ident1.y], axis=0),
        jnp.concatenate([x.z[: n - 1], ident1.z], axis=0),
    )
    for d in range(logn - 1, -1, -1):
        m = 2 << d
        b = blocks(x, m)
        left = col(b, m // 2 - 1)
        right = col(b, m - 1)
        b = set_col(b, m // 2 - 1, right)
        b = set_col(b, m - 1, C.g1_add(left, right))
        x = unblocks(b)
    # x is the exclusive prefix of the reversed array; inclusive = + orig
    incl = C.g1_add(x, orig)
    return rev(incl)
