"""Fused Pallas MSM in point-scan layout: lane = proof, grid scans points.

Round-1/2 post-mortems:
* XLA windowed-table path (ops/msm.py): per-op dispatch + HBM round trips
  between the ~500 ops of each point add; 2.06 s for 1820x18-term MSMs.
* Lane = (proof, point-slot) merge-tree design (first fused attempt): the
  per-window binary tree pays npad = next_pow2(n) padded lanes AND a full
  lane-width complete add per tree round even though only 1/2^r lanes still
  carry live values — ~10.5M lane-adds for work that needs ~2.4M; measured
  2.17 s, no better than XLA.

This design assigns lane = proof and makes the POINT index a sequential
Pallas grid dimension: per window, grid step i selects T[|digit_i|] per lane
(9 vector selects), conditionally negates, and accumulates into the output
block, which stays VMEM-resident across the inner grid steps.  No merge
tree, no padding beyond B -> multiple of LANES, every complete add works on
fully-live lanes:

  lane-adds = nwindows * (n + horner) * Bpad   (~2.5M at B=1820, n=18)

Windows are signed 4-bit (digits in [-8, 8]): the table is 9 entries
(3 adds + 4 doublings to build vs 14 adds for unsigned 0..15); negation is
a lane select on y.  Horner (acc = 16*acc + window) runs as a separate
4-doublings+add kernel over the (ROWS, Bpad) accumulator.

Semantics mirror the reference Pippenger MSM
(/root/reference/snark-verifier/src/util/msm.rs:259-343); bit-exactness is
enforced against the python-int oracle in tests/test_msm_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snark_verifier_tpu.ops import field_pallas as FP
from snark_verifier_tpu.ops.curve_pallas import _add_core, _dbl_core, g1_add_t, g1_double_t
from snark_verifier_tpu.ops.field_pallas import TConsts, tconsts, tsub
from snark_verifier_tpu.ops.limbs import LIMB_BITS, NLIMB

WINDOW = 4
NWINDOWS = (NLIMB * LIMB_BITS) // WINDOW  # 64 signed 4-bit windows
NTAB = (1 << (WINDOW - 1)) + 1  # |digit| in 0..8 -> 9 table entries
ROWS = 3 * NLIMB  # one point = 48 sublanes (x | y | z)
import os as _os

# Lane width of the whole-MSM scan kernel.  1024 was ~8% faster in round 3,
# but with the round-4 packed-u32 carry fabric the 1024-lane block makes the
# TPU compiler ABORT (fatal `Check failed: limits[i] <= dim(i) (2 vs 1)` in
# the Mosaic custom-call lowering — the crash that zeroed BENCH_r04; the
# (8, 2, lanes) reshape intermediates of _pack/_unpack are the suspected
# trigger at >512 lanes).  512 compiles and runs; keep it until the
# compiler-side bug is gone (probe: SVTPU_MSM_SCAN_LANES=1024).
SCAN_LANES = int(_os.environ.get("SVTPU_MSM_SCAN_LANES", "512"))


def signed_digits(scalars_canon):
    """(..., 16) canonical limbs -> (..., 64) int32 digits in [-8, 8].

    LSB-first balanced redecomposition: t = v + carry; digits > 8 borrow
    from the next window.  The top window of a BN254 Fr scalar is <= 3, so
    the final carry is always absorbed.
    """
    shifts = jnp.arange(0, LIMB_BITS, WINDOW, dtype=jnp.uint32)
    v = ((scalars_canon[..., :, None] >> shifts) & ((1 << WINDOW) - 1)).astype(
        jnp.int32
    )
    v = v.reshape(*scalars_canon.shape[:-1], NWINDOWS)
    v_t = jnp.moveaxis(v, -1, 0)  # (64, ...)

    def step(carry, vw):
        t = vw + carry
        hi = (t > (1 << (WINDOW - 1))).astype(jnp.int32)
        return hi, t - (hi << WINDOW)

    _, d = jax.lax.scan(step, jnp.zeros(v_t.shape[1:], jnp.int32), v_t)
    return jnp.moveaxis(d, 0, -1)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _window_kernel_body(n, table_ref, dig_ref, mod_ref, npr_ref, out_ref):
    """One grid step (b_block, i): select T[|digit_i|] for every proof lane,
    negate where digit < 0, and fold into the accumulator block (= out_ref,
    VMEM-resident across the inner i steps)."""
    i = pl.program_id(1)
    mod, npr = mod_ref[:], npr_ref[:]
    dig = dig_ref[0, 0, :]  # (LANES,) int32
    ad = jnp.abs(dig)

    def tab(k, c):
        return table_ref[k * ROWS + c * NLIMB : k * ROWS + (c + 1) * NLIMB, :]

    px = jnp.zeros_like(tab(0, 0))
    py = jnp.zeros_like(px)
    pz = jnp.zeros_like(px)
    for k in range(NTAB):
        m = (ad == k)[None, :]
        px = jnp.where(m, tab(k, 0), px)
        py = jnp.where(m, tab(k, 1), py)
        pz = jnp.where(m, tab(k, 2), pz)

    # negate: -P = (x, p - y, z); identity rows (y = R mod p) stay valid
    # projective identities under scaling, so no special-casing.
    neg = (dig < 0)[None, :]
    py = jnp.where(neg, tsub(jnp.zeros_like(py), py, mod), py)

    @pl.when(i == 0)
    def _():
        out_ref[0:NLIMB, :] = px
        out_ref[NLIMB : 2 * NLIMB, :] = py
        out_ref[2 * NLIMB :, :] = pz

    @pl.when(i > 0)
    def _():
        x, y, z = _add_core(
            out_ref[0:NLIMB, :],
            out_ref[NLIMB : 2 * NLIMB, :],
            out_ref[2 * NLIMB :, :],
            px,
            py,
            pz,
            mod,
            npr,
        )
        out_ref[0:NLIMB, :] = x
        out_ref[NLIMB : 2 * NLIMB, :] = y
        out_ref[2 * NLIMB :, :] = z


def _scan_kernel_body(table_ref, dig_ref, mod_ref, npr_ref, out_ref):
    """Whole-MSM kernel: grid (b_block, window, point).  The accumulator
    block (out_ref, indexed by b only) stays VMEM-resident across every
    (window, point) step; each step selects T[|digit|], negates if needed,
    and folds it in; window boundaries prepend the 4 Horner doublings.
    One pallas_call per MSM instead of 2 per window (128 launches + HBM
    accumulator round-trips in the two-kernel version)."""
    w = pl.program_id(1)
    i = pl.program_id(2)
    mod, npr = mod_ref[:], npr_ref[:]
    dig = dig_ref[0, 0, :]
    ad = jnp.abs(dig)

    def tab(k, c):
        return table_ref[k * ROWS + c * NLIMB : k * ROWS + (c + 1) * NLIMB, :]

    px = jnp.zeros_like(tab(0, 0))
    py = jnp.zeros_like(px)
    pz = jnp.zeros_like(px)
    for k in range(NTAB):
        m = (ad == k)[None, :]
        px = jnp.where(m, tab(k, 0), px)
        py = jnp.where(m, tab(k, 1), py)
        pz = jnp.where(m, tab(k, 2), pz)
    neg = (dig < 0)[None, :]
    py = jnp.where(neg, tsub(jnp.zeros_like(py), py, mod), py)

    first = jnp.logical_and(w == 0, i == 0)

    @pl.when(jnp.logical_and(i == 0, w > 0))
    def _():  # Horner: acc <- 16 * acc at each new window
        x = out_ref[0:NLIMB, :]
        y = out_ref[NLIMB : 2 * NLIMB, :]
        z = out_ref[2 * NLIMB :, :]
        for _ in range(WINDOW):
            x, y, z = _dbl_core(x, y, z, mod, npr)
        out_ref[0:NLIMB, :] = x
        out_ref[NLIMB : 2 * NLIMB, :] = y
        out_ref[2 * NLIMB :, :] = z

    @pl.when(first)
    def _():
        out_ref[0:NLIMB, :] = px
        out_ref[NLIMB : 2 * NLIMB, :] = py
        out_ref[2 * NLIMB :, :] = pz

    @pl.when(jnp.logical_not(first))
    def _():
        x, y, z = _add_core(
            out_ref[0:NLIMB, :],
            out_ref[NLIMB : 2 * NLIMB, :],
            out_ref[2 * NLIMB :, :],
            px,
            py,
            pz,
            mod,
            npr,
        )
        out_ref[0:NLIMB, :] = x
        out_ref[NLIMB : 2 * NLIMB, :] = y
        out_ref[2 * NLIMB :, :] = z


def _scan_call(n, nw, table_slab, dig_flat, b_pad):
    """dig_flat: (nw * n, 1, b_pad) int32, window-major MSB-first."""
    from snark_verifier_tpu.ops import field as F

    tc = tconsts(F.FQ)
    lanes = min(SCAN_LANES, b_pad)
    b_blocks = b_pad // lanes
    return pl.pallas_call(
        _scan_kernel_body,
        out_shape=jax.ShapeDtypeStruct((ROWS, b_pad), jnp.uint32),
        grid=(b_blocks, nw, n),
        in_specs=[
            pl.BlockSpec(
                (NTAB * ROWS, lanes),
                lambda b, w, i: (0, i * b_blocks + b),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lanes),
                lambda b, w, i: (w * n + i, 0, b),
                memory_space=pltpu.VMEM,
            ),
        ]
        + TConsts.in_specs(),
        out_specs=pl.BlockSpec(
            (ROWS, lanes), lambda b, w, i: (0, b), memory_space=pltpu.VMEM
        ),
    )(table_slab, dig_flat, *tc.as_inputs())


def _horner_kernel_body(acc_ref, contrib_ref, mod_ref, npr_ref, out_ref):
    """acc = 16*acc + contrib (4 fused doublings + 1 complete add)."""
    mod, npr = mod_ref[:], npr_ref[:]
    x = acc_ref[0:NLIMB, :]
    y = acc_ref[NLIMB : 2 * NLIMB, :]
    z = acc_ref[2 * NLIMB :, :]
    for _ in range(WINDOW):
        x, y, z = _dbl_core(x, y, z, mod, npr)
    cx = contrib_ref[0:NLIMB, :]
    cy = contrib_ref[NLIMB : 2 * NLIMB, :]
    cz = contrib_ref[2 * NLIMB :, :]
    x, y, z = _add_core(x, y, z, cx, cy, cz, mod, npr)
    out_ref[0:NLIMB, :] = x
    out_ref[NLIMB : 2 * NLIMB, :] = y
    out_ref[2 * NLIMB :, :] = z


def _window_call(n, b_blocks, table_slab, dig_w, b_pad):
    from snark_verifier_tpu.ops import field as F

    tc = tconsts(F.FQ)
    if FP.interpret():
        # CPU path: run the kernel MATH directly as traced jnp (interpret-mode
        # pallas_call on point-op kernels is unusably slow; see CLAUDE.md),
        # with the point loop as lax.scan so only ONE _add_core body compiles
        # (each unrolled body costs ~1 min of XLA CPU compile time).
        mod, npr = tc.as_inputs()
        # lane = i * b_pad + b  ->  (n, NTAB*ROWS, b_pad) per-point slabs
        sl = jnp.moveaxis(table_slab.reshape(NTAB * ROWS, n, b_pad), 1, 0)
        digs = dig_w[:, 0, :]  # (n, b_pad)

        def select(slab_i, dig):
            ad = jnp.abs(dig)

            def tab(k, c):
                return slab_i[k * ROWS + c * NLIMB : k * ROWS + (c + 1) * NLIMB, :]

            px = jnp.zeros_like(tab(0, 0))
            py = jnp.zeros_like(px)
            pz = jnp.zeros_like(px)
            for k in range(NTAB):
                m = (ad == k)[None, :]
                px = jnp.where(m, tab(k, 0), px)
                py = jnp.where(m, tab(k, 1), py)
                pz = jnp.where(m, tab(k, 2), pz)
            neg = (dig < 0)[None, :]
            py = jnp.where(neg, tsub(jnp.zeros_like(py), py, mod), py)
            return px, py, pz

        def step(acc, x):
            slab_i, dig = x
            p = select(slab_i, dig)
            return _add_core(*acc, *p, mod, npr), None

        acc0 = select(sl[0], digs[0])
        acc, _ = jax.lax.scan(step, acc0, (sl[1:], digs[1:]))
        return jnp.concatenate(acc, axis=0)
    return pl.pallas_call(
        functools.partial(_window_kernel_body, n),
        out_shape=jax.ShapeDtypeStruct((ROWS, b_pad), jnp.uint32),
        grid=(b_blocks, n),
        in_specs=[
            pl.BlockSpec(
                (NTAB * ROWS, FP.LANES),
                lambda b, i: (0, i * b_blocks + b),
                memory_space=pltpu.VMEM,
            ),
            # digits ride a leading grid axis: block (1, 1, LANES) keeps the
            # last two dims Mosaic-legal (sublane dim 1 == whole array dim)
            pl.BlockSpec(
                (1, 1, FP.LANES), lambda b, i: (i, 0, b), memory_space=pltpu.VMEM
            ),
        ]
        + TConsts.in_specs(),
        out_specs=pl.BlockSpec(
            (ROWS, FP.LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM
        ),
    )(table_slab, dig_w, *tc.as_inputs())


def _horner_call(acc, contrib, L):
    from snark_verifier_tpu.ops import field as F

    tc = tconsts(F.FQ)
    if FP.interpret():
        mod, npr = tc.as_inputs()
        p = tuple(acc[c * NLIMB : (c + 1) * NLIMB, :] for c in range(3))
        p, _ = jax.lax.scan(
            lambda c, _: (_dbl_core(*c, mod, npr), None), p, None, length=WINDOW
        )
        cp = tuple(contrib[c * NLIMB : (c + 1) * NLIMB, :] for c in range(3))
        out = _add_core(*p, *cp, mod, npr)
        return jnp.concatenate(out, axis=0)
    spec = pl.BlockSpec((ROWS, FP.LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _horner_kernel_body,
        out_shape=jax.ShapeDtypeStruct((ROWS, L), jnp.uint32),
        grid=(L // FP.LANES,),
        in_specs=[spec, spec] + TConsts.in_specs(),
        out_specs=spec,
    )(acc, contrib, *tc.as_inputs())


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=2)
def msm_batched_fused(points, scalars_canon, nwindows: int = NWINDOWS):
    """Batched small MSM, point-scan path.  Same contract as
    ops.msm.msm_batched: points G1 batch (..., n), scalars (..., n, 16)
    canonical; returns G1 batch (...,).

    `nwindows` < 64 is a test hook (correct only when every scalar is below
    2^(4*nwindows - 1)); production callers use the default."""
    import os

    from snark_verifier_tpu.ops import field as F
    from snark_verifier_tpu.ops.curve import G1

    batch_shape = points.batch_shape[:-1]
    n = points.batch_shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    use_mega = not FP.interpret() and os.environ.get("SVTPU_MSM_MEGA", "1") == "1"
    # the mega-kernel runs SCAN_LANES-wide blocks; pad B so both the scan
    # lane width and the generic FP.LANES tier (table-build kernels) divide it
    unit = max(SCAN_LANES, FP.LANES) if use_mega else FP.LANES
    b_pad = ((B + unit - 1) // unit) * unit
    b_blocks = b_pad // FP.LANES
    l_tab = n * b_pad

    # ---- t-layout slabs: lane = i * b_pad + b (point-major) ----------------
    def to_slab(coord):
        c = coord.reshape(B, n, NLIMB)
        c = jnp.pad(c, ((0, b_pad - B), (0, 0), (0, 0)))
        return jnp.swapaxes(c, 0, 1).reshape(l_tab, NLIMB).T

    xs = to_slab(points.x)
    ys = to_slab(points.y)
    zs = to_slab(points.z)
    # padded lanes decode as (0 : 0 : 0) which is NOT a point; but their
    # digits are 0 so the table-select always yields T_0 = identity for them.
    # T_k for k >= 1 on padded lanes are garbage-but-unused.  T_0 must still
    # be the global identity:
    ident = jnp.asarray(F.FQ.encode([0, 1, 0]))  # x, y, z of (0 : 1 : 0)

    # ---- tables: T_k = k * P for k = 0..8 ----------------------------------
    p1 = (xs, ys, zs)
    if FP.interpret():
        # CPU: scan T_k = T_{k-1} + P so one add body compiles (complete
        # addition covers the doubling cases; representatives may differ
        # projectively from the TPU ladder but agree affinely).
        from snark_verifier_tpu.ops.field_pallas import tconsts as _tc
        from snark_verifier_tpu.ops import field as _F

        mod, npr = _tc(_F.FQ).as_inputs()
        _, rest = jax.lax.scan(
            lambda c, _: ((lambda r: (r, r))(_add_core(*c, *p1, mod, npr))),
            p1,
            None,
            length=NTAB - 2,
        )
        higher = [tuple(r[k] for r in rest) for k in range(NTAB - 2)]
        ladder = [p1] + higher
    else:
        p2 = g1_double_t(p1)
        p3 = g1_add_t(p2, p1)
        p4 = g1_double_t(p2)
        p5 = g1_add_t(p4, p1)
        p6 = g1_double_t(p3)
        p7 = g1_add_t(p6, p1)
        p8 = g1_double_t(p4)
        ladder = [p1, p2, p3, p4, p5, p6, p7, p8]
    t0 = tuple(
        jnp.broadcast_to(ident[i][:, None], (NLIMB, l_tab)) for i in range(3)
    )
    tables = [t0] + ladder
    table_slab = jnp.concatenate(
        [jnp.concatenate(t, axis=0) for t in tables], axis=0
    )  # (9 * 48, l_tab)

    # ---- digits ------------------------------------------------------------
    digits = signed_digits(scalars_canon.reshape(B, n, NLIMB))  # (B, n, 64)
    digits = digits[..., :nwindows]
    digits = jnp.pad(digits, ((0, b_pad - B), (0, 0), (0, 0)))
    # (nw, n, 1, b_pad) MSB first; the singleton keeps the digit BlockSpec's
    # trailing dims Mosaic-legal (window index rides the leading axis)
    dig_t = jnp.transpose(digits, (2, 1, 0))[::-1, :, None, :]

    # ---- window scan: acc = 16*acc + sum_i T[digit_i] ----------------------
    nw = dig_t.shape[0]
    if use_mega:
        # single whole-MSM kernel, accumulator VMEM-resident throughout
        acc = _scan_call(
            n, nw, table_slab, dig_t.reshape(nw * n, 1, b_pad), b_pad
        )
    else:
        acc0 = jnp.concatenate(
            [jnp.broadcast_to(ident[i][:, None], (NLIMB, b_pad)) for i in range(3)],
            axis=0,
        )

        def window_step(acc, dig_w):
            contrib = _window_call(n, b_blocks, table_slab, dig_w, b_pad)
            return _horner_call(acc, contrib, b_pad), None

        acc, _ = jax.lax.scan(window_step, acc0, dig_t)

    out = tuple(
        acc[c * NLIMB : (c + 1) * NLIMB, :B].T.reshape(batch_shape + (NLIMB,))
        for c in range(3)
    )
    return G1(*out)
