"""Fused Pallas kernels for batched G1 operations.

One kernel per complete point operation: the 12+ Montgomery multiplies of an
RCB add (and their ~100-step carry chains) execute register/VMEM-resident in
a single Pallas program instead of ~500 dispatched XLA ops.  Layout inside
kernels is (limb, batch): limbs on sublanes, batch on lanes; wrappers
transpose at the boundary.

Enabled in ops/curve.py via `snark_verifier_tpu.config.use_pallas()` —
default on TPU backends, off on CPU (mosaic interpret mode is too slow for
tests; the XLA path is the bit-exact reference there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snark_verifier_tpu.ops import field_pallas as FP
from snark_verifier_tpu.ops.field_pallas import TConsts, tadd, tconsts, tmul, tsub
from snark_verifier_tpu.ops.limbs import NLIMB


def _mul_b3(t, mod128):
    """9*t (3*b with b=3) as a packed add chain: one pack/unpack pair for
    the four mod-adds instead of one per add (field_pallas packed fabric)."""
    pmod = FP._pmod(mod128, t.shape)
    pt = FP._pack(t)

    def step(x, y):
        s, c = FP._padd_raw(x, y)
        return FP._pcond_sub_mod(s, pmod, extra=c)

    p2 = step(pt, pt)
    p4 = step(p2, p2)
    p8 = step(p4, p4)
    return FP._unpack(step(p8, pt))


def _add_core(x1, y1, z1, x2, y2, z2, mod, npr):
    """RCB15 algorithm 7 on transposed limbs (mirrors curve.g1_add)."""

    def mul(a, b):
        return tmul(a, b, mod, npr)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(tadd(x1, y1, mod), tadd(x2, y2, mod))
    t3 = tsub(t3, tadd(t0, t1, mod), mod)
    t4 = mul(tadd(y1, z1, mod), tadd(y2, z2, mod))
    t4 = tsub(t4, tadd(t1, t2, mod), mod)
    x3 = mul(tadd(x1, z1, mod), tadd(x2, z2, mod))
    y3 = tsub(x3, tadd(t0, t2, mod), mod)
    x3 = tadd(t0, t0, mod)
    t0 = tadd(x3, t0, mod)
    t2 = _mul_b3(t2, mod)
    z3 = tadd(t1, t2, mod)
    t1 = tsub(t1, t2, mod)
    y3 = _mul_b3(y3, mod)
    x3 = tsub(mul(t3, t1), mul(t4, y3), mod)
    y3 = tadd(mul(t1, z3), mul(y3, t0), mod)
    z3 = tadd(mul(z3, t4), mul(t0, t3), mod)
    return x3, y3, z3


def _dbl_core(x, y, z, mod, npr):
    """RCB15 algorithm 9 on transposed limbs (mirrors curve.g1_double)."""

    def mul(a, b):
        return tmul(a, b, mod, npr)

    t0 = mul(y, y)
    z3 = tadd(t0, t0, mod)
    z3 = tadd(z3, z3, mod)
    z3 = tadd(z3, z3, mod)
    t1 = mul(y, z)
    t2 = _mul_b3(mul(z, z), mod)
    x3 = mul(t2, z3)
    y3 = tadd(t0, t2, mod)
    z3 = mul(t1, z3)
    t1 = tadd(t2, t2, mod)
    t2 = tadd(t1, t2, mod)
    t0 = tsub(t0, t2, mod)
    y3 = tadd(mul(t0, y3), x3, mod)
    t1 = mul(x, y)
    x3 = mul(t0, t1)
    x3 = tadd(x3, x3, mod)
    return x3, y3, z3


def _add_kernel(x1, y1, z1, x2, y2, z2, mod, npr, ox, oy, oz):
    rx, ry, rz = _add_core(
        x1[:], y1[:], z1[:], x2[:], y2[:], z2[:], mod[:], npr[:]
    )
    ox[:] = rx
    oy[:] = ry
    oz[:] = rz


def _dbl_kernel(x, y, z, mod, npr, ox, oy, oz):
    rx, ry, rz = _dbl_core(x[:], y[:], z[:], mod[:], npr[:])
    ox[:] = rx
    oy[:] = ry
    oz[:] = rz


def _add_select_kernel(x1, y1, z1, x2, y2, z2, m, mod, npr, ox, oy, oz):
    """out = m ? (p1 + p2) : p1 — complete add with the select fused in.

    The conditional-accumulate step of every tree/scan fold (MSM tree
    reduce, g1_tree_sum, bucket suffix scan).  Fusing the select saves the
    merged-point 3-slab round trip through HBM: the add kernel is VMEM-
    traffic-bound (PERF.md), so the win is proportional to slabs moved."""
    rx, ry, rz = _add_core(
        x1[:], y1[:], z1[:], x2[:], y2[:], z2[:], mod[:], npr[:]
    )
    keep = m[:] != 0
    ox[:] = jnp.where(keep, rx, x1[:])
    oy[:] = jnp.where(keep, ry, y1[:])
    oz[:] = jnp.where(keep, rz, z1[:])


def _point_blockspec():
    return pl.BlockSpec((NLIMB, FP.LANES), lambda i: (0, i), memory_space=pltpu.VMEM)


def _mask_blockspec():
    return pl.BlockSpec((1, FP.LANES), lambda i: (0, i), memory_space=pltpu.VMEM)


def _flatten_t(arr, n, pad):
    out = arr.reshape(n, NLIMB).T
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    return out


@functools.partial(jax.jit, static_argnums=())
def g1_add_pallas(p, q):
    """Fused complete add on G1 batches ((..., 16) coordinate layout)."""
    from snark_verifier_tpu.ops.curve import G1
    from snark_verifier_tpu.ops import field as F

    spec = F.FQ
    batch_shape = jnp.broadcast_shapes(p.x.shape[:-1], q.x.shape[:-1])
    n = int(np.prod(batch_shape)) if batch_shape else 1
    total = FP._padded_total(n)
    pad = total - n
    tc = tconsts(spec)

    ins = []
    for g in (p, q):
        for coord in (g.x, g.y, g.z):
            c = jnp.broadcast_to(coord, batch_shape + (NLIMB,))
            ins.append(_flatten_t(c, n, pad))

    if FP.interpret():
        mod, npr = tc.as_inputs()
        outs = _add_core(*ins, mod, npr)
    else:
        outs = pl.pallas_call(
            _add_kernel,
            out_shape=[jax.ShapeDtypeStruct((NLIMB, total), jnp.uint32)] * 3,
            grid=(total // FP.LANES,),
            in_specs=[_point_blockspec()] * 6 + TConsts.in_specs(),
            out_specs=[_point_blockspec()] * 3,
        )(*ins, *tc.as_inputs())
    x, y, z = (o[:, :n].T.reshape(batch_shape + (NLIMB,)) for o in outs)
    return G1(x, y, z)


@jax.jit
def g1_add_select_pallas(cond, p, q):
    """cond ? p+q : p in ONE kernel (see `_add_select_kernel`).

    cond broadcasts against the point batch shape; the complete-add formulas
    are symmetric in (p, q), so callers may order operands freely to match
    whichever one the fallback must return."""
    from snark_verifier_tpu.ops.curve import G1
    from snark_verifier_tpu.ops import field as F

    spec = F.FQ
    batch_shape = jnp.broadcast_shapes(
        p.x.shape[:-1], q.x.shape[:-1], jnp.shape(cond)
    )
    n = int(np.prod(batch_shape)) if batch_shape else 1
    total = FP._padded_total(n)
    pad = total - n
    tc = tconsts(spec)

    ins = []
    for g in (p, q):
        for coord in (g.x, g.y, g.z):
            c = jnp.broadcast_to(coord, batch_shape + (NLIMB,))
            ins.append(_flatten_t(c, n, pad))
    m = jnp.broadcast_to(cond, batch_shape).astype(jnp.uint32).reshape(1, n)
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad)))
    ins.append(m)

    if FP.interpret():
        mod, npr = tc.as_inputs()
        rx, ry, rz = _add_core(*ins[:6], mod, npr)
        keep = ins[6] != 0
        outs = (
            jnp.where(keep, rx, ins[0]),
            jnp.where(keep, ry, ins[1]),
            jnp.where(keep, rz, ins[2]),
        )
    else:
        outs = pl.pallas_call(
            _add_select_kernel,
            out_shape=[jax.ShapeDtypeStruct((NLIMB, total), jnp.uint32)] * 3,
            grid=(total // FP.LANES,),
            in_specs=[_point_blockspec()] * 6
            + [_mask_blockspec()]
            + TConsts.in_specs(),
            out_specs=[_point_blockspec()] * 3,
        )(*ins, *tc.as_inputs())
    x, y, z = (o[:, :n].T.reshape(batch_shape + (NLIMB,)) for o in outs)
    return G1(x, y, z)


@jax.jit
def g1_double_pallas(p):
    from snark_verifier_tpu.ops.curve import G1
    from snark_verifier_tpu.ops import field as F

    spec = F.FQ
    batch_shape = p.x.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    total = FP._padded_total(n)
    pad = total - n
    tc = tconsts(spec)
    ins = [_flatten_t(c, n, pad) for c in (p.x, p.y, p.z)]
    if FP.interpret():
        mod, npr = tc.as_inputs()
        outs = _dbl_core(*ins, mod, npr)
    else:
        outs = pl.pallas_call(
            _dbl_kernel,
            out_shape=[jax.ShapeDtypeStruct((NLIMB, total), jnp.uint32)] * 3,
            grid=(total // FP.LANES,),
            in_specs=[_point_blockspec()] * 3 + TConsts.in_specs(),
            out_specs=[_point_blockspec()] * 3,
        )(*ins, *tc.as_inputs())
    x, y, z = (o[:, :n].T.reshape(batch_shape + (NLIMB,)) for o in outs)
    return G1(x, y, z)


# ---------------------------------------------------------------------------
# Transposed-layout wrappers: operate directly on (16, L) arrays with L a
# fixed padding tier — no per-op transposes.  Used by msm.msm_batched when
# Pallas is enabled (the transpose in/out happens once per MSM).
# ---------------------------------------------------------------------------


def _pallas_t_call(kernel, n_in, n_out, args):
    L = args[0].shape[1]
    assert L % FP.LANES == 0
    from snark_verifier_tpu.ops import field as F

    tc = tconsts(F.FQ)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((NLIMB, L), jnp.uint32)] * n_out,
        grid=(L // FP.LANES,),
        in_specs=[_point_blockspec()] * n_in + TConsts.in_specs(),
        out_specs=[_point_blockspec()] * n_out,
    )(*args, *tc.as_inputs())


def _core_consts():
    from snark_verifier_tpu.ops import field as F

    return tconsts(F.FQ).as_inputs()


def g1_add_t(p, q):
    """p, q: (x, y, z) tuples of (16, L) arrays -> same.

    On CPU (FP.interpret()) the kernel BODY runs directly as traced jnp —
    bit-identical math, since the grid only splits the lane axis of
    lane-wise ops — because interpret-mode pallas_call is pathologically
    slow in this environment (~16 s per call; see CLAUDE.md)."""
    if FP.interpret():
        mod, npr = _core_consts()
        return _add_core(*p, *q, mod, npr)
    return tuple(_pallas_t_call(_add_kernel, 6, 3, [*p, *q]))


def g1_double_t(p):
    if FP.interpret():
        mod, npr = _core_consts()
        return _dbl_core(*p, mod, npr)
    return tuple(_pallas_t_call(_dbl_kernel, 3, 3, list(p)))


def g1_add_select_t(mask, p, q):
    """mask ? p+q : p on transposed slabs — the raw fused kernel with NO
    layout round-trip.  p, q: 3-tuples of (16, L) uint32 (L a multiple of
    FP.LANES); mask: (1, L) uint32.  The per-call transpose/pad of
    `g1_add_select_pallas` costs ~2x at >=2^20-lane tiers (PERF.md round 5);
    large-MSM callers keep their whole working set transposed instead."""
    if FP.interpret():
        mod, npr = _core_consts()
        rx, ry, rz = _add_core(*p, *q, mod, npr)
        keep = mask != 0
        return (
            jnp.where(keep, rx, p[0]),
            jnp.where(keep, ry, p[1]),
            jnp.where(keep, rz, p[2]),
        )
    from snark_verifier_tpu.ops import field as F

    tc = tconsts(F.FQ)
    L = p[0].shape[1]
    assert L % FP.LANES == 0
    return tuple(
        pl.pallas_call(
            _add_select_kernel,
            out_shape=[jax.ShapeDtypeStruct((NLIMB, L), jnp.uint32)] * 3,
            grid=(L // FP.LANES,),
            in_specs=[_point_blockspec()] * 6
            + [_mask_blockspec()]
            + TConsts.in_specs(),
            out_specs=[_point_blockspec()] * 3,
        )(*p, *q, mask, *tc.as_inputs())
    )


# ---------------------------------------------------------------------------
# Fused Horner window combine: acc = 2^w * acc + totals[w] over a sequential
# grid, accumulator VMEM-resident.  Replaces ~nwin * (w + 1) dispatched
# small-batch point ops (the per-window doublings are latency-bound at lane
# width 1 through the axon runtime).
# ---------------------------------------------------------------------------

ROWS3 = 3 * NLIMB


def _horner_w_kernel(window, totals_ref, mod_ref, npr_ref, out_ref):
    """Grid step w (MSB window first): acc <- 2^window * acc + T_w."""
    w = pl.program_id(0)
    mod, npr = mod_ref[:], npr_ref[:]
    tx = totals_ref[0:NLIMB, :]
    ty = totals_ref[NLIMB : 2 * NLIMB, :]
    tz = totals_ref[2 * NLIMB :, :]

    @pl.when(w == 0)
    def _():
        out_ref[0:NLIMB, :] = tx
        out_ref[NLIMB : 2 * NLIMB, :] = ty
        out_ref[2 * NLIMB :, :] = tz

    @pl.when(w > 0)
    def _():
        x = out_ref[0:NLIMB, :]
        y = out_ref[NLIMB : 2 * NLIMB, :]
        z = out_ref[2 * NLIMB :, :]
        for _ in range(window):
            x, y, z = _dbl_core(x, y, z, mod, npr)
        x, y, z = _add_core(x, y, z, tx, ty, tz, mod, npr)
        out_ref[0:NLIMB, :] = x
        out_ref[NLIMB : 2 * NLIMB, :] = y
        out_ref[2 * NLIMB :, :] = z


def horner_combine_pallas(totals, window: int):
    """totals: G1 batch (nwin,) -> G1 scalar: sum_w 2^(w*window) * totals_w.

    One pallas_call with a sequential window grid; each step unrolls
    `window` doublings + 1 add on a (48, 128) VMEM block (lane 0 carries
    the value; the 128-lane block is the Mosaic minimum)."""
    from snark_verifier_tpu.ops import field as F
    from snark_verifier_tpu.ops.curve import G1

    nwin = totals.x.shape[0]

    def slab(c):  # (nwin, 16) -> (16, nwin*128), MSB window at block 0
        t = c[::-1].T[:, :, None]  # (16, nwin, 1)
        return jnp.broadcast_to(t, (NLIMB, nwin, 128)).reshape(NLIMB, nwin * 128)

    tslab = jnp.concatenate([slab(totals.x), slab(totals.y), slab(totals.z)], axis=0)
    tc = tconsts(F.FQ)
    out = pl.pallas_call(
        functools.partial(_horner_w_kernel, window),
        out_shape=jax.ShapeDtypeStruct((ROWS3, 128), jnp.uint32),
        grid=(nwin,),
        in_specs=[
            pl.BlockSpec((ROWS3, 128), lambda w: (0, w), memory_space=pltpu.VMEM)
        ]
        + TConsts.in_specs(),
        out_specs=pl.BlockSpec(
            (ROWS3, 128), lambda w: (0, 0), memory_space=pltpu.VMEM
        ),
    )(tslab, *tc.as_inputs())
    return G1(out[0:NLIMB, 0], out[NLIMB : 2 * NLIMB, 0], out[2 * NLIMB :, 0])
