"""Fused Pallas Fq12 multiplication: one kernel launch per tower product.

The final-exponentiation tape VM (ops/pairing.py) and the Miller loop are
latency-bound at decide batch: a tape step's fq12_mul is ~150 small XLA ops
(stack 54 products, one mont_mul, ~90 recombination adds) costing ~3 ms of
per-op scheduling regardless of tensor size.  This kernel computes the whole
Karatsuba Fq2/Fq6/Fq12 tower (54 Montgomery products + the xi-reductions)
register/VMEM-resident in ONE program over (192, L) stacked-component slabs
(flat order = tower.fq12_to_flat: component (l, j, c) at rows
(l*6 + j*2 + c)*16 .. +16).

Reference semantics: the Fq12 tower of util/bn254.py (oracle) /
ops/tower.py; bit-exactness is enforced in tests/test_pairing_jax.py via
whole-pairing equality on CPU (interpret composition) and by the on-chip
verify drive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snark_verifier_tpu.ops import field_pallas as FP
from snark_verifier_tpu.ops.field_pallas import TConsts, tadd, tconsts, tmul, tsub
from snark_verifier_tpu.ops.limbs import NLIMB

ROWS12 = 12 * NLIMB  # 192 sublanes per Fq12 operand


def _f12_mul_core(a, b, mod, npr):
    """a, b: lists of 12 (16, L) component slabs (flat order); returns 12."""

    def mul(x, y):
        return tmul(x, y, mod, npr)

    def mul9(t):  # 9t via the packed add chain (same as curve _mul_b3)
        from snark_verifier_tpu.ops.curve_pallas import _mul_b3

        return _mul_b3(t, mod)

    def f2mul(x, y):
        t0 = mul(x[0], y[0])
        t1 = mul(x[1], y[1])
        t2 = mul(tadd(x[0], x[1], mod), tadd(y[0], y[1], mod))
        return (tsub(t0, t1, mod), tsub(t2, tadd(t0, t1, mod), mod))

    def f2add(x, y):
        return (tadd(x[0], y[0], mod), tadd(x[1], y[1], mod))

    def f2sub(x, y):
        return (tsub(x[0], y[0], mod), tsub(x[1], y[1], mod))

    def f2xi(x):  # * (9 + u)
        return (tsub(mul9(x[0]), x[1], mod), tadd(mul9(x[1]), x[0], mod))

    def f6add(x, y):
        return tuple(f2add(x[j], y[j]) for j in range(3))

    def f6sub(x, y):
        return tuple(f2sub(x[j], y[j]) for j in range(3))

    def f6mul(x, y):  # Karatsuba, mirrors tower.fq6_mul
        t0 = f2mul(x[0], y[0])
        t1 = f2mul(x[1], y[1])
        t2 = f2mul(x[2], y[2])
        m12 = f2mul(f2add(x[1], x[2]), f2add(y[1], y[2]))
        m01 = f2mul(f2add(x[0], x[1]), f2add(y[0], y[1]))
        m02 = f2mul(f2add(x[0], x[2]), f2add(y[0], y[2]))
        c0 = f2add(t0, f2xi(f2sub(m12, f2add(t1, t2))))
        c1 = f2add(f2sub(m01, f2add(t0, t1)), f2xi(t2))
        c2 = f2add(f2sub(m02, f2add(t0, t2)), t1)
        return (c0, c1, c2)

    def f6_mul_by_v(x):
        return (f2xi(x[2]), x[0], x[1])

    def tower(v):  # 12 slabs -> ((fq2, fq2, fq2), (fq2, fq2, fq2))
        return tuple(
            tuple((v[l * 6 + j * 2], v[l * 6 + j * 2 + 1]) for j in range(3))
            for l in range(2)
        )

    a6, b6 = tower(a), tower(b)
    t0 = f6mul(a6[0], b6[0])
    t1 = f6mul(a6[1], b6[1])
    t2 = f6mul(f6add(a6[0], a6[1]), f6add(b6[0], b6[1]))
    c0 = f6add(t0, f6_mul_by_v(t1))
    c1 = f6sub(t2, f6add(t0, t1))
    out = (c0, c1)
    return [out[l][j][c] for l in (0, 1) for j in (0, 1, 2) for c in (0, 1)]


def _f12_mul_kernel(a_ref, b_ref, mod_ref, npr_ref, out_ref):
    mod, npr = mod_ref[:], npr_ref[:]
    a = [a_ref[i * NLIMB : (i + 1) * NLIMB, :] for i in range(12)]
    b = [b_ref[i * NLIMB : (i + 1) * NLIMB, :] for i in range(12)]
    r = _f12_mul_core(a, b, mod, npr)
    for i in range(12):
        out_ref[i * NLIMB : (i + 1) * NLIMB, :] = r[i]


def fq12_mul_flat_pallas(x, y):
    """Flat Fq12 multiply: (12, *B, 16) x (12, *B, 16) -> (12, *B, 16) in
    ONE kernel.  Batch is padded to 128-lane blocks (the tape VM runs at
    B ~ 8)."""
    from snark_verifier_tpu.ops import field as F

    batch_shape = x.shape[1:-1]
    n = 1
    for d in batch_shape:
        n *= d
    lanes = max(128, ((n + 127) // 128) * 128)

    def slab(v):
        s = jnp.moveaxis(v.reshape(12, n, NLIMB), -1, 1).reshape(ROWS12, n)
        return jnp.pad(s, ((0, 0), (0, lanes - n))) if lanes != n else s

    tc = tconsts(F.FQ)
    if FP.interpret():
        mod, npr = tc.as_inputs()
        a = [slab(x)[i * NLIMB : (i + 1) * NLIMB] for i in range(12)]
        b = [slab(y)[i * NLIMB : (i + 1) * NLIMB] for i in range(12)]
        r = jnp.concatenate(_f12_mul_core(a, b, mod, npr), axis=0)
    else:
        r = pl.pallas_call(
            _f12_mul_kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS12, lanes), jnp.uint32),
            grid=(lanes // 128,),
            in_specs=[
                pl.BlockSpec((ROWS12, 128), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS12, 128), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ]
            + TConsts.in_specs(),
            out_specs=pl.BlockSpec((ROWS12, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(slab(x), slab(y), *tc.as_inputs())
    out = r.reshape(12, NLIMB, lanes)[:, :, :n]
    return jnp.moveaxis(out, 1, -1).reshape(x.shape)
