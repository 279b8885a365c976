"""Batched Fq2/Fq6/Fq12 tower arithmetic for TPU (JAX).

Mirrors the oracle tower (util/bn254.py) over (..., 16) Montgomery limb
arrays: Fq2 = (c0, c1), Fq6 = (a0, a1, a2) of Fq2, Fq12 = (b0, b1) of Fq6 —
plain tuples, so tower values are pytrees and flow through scan/select.
Karatsuba Fq2/Fq6/Fq12 multiplication; Frobenius via precomputed constants.
"""

from __future__ import annotations

import jax.numpy as jnp

from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.util import bn254

FQ = F.FQ


def _c(v: int, shape=()):
    return F.constant(v, FQ, shape)


def fq_mul(a, b):
    return F.mont_mul(a, b, FQ)


def fq_add(a, b):
    return F.add(a, b, FQ)


def fq_sub(a, b):
    return F.sub(a, b, FQ)


# -- Fq2 ---------------------------------------------------------------------


def fq2_add(a, b):
    return (fq_add(a[0], b[0]), fq_add(a[1], b[1]))


def fq2_sub(a, b):
    return (fq_sub(a[0], b[0]), fq_sub(a[1], b[1]))


def fq2_neg(a):
    return (F.neg(a[0], FQ), F.neg(a[1], FQ))


def fq2_mul(a, b):
    t0 = fq_mul(a[0], b[0])
    t1 = fq_mul(a[1], b[1])
    t2 = fq_mul(fq_add(a[0], a[1]), fq_add(b[0], b[1]))
    return (fq_sub(t0, t1), fq_sub(t2, fq_add(t0, t1)))


def fq2_sqr(a):
    t0 = fq_mul(fq_add(a[0], a[1]), fq_sub(a[0], a[1]))
    t1 = fq_mul(a[0], a[1])
    return (t0, fq_add(t1, t1))


def fq2_scalar_small(a, k: int):
    """Multiply both components by a small int via additions."""
    out0, out1 = F.zeros_like(a[0]), F.zeros_like(a[1])
    acc0, acc1 = a
    kk = k
    while kk:
        if kk & 1:
            out0, out1 = fq_add(out0, acc0), fq_add(out1, acc1)
        acc0, acc1 = fq_add(acc0, acc0), fq_add(acc1, acc1)
        kk >>= 1
    return (out0, out1)


def fq2_conj(a):
    return (a[0], F.neg(a[1], FQ))


def fq2_inv(a):
    norm = fq_add(fq_mul(a[0], a[0]), fq_mul(a[1], a[1]))
    ninv = F.inv(norm, FQ)
    return (fq_mul(a[0], ninv), F.neg(fq_mul(a[1], ninv), FQ))


def fq2_mul_xi(a):
    """Multiply by xi = 9 + u."""
    a9 = fq2_scalar_small(a, 9)
    return (fq_sub(a9[0], a[1]), fq_add(a9[1], a[0]))


def fq2_select(cond, a, b):
    return (F.select(cond, a[0], b[0]), F.select(cond, a[1], b[1]))


def fq2_constant(c: tuple, shape=()):
    return (_c(c[0], shape), _c(c[1], shape))


def fq2_is_zero(a):
    return jnp.logical_and(F.is_zero(a[0]), F.is_zero(a[1]))


def fq2_zeros(shape=()):
    return (F.zeros(shape), F.zeros(shape))


def fq2_ones(shape=()):
    return (F.ones(shape, FQ), F.zeros(shape))


# -- Fq6 ---------------------------------------------------------------------


def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    t2 = fq2_mul(a2, b2)
    c0 = fq2_add(
        t0,
        fq2_mul_xi(
            fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2))
        ),
    )
    c1 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)),
        fq2_mul_xi(t2),
    )
    c2 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1
    )
    return (c0, c1, c2)


def fq6_sqr(a):
    return fq6_mul(a, a)


def fq6_mul_by_v(a):
    return (fq2_mul_xi(a[2]), a[0], a[1])


def fq6_inv(a):
    a0, a1, a2 = a
    c0 = fq2_sub(fq2_sqr(a0), fq2_mul_xi(fq2_mul(a1, a2)))
    c1 = fq2_sub(fq2_mul_xi(fq2_sqr(a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_sqr(a1), fq2_mul(a0, a2))
    norm = fq2_add(
        fq2_mul(a0, c0),
        fq2_mul_xi(fq2_add(fq2_mul(a2, c1), fq2_mul(a1, c2))),
    )
    ninv = fq2_inv(norm)
    return (fq2_mul(c0, ninv), fq2_mul(c1, ninv), fq2_mul(c2, ninv))


def fq6_zeros(shape=()):
    return (fq2_zeros(shape), fq2_zeros(shape), fq2_zeros(shape))


def fq6_ones(shape=()):
    return (fq2_ones(shape), fq2_zeros(shape), fq2_zeros(shape))


# -- Fq12 --------------------------------------------------------------------


def _stacked_mul(aa, bb):
    """The tower's one batched Montgomery multiply.  On TPU this is the
    fused Pallas kernel with small lane tiers (512/4096): a tape-VM or
    Miller step's 54-product stack at decide batch (~432 lanes) becomes ONE
    single-block kernel launch instead of the XLA mont_mul graph whose
    dispatch latency dominated the final exponentiation (round 5).  CPU
    keeps the XLA path (bit-exact reference; interpret-mode pallas is
    unusably slow)."""
    from snark_verifier_tpu import config

    if config.use_pallas():
        from snark_verifier_tpu.ops.field_pallas import interpret, mont_mul_pallas

        if not interpret():
            return mont_mul_pallas(aa, bb, FQ)
    return F.mont_mul(aa, bb, FQ)


def _use_fq12_kernel() -> bool:
    """Whole-product fused Fq12 kernel (ops/tower_pallas.py): one pallas
    launch per tower multiply instead of ~150 scheduled XLA ops.  On by
    default on TPU; SVTPU_FQ12_KERNEL=0 falls back to the stacked-SoA XLA
    path."""
    import os

    from snark_verifier_tpu import config

    if not config.use_pallas():
        return False
    from snark_verifier_tpu.ops.field_pallas import interpret

    if interpret():
        return False
    return os.environ.get("SVTPU_FQ12_KERNEL", "1") == "1"


def fq12_mul(a, b):
    """Stacked-SoA Karatsuba: the 54 Fq products of the Fq12 tower collapse
    into ONE batched mont_mul over a stacked (54, ..., 16) operand pair, and
    the Karatsuba sums/recombinations are fused elementwise adds.  Same op
    sequence per product as the layered tower (bit-exact), but the scan
    bodies built from it (Miller loop, final exponentiation) shrink ~50x in
    HLO count — the per-op dispatch overhead at small batch was the entire
    decide cost (106 s -> ~3 s for the final exp on one v5e chip)."""
    if _use_fq12_kernel():
        from snark_verifier_tpu.ops.tower_pallas import fq12_mul_flat_pallas

        return fq12_from_flat(
            fq12_mul_flat_pallas(fq12_to_flat(a), fq12_to_flat(b))
        )
    pairs = []

    def sched_fq2(x, y):
        idx = len(pairs)
        pairs.append((x[0], y[0]))
        pairs.append((x[1], y[1]))
        pairs.append((fq_add(x[0], x[1]), fq_add(y[0], y[1])))
        return idx

    def sched_fq6(x, y):
        return [
            sched_fq2(x[0], y[0]),
            sched_fq2(x[1], y[1]),
            sched_fq2(x[2], y[2]),
            sched_fq2(fq2_add(x[1], x[2]), fq2_add(y[1], y[2])),
            sched_fq2(fq2_add(x[0], x[1]), fq2_add(y[0], y[1])),
            sched_fq2(fq2_add(x[0], x[2]), fq2_add(y[0], y[2])),
        ]

    i0 = sched_fq6(a[0], b[0])
    i1 = sched_fq6(a[1], b[1])
    i2 = sched_fq6(fq6_add(a[0], a[1]), fq6_add(b[0], b[1]))

    shape = jnp.broadcast_shapes(*(p[0].shape for p in pairs))
    aa = jnp.stack([jnp.broadcast_to(p[0], shape) for p in pairs])
    bb = jnp.stack([jnp.broadcast_to(p[1], shape) for p in pairs])
    rr = _stacked_mul(aa, bb)

    def fq2_from(idx):
        t0, t1, t2 = rr[idx], rr[idx + 1], rr[idx + 2]
        return (fq_sub(t0, t1), fq_sub(t2, fq_add(t0, t1)))

    def fq6_from(idxs):
        t0, t1, t2 = fq2_from(idxs[0]), fq2_from(idxs[1]), fq2_from(idxs[2])
        m12, m01, m02 = fq2_from(idxs[3]), fq2_from(idxs[4]), fq2_from(idxs[5])
        c0 = fq2_add(t0, fq2_mul_xi(fq2_sub(m12, fq2_add(t1, t2))))
        c1 = fq2_add(fq2_sub(m01, fq2_add(t0, t1)), fq2_mul_xi(t2))
        c2 = fq2_add(fq2_sub(m02, fq2_add(t0, t2)), t1)
        return (c0, c1, c2)

    t0 = fq6_from(i0)
    t1 = fq6_from(i1)
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    c1 = fq6_sub(fq6_from(i2), fq6_add(t0, t1))
    return (c0, c1)


def fq12_sqr(a):
    return fq12_mul(a, a)


def fq12_conj(a):
    return (a[0], fq6_neg(a[1]))


def fq12_inv(a):
    norm = fq6_sub(fq6_sqr(a[0]), fq6_mul_by_v(fq6_sqr(a[1])))
    ninv = fq6_inv(norm)
    return (fq6_mul(a[0], ninv), fq6_neg(fq6_mul(a[1], ninv)))


def fq12_ones(shape=()):
    return (fq6_ones(shape), fq6_zeros(shape))


def fq12_to_flat(f):
    """Fq12 tuple-tree -> flat (12, *batch, 16) array, component order
    (l, j, c) = l*6 + j*2 + c for Fq12 index l, Fq6 index j, Fq2 index c.
    The flat layout makes Fq12 registers dynamically indexable (the final-exp
    tape VM in ops/pairing.py scatters/gathers whole registers per step)."""
    comps = [f[l][j][c] for l in (0, 1) for j in (0, 1, 2) for c in (0, 1)]
    shape = jnp.broadcast_shapes(*(x.shape for x in comps))
    return jnp.stack([jnp.broadcast_to(x, shape) for x in comps])


def fq12_from_flat(v):
    return tuple(
        tuple((v[l * 6 + j * 2], v[l * 6 + j * 2 + 1]) for j in range(3))
        for l in range(2)
    )


def fq12_select(cond, a, b):
    import jax

    return jax.tree.map(lambda x, y: F.select(cond, x, y), a, b)


def fq12_is_one(a, shape=()):
    one = fq12_ones(shape)
    import jax

    eqs = jax.tree.map(lambda x, y: F.eq(x, jnp.broadcast_to(y, x.shape)), a, one)
    flat = jax.tree.leaves(eqs)
    out = flat[0]
    for e in flat[1:]:
        out = jnp.logical_and(out, e)
    return out


# -- Frobenius ---------------------------------------------------------------


def fq2_frob(a, power: int):
    return fq2_conj(a) if power % 2 else a


def fq6_frob(a, power: int, shape=()):
    a0 = fq2_frob(a[0], power)
    a1 = fq2_mul(fq2_frob(a[1], power), fq2_constant(bn254.FROB_FQ6_C1[power % 6], shape))
    a2 = fq2_mul(fq2_frob(a[2], power), fq2_constant(bn254.FROB_FQ6_C2[power % 6], shape))
    return (a0, a1, a2)


def fq12_frob(a, power: int, shape=()):
    c0 = fq6_frob(a[0], power, shape)
    c1 = fq6_frob(a[1], power, shape)
    coef = fq2_constant(bn254.FROB_FQ12_C1[power % 12], shape)
    c1 = tuple(fq2_mul(x, coef) for x in c1)
    return (c0, c1)
