"""Batched BN254 G1 arithmetic for TPU (JAX) — complete projective formulas.

The device-side counterpart of the curve ops the reference takes from
`halo2curves` and drives through its MSM engine
(/root/reference/snark-verifier/src/util/msm.rs:259-343).

Representation: homogeneous projective (X:Y:Z) with the identity at
(0:1:0); a point batch is ``G1 = (x, y, z)`` of (..., 16) uint32 Montgomery
limb arrays.  Addition/doubling use the Renes–Costello–Batina *complete*
formulas for a=0 curves (eprint 2015/1060, algorithms 7-9): a single
branchless formula covers doubling, inverses and the identity — no selects,
no data-dependent control flow — which is exactly the shape `vmap`, `scan`
and the XLA scheduler want.  Multiplications by b3 = 3*b = 9 are done with
additions (9t = 8t + t), cheaper than a field mul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.util import bn254

FQ = F.FQ


class G1(NamedTuple):
    """Projective point batch; limbs in Montgomery form."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


def g1_identity(shape=()) -> G1:
    return G1(F.zeros(shape), F.ones(shape, FQ), F.zeros(shape))


def g1_from_affine_ints(points) -> G1:
    """Host: list of (x, y) python-int pairs or None -> device batch."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return G1(
        jnp.asarray(FQ.encode(xs)),
        jnp.asarray(FQ.encode(ys)),
        jnp.asarray(FQ.encode(zs)),
    )


def g1_to_affine_ints(p: G1):
    """Host: device batch -> list of (x, y) int pairs / None (oracle format)."""
    x = np.atleast_1d(FQ.decode(np.asarray(p.x)))
    y = np.atleast_1d(FQ.decode(np.asarray(p.y)))
    z = np.atleast_1d(FQ.decode(np.asarray(p.z)))
    out = []
    for xi, yi, zi in zip(x.reshape(-1), y.reshape(-1), z.reshape(-1)):
        if zi == 0:
            out.append(None)
        else:
            zinv = bn254.inv_mod(int(zi), bn254.P)
            out.append((int(xi) * zinv % bn254.P, int(yi) * zinv % bn254.P))
    return out


def g1_is_identity(p: G1):
    return F.is_zero(p.z)


def g1_select(cond, a: G1, b: G1) -> G1:
    return G1(F.select(cond, a.x, b.x), F.select(cond, a.y, b.y), F.select(cond, a.z, b.z))


def g1_neg(p: G1) -> G1:
    return G1(p.x, F.neg(p.y, FQ), p.z)


def _mul(a, b):
    return F.mont_mul(a, b, FQ)


def _add(a, b):
    return F.add(a, b, FQ)


def _sub(a, b):
    return F.sub(a, b, FQ)


def _mul_b3(t):
    """t * 9 via shifts/adds (b3 = 3*b = 9 for y^2 = x^3 + 3)."""
    t2 = _add(t, t)
    t4 = _add(t2, t2)
    t8 = _add(t4, t4)
    return _add(t8, t)


def _pallas_worthwhile(*coords) -> bool:
    """The fused Pallas kernels pad the lane axis to a fixed 32768 tier
    (mosaic recompiles per shape, ops/field_pallas.py); below ~1/4 of the
    tier the padding waste loses to XLA's shape-exact fusion."""
    from snark_verifier_tpu.ops.field_pallas import FIXED_TOTAL

    lanes = 1
    for c in coords:
        n = 1
        for d in c.shape[:-1]:
            n *= d
        lanes = max(lanes, n)
    return lanes >= FIXED_TOTAL // 4


def g1_add(p: G1, q: G1) -> G1:
    """Complete projective addition, RCB15 algorithm 7 (a=0, b3=9).

    Routes to the fused Pallas kernel on TPU backends (config.use_pallas)
    at tier-filling batch sizes; the XLA composition below is the bit-exact
    reference path."""
    from snark_verifier_tpu.config import use_pallas

    if use_pallas() and _pallas_worthwhile(p.x, q.x):
        from snark_verifier_tpu.ops.curve_pallas import g1_add_pallas

        return g1_add_pallas(p, q)
    return _g1_add_xla(p, q)


@jax.jit
def _g1_add_xla(p: G1, q: G1) -> G1:
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = _mul(x1, x2)
    t1 = _mul(y1, y2)
    t2 = _mul(z1, z2)
    t3 = _mul(_add(x1, y1), _add(x2, y2))
    t3 = _sub(t3, _add(t0, t1))
    t4 = _mul(_add(y1, z1), _add(y2, z2))
    t4 = _sub(t4, _add(t1, t2))
    x3 = _mul(_add(x1, z1), _add(x2, z2))
    y3 = _sub(x3, _add(t0, t2))
    x3 = _add(t0, t0)
    t0 = _add(x3, t0)
    t2 = _mul_b3(t2)
    z3 = _add(t1, t2)
    t1 = _sub(t1, t2)
    y3 = _mul_b3(y3)
    x3 = _sub(_mul(t3, t1), _mul(t4, y3))
    y3 = _add(_mul(t1, z3), _mul(y3, t0))
    z3 = _add(_mul(z3, t4), _mul(t0, t3))
    return G1(x3, y3, z3)


def g1_add_select(cond, p: G1, q: G1) -> G1:
    """cond ? p+q : p — the conditional-accumulate step of every tree/scan
    fold (MSM tree reduce, `g1_tree_sum`, bucket suffix scan).

    On TPU this is ONE fused Pallas kernel (the select rides along inside
    the add, saving the merged-point slab round trip — the add kernel is
    VMEM-traffic-bound, PERF.md).  The XLA composition below is the
    bit-exact reference path; RCB15 complete addition is symmetric in
    (p, q), so both paths agree for either operand order."""
    from snark_verifier_tpu.config import use_pallas

    if use_pallas() and _pallas_worthwhile(p.x, q.x):
        from snark_verifier_tpu.ops.curve_pallas import g1_add_select_pallas

        return g1_add_select_pallas(cond, p, q)
    return g1_select(cond, g1_add(p, q), p)


@jax.jit
def g1_add_affine(p: G1, qx, qy, q_is_inf) -> G1:
    """Complete mixed addition (q affine), RCB15 algorithm 8 + identity mask."""
    x1, y1, z1 = p
    t0 = _mul(x1, qx)
    t1 = _mul(y1, qy)
    t3 = _mul(_add(x1, y1), _add(qx, qy))
    t3 = _sub(t3, _add(t0, t1))
    t4 = _add(_mul(qy, z1), y1)
    y3 = _add(_mul(qx, z1), x1)
    x3 = _add(t0, t0)
    t0 = _add(x3, t0)
    t2 = _mul_b3(z1)
    z3 = _add(t1, t2)
    t1 = _sub(t1, t2)
    y3 = _mul_b3(y3)
    x3 = _sub(_mul(t3, t1), _mul(t4, y3))
    y3 = _add(_mul(t1, z3), _mul(y3, t0))
    z3 = _add(_mul(z3, t4), _mul(t0, t3))
    out = G1(x3, y3, z3)
    return g1_select(q_is_inf, p, out)


def g1_double(p: G1) -> G1:
    """Complete projective doubling, RCB15 algorithm 9 (a=0, b3=9)."""
    from snark_verifier_tpu.config import use_pallas

    if use_pallas() and _pallas_worthwhile(p.x):
        from snark_verifier_tpu.ops.curve_pallas import g1_double_pallas

        return g1_double_pallas(p)
    return _g1_double_xla(p)


@jax.jit
def _g1_double_xla(p: G1) -> G1:
    x, y, z = p
    t0 = _mul(y, y)
    z3 = _add(t0, t0)
    z3 = _add(z3, z3)
    z3 = _add(z3, z3)
    t1 = _mul(y, z)
    t2 = _mul_b3(_mul(z, z))
    x3 = _mul(t2, z3)
    y3 = _add(t0, t2)
    z3 = _mul(t1, z3)
    t1 = _add(t2, t2)
    t2 = _add(t1, t2)
    t0 = _sub(t0, t2)
    y3 = _add(_mul(t0, y3), x3)
    t1 = _mul(x, y)
    x3 = _mul(t0, t1)
    x3 = _add(x3, x3)
    return G1(x3, y3, z3)


@functools.partial(jax.jit, static_argnums=1)
def g1_tree_sum(p: G1, axis: int = 0) -> G1:
    """Sum a batch of points along `axis` via a fixed-shape log-round fold.

    The fold runs as `lax.scan` over the round strides with a ONE-add body,
    keeping the compiled graph small (the add is instantiated once, not
    log(n) times).
    """
    p = G1(*(jnp.moveaxis(c, axis, 0) for c in p))
    n = p.x.shape[0]
    if n == 1:
        return G1(p.x[0], p.y[0], p.z[0])
    rounds = int(np.ceil(np.log2(n)))
    strides = jnp.asarray([1 << r for r in range(rounds)], jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)

    def round_step(cur: G1, stride):
        partner = jnp.minimum(pos + stride, n - 1)
        valid = (pos % (2 * stride) == 0) & (pos + stride < n)
        valid = valid.reshape((n,) + (1,) * (cur.x.ndim - 2))
        moved = G1(cur.x[partner], cur.y[partner], cur.z[partner])
        return g1_add_select(valid, cur, moved), None

    out, _ = jax.lax.scan(round_step, p, strides)
    return G1(out.x[0], out.y[0], out.z[0])


def g1_normalize(p: G1) -> G1:
    """Scale to affine (z in {0,1}) with one batched inversion."""
    zinv = F.inv(p.z, FQ)  # 0 -> 0
    x = _mul(p.x, zinv)
    y = _mul(p.y, zinv)
    is_inf = F.is_zero(p.z)
    z = F.select(is_inf, F.zeros(p.z.shape[:-1]), F.ones(p.z.shape[:-1], FQ))
    return G1(x, F.select(is_inf, F.ones(p.z.shape[:-1], FQ), y), z)


def g1_is_on_curve(p: G1):
    """y^2 z == x^3 + 3 z^3 (projective); identity passes."""
    y2z = _mul(_mul(p.y, p.y), p.z)
    x3 = _mul(_mul(p.x, p.x), p.x)
    z3 = _mul(_mul(p.z, p.z), p.z)
    b_term = _mul(F.constant(bn254.G1_B, FQ, z3.shape[:-1]), z3)
    ok = F.eq(y2z, _add(x3, b_term))
    return jnp.logical_or(ok, g1_is_identity(p))


def g1_eq(p: G1, q: G1):
    """Projective equality: x1 z2 == x2 z1 and y1 z2 == y2 z1 (plus identity)."""
    both_inf = jnp.logical_and(g1_is_identity(p), g1_is_identity(q))
    one_inf = jnp.logical_xor(g1_is_identity(p), g1_is_identity(q))
    xe = F.eq(_mul(p.x, q.z), _mul(q.x, p.z))
    ye = F.eq(_mul(p.y, q.z), _mul(q.y, p.z))
    return jnp.logical_or(both_inf, jnp.logical_and(jnp.logical_and(xe, ye), ~one_inf))
