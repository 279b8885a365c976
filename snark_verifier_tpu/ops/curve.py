"""Batched BN254 G1 arithmetic for TPU (JAX), Jacobian coordinates.

The device-side counterpart of the curve ops the reference takes from
`halo2curves` and drives through its MSM engine
(/root/reference/snark-verifier/src/util/msm.rs:259-343).  All ops are
vectorized over arbitrary leading batch dims.

Representation: a point batch is a pytree ``G1 = {x, y, z}`` of (..., 16)
uint32 Montgomery limb arrays, Jacobian coordinates (X/Z^2, Y/Z^3).  The
point at infinity is encoded as Z == 0 (any X, Y); formulas below handle it
branchlessly with selects, which is what makes them `vmap`/`scan`-safe.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops.limbs import NLIMB
from snark_verifier_tpu.util import bn254

FQ = F.FQ


class G1(NamedTuple):
    """Jacobian point batch; limbs in Montgomery form."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


def g1_identity(shape=()) -> G1:
    return G1(F.zeros(shape), F.ones(shape, FQ), F.zeros(shape))


def g1_from_affine_ints(points) -> G1:
    """Host: list/array of (x, y) python-int pairs or None -> device batch."""
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
        jnp.asarray(FQ.encode(xs)), jnp.asarray(FQ.encode(ys)), jnp.asarray(FQ.encode(zs))
    )


def g1_to_affine_ints(p: G1):
    """Host: device batch -> list of (x, y) int pairs / None (oracle format)."""
    x = FQ.decode(np.asarray(p.x))
    y = FQ.decode(np.asarray(p.y))
    z = FQ.decode(np.asarray(p.z))
    flat_x = np.atleast_1d(x)
    flat_y = np.atleast_1d(y)
    flat_z = np.atleast_1d(z)
    out = []
    for xi, yi, zi in zip(flat_x.reshape(-1), flat_y.reshape(-1), flat_z.reshape(-1)):
        if zi == 0:
            out.append(None)
        else:
            zinv = bn254.inv_mod(int(zi), bn254.P)
            out.append(
                (
                    int(xi) * zinv * zinv % bn254.P,
                    int(yi) * zinv * zinv * zinv % bn254.P,
                )
            )
    return out


def g1_is_identity(p: G1):
    return F.is_zero(p.z)


def g1_select(cond, a: G1, b: G1) -> G1:
    return G1(F.select(cond, a.x, b.x), F.select(cond, a.y, b.y), F.select(cond, a.z, b.z))


def g1_neg(p: G1) -> G1:
    return G1(p.x, F.neg(p.y, FQ), p.z)


def _mul(a, b):
    return F.mont_mul(a, b, FQ)


def _sqr(a):
    return F.mont_mul(a, a, FQ)


def _add(a, b):
    return F.add(a, b, FQ)


def _sub(a, b):
    return F.sub(a, b, FQ)


def _dbl_fe(a):
    return F.add(a, a, FQ)


@jax.jit
def g1_double(p: G1) -> G1:
    """Jacobian doubling (a = 0 curve): 2M + 5S-ish standard formulas.

    dbl-2009-l: A=X^2, B=Y^2, C=B^2, D=2((X+B)^2-A-C), E=3A, F=E^2,
    X3=F-2D, Y3=E(D-X3)-8C, Z3=2YZ.  Identity (Z=0) maps to Z3=0. ✓
    """
    a = _sqr(p.x)
    b = _sqr(p.y)
    c = _sqr(b)
    d = _sub(_sqr(_add(p.x, b)), _add(a, c))
    d = _dbl_fe(d)
    e = _add(_dbl_fe(a), a)
    f = _sqr(e)
    x3 = _sub(f, _dbl_fe(d))
    c8 = _dbl_fe(_dbl_fe(_dbl_fe(c)))
    y3 = _sub(_mul(e, _sub(d, x3)), c8)
    z3 = _dbl_fe(_mul(p.y, p.z))
    return G1(x3, y3, z3)


@jax.jit
def g1_add(p: G1, q: G1) -> G1:
    """Complete Jacobian addition via add-2007-bl + branchless edge handling.

    Handles p==identity, q==identity, p==q (fall back to double), p==-q
    (identity) with selects so the op is safe under vmap/scan.
    """
    z1z1 = _sqr(p.z)
    z2z2 = _sqr(q.z)
    u1 = _mul(p.x, z2z2)
    u2 = _mul(q.x, z1z1)
    s1 = _mul(_mul(p.y, q.z), z2z2)
    s2 = _mul(_mul(q.y, p.z), z1z1)
    h = _sub(u2, u1)
    r = _sub(s2, s1)

    same_x = F.is_zero(h)
    same_y = F.is_zero(r)
    is_dbl = jnp.logical_and(same_x, same_y)
    is_inf = jnp.logical_and(same_x, jnp.logical_not(same_y))

    i = _sqr(_dbl_fe(h))
    j = _mul(h, i)
    rr = _dbl_fe(r)
    v = _mul(u1, i)
    x3 = _sub(_sub(_sqr(rr), j), _dbl_fe(v))
    y3 = _sub(_mul(rr, _sub(v, x3)), _dbl_fe(_mul(s1, j)))
    z3 = _mul(_mul(_sub(_sqr(_add(p.z, q.z)), _add(z1z1, z2z2)), h), F.constant(1, FQ, h.shape[:-1]))
    # z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H  — the extra mul by one keeps the
    # shapes broadcast-consistent when one operand is a scalar constant.

    generic = G1(x3, y3, z3)
    doubled = g1_double(p)

    out = g1_select(is_dbl, doubled, generic)
    out = g1_select(is_inf, g1_identity(out.batch_shape), out)
    out = g1_select(g1_is_identity(q), p, out)
    out = g1_select(g1_is_identity(p), q, out)
    return out


@jax.jit
def g1_add_affine(p: G1, qx, qy, q_is_inf) -> G1:
    """Mixed addition p (Jacobian) + (qx, qy) affine — saves ~4 muls.

    madd-2007-bl.  q_is_inf: boolean mask for affine identity entries.
    """
    z1z1 = _sqr(p.z)
    u2 = _mul(qx, z1z1)
    s2 = _mul(_mul(qy, p.z), z1z1)
    h = _sub(u2, p.x)
    r = _sub(s2, p.y)

    same_x = F.is_zero(h)
    same_y = F.is_zero(r)
    is_dbl = jnp.logical_and(same_x, same_y)
    is_inf = jnp.logical_and(same_x, jnp.logical_not(same_y))

    hh = _sqr(h)
    i = _dbl_fe(_dbl_fe(hh))
    j = _mul(h, i)
    rr = _dbl_fe(r)
    v = _mul(p.x, i)
    x3 = _sub(_sub(_sqr(rr), j), _dbl_fe(v))
    y3 = _sub(_mul(rr, _sub(v, x3)), _dbl_fe(_mul(p.y, j)))
    z3 = _sub(_sqr(_add(p.z, h)), _add(z1z1, hh))

    generic = G1(x3, y3, z3)
    doubled = g1_double(p)
    out = g1_select(is_dbl, doubled, generic)
    out = g1_select(is_inf, g1_identity(out.batch_shape), out)
    q_jac = G1(qx, qy, F.ones(qx.shape[:-1], FQ))
    out = g1_select(q_is_inf, p, out)
    out = g1_select(g1_is_identity(p), g1_select(q_is_inf, p, q_jac), out)
    return out


@functools.partial(jax.jit, static_argnums=1)
def g1_tree_sum(p: G1, axis: int = 0) -> G1:
    """Sum a batch of points along `axis` by pairwise tree reduction.

    log2(n) rounds of vectorized g1_add — the reduction primitive under the
    verifier's small per-proof MSMs.
    """
    p = G1(*(jnp.moveaxis(c, axis, 0) for c in p))
    n = p.x.shape[0]
    while n > 1:
        half = n // 2
        a = G1(p.x[:half], p.y[:half], p.z[:half])
        b = G1(p.x[half : 2 * half], p.y[half : 2 * half], p.z[half : 2 * half])
        s = g1_add(a, b)
        if n % 2:
            s = G1(
                jnp.concatenate([s.x, p.x[-1:]], axis=0),
                jnp.concatenate([s.y, p.y[-1:]], axis=0),
                jnp.concatenate([s.z, p.z[-1:]], axis=0),
            )
        p = s
        n = p.x.shape[0]
    return G1(p.x[0], p.y[0], p.z[0])


def g1_normalize(p: G1) -> G1:
    """Scale to affine (z in {0,1}) with one batched inversion."""
    zinv = F.inv(p.z, FQ)  # 0 -> 0
    zinv2 = _sqr(zinv)
    x = _mul(p.x, zinv2)
    y = _mul(p.y, _mul(zinv, zinv2))
    z = F.select(F.is_zero(p.z), F.zeros(p.z.shape[:-1]), F.ones(p.z.shape[:-1], FQ))
    return G1(x, y, z)


def g1_is_on_curve(p: G1):
    """y^2 == x^3 + 3 z^6 (projective form); identity passes."""
    y2 = _sqr(p.y)
    x3 = _mul(_sqr(p.x), p.x)
    z2 = _sqr(p.z)
    z6 = _mul(_sqr(z2), z2)
    b_term = _mul(F.constant(bn254.G1_B, FQ, z6.shape[:-1]), z6)
    ok = F.eq(y2, _add(x3, b_term))
    return jnp.logical_or(ok, g1_is_identity(p))
