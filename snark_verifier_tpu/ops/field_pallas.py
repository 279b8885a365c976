"""Pallas TPU kernels for BN254 limb arithmetic.

The XLA path in ops/field.py issues each Montgomery multiply as dozens of
small ops whose sequential carry chains are dispatch-latency bound.  These
kernels fuse entire field/curve operations into single Pallas programs in a
*transposed* (limb, batch) layout: limbs live on the 8-sublane axis, the
batch rides the 128-lane axis, the limb-product column reduction is one MXU
matmul per multiply, and carry chains become in-register loop iterations.

The `_t*` helpers are pure functions over (16, B) uint32 arrays designed to
be called *inside* kernels (e.g. the fused G1 ops in curve_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snark_verifier_tpu.ops.limbs import LIMB_BITS, LIMB_MASK, NLIMB

LANES = 512  # lane-block size (multiple of 128)
FIXED_TOTAL = 32768  # canonical padded lane count: mosaic recompiles per
                     # grid, so every call pads to a fixed tier (one compile
                     # per kernel; larger batches jump to the next power of 2)


def interpret() -> bool:
    """Run pallas_call in interpreter mode?  Default: yes on CPU (so the
    kernels are unit-testable without Mosaic), no on TPU.  Override with
    SVTPU_PALLAS_INTERPRET=0/1."""
    import os

    forced = os.environ.get("SVTPU_PALLAS_INTERPRET")
    if forced is not None:
        return forced == "1"
    import jax

    return jax.default_backend() == "cpu"


def _padded_total(n: int, small_tiers: bool = False) -> int:
    """Canonical padded lane count.  `small_tiers` adds 512/4096 tiers below
    FIXED_TOTAL for cheap-to-compile kernels (mont_mul) whose callers run at
    tiny batch (the pairing tower ops): Mosaic compiles once per grid, and
    the mont-mul kernel compiles in seconds, so the extra grids are worth
    the 64x lane-waste reduction.  The expensive G1 kernels keep the single
    32768 base tier."""
    if small_tiers:
        for tier in (LANES, 4096):
            if n <= tier:
                return tier
    total = FIXED_TOTAL
    while total < n:
        total *= 2
    return total


def _tcolumns(a, b, nout):
    """a, b (16, B) -> (nout, B) column sums of the schoolbook product.

    Pure-integer shifted-slab accumulation: row-group i of the (16,16,B)
    product contributes its 16 columns at offset i (lo) / i+1 (hi).  All
    u32, no dtype conversions, no MXU — the sparse-matmul alternative wastes
    ~16x MXU work and pays f32 conversion passes."""
    prod = a[:, None, :] * b[None, :, :]  # (16, 16, B) exact u32
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    b_shape = prod.shape[2:]
    rows = nout + NLIMB + 1

    def _cat(parts):
        parts = [p for p in parts if p.shape[0] > 0]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def _z(k):
        return jnp.zeros((k,) + b_shape, jnp.uint32)

    acc = jnp.zeros((rows,) + b_shape, jnp.uint32)
    for i in range(NLIMB):
        slab = _cat([_z(i), lo[i], _z(1)]) + _cat([_z(i + 1), hi[i]])
        acc = acc + _cat([slab, _z(rows - (i + NLIMB + 1))])
    return acc[:nout]


def _shift1(x, d=1):
    """Move row i to row i+d (zeros shifted in at the bottom)."""
    return jnp.concatenate([jnp.zeros((d,) + x.shape[1:], x.dtype), x[:-d]], axis=0)


def _tcarry(cols):
    """Resolve column sums (< 2^22) into exact limbs via Kogge-Stone
    carry-lookahead: log2(rows) rounds of whole-array ops instead of a
    sequential ripple — ~4x fewer kernel ops, same result.

    Returns (limbs, carry_out)."""
    n = cols.shape[0]
    s = cols & LIMB_MASK
    c = cols >> LIMB_BITS  # carry INTO row i+1, < 2^6
    t = s + _shift1(c)  # < 2^16 + 2^6
    g = t >> LIMB_BITS  # generate (0/1)
    p = ((t & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)  # propagate
    G, P = g, p
    d = 1
    while d < n:
        G = G | (P & _shift1(G, d))
        P = P & _shift1(P, d)
        d <<= 1
    carry_in = _shift1(G)
    out = (t + carry_in) & LIMB_MASK
    carry_out = c[n - 1] + G[n - 1]
    return out, carry_out


# ---------------------------------------------------------------------------
# Packed-u32 carry fabric (round 4).  Resolved 16-bit limb vectors pack two
# limbs per u32 row ((16, B) -> (8, B)), so adds/subs ride the native 32-bit
# adder: intra-pair carries are free, inter-row carries need a 3-round
# Kogge-Stone over 8 rows instead of 4+ rounds over 16 (or 32) rows.
# Measured on-chip: the RCB15 add kernel went 8.8 -> 19.3 M adds/s when
# tadd/tsub/cond-sub moved onto this fabric (the adds were ~75% of the
# kernel; the mul-only ablation runs at 43 M adds/s).
#
# Only applies to RESOLVED limbs (< 2^16 each); the post-schoolbook column
# sums (< 2^22) still use the 16/32-row _tcarry above.  _pack/_unpack use
# reshape + middle-axis indexing — sublane-STRIDED slices (x[0::2]) lower to
# an unsupported Mosaic gather.
# ---------------------------------------------------------------------------


# the packed fabric (_pack/_unpack/_ks8/_padd_raw) hardcodes the
# 16-limb/8-row layout (row count NLIMB//2, 3-round Kogge-Stone over 8 rows,
# G[7] carry-out); changing NLIMB requires reworking all four together
assert NLIMB == 16, "packed carry fabric assumes the 16x16-bit limb layout"


def _pack(x):
    """(16, B) 16-bit limbs -> (8, B) u32 rows (limb 2i | limb 2i+1 << 16)."""
    r = x.reshape(NLIMB // 2, 2, x.shape[-1])
    return r[:, 0, :] | (r[:, 1, :] << 16)


def _unpack(p):
    """(8, B) u32 rows -> (16, B) 16-bit limbs."""
    lo = p & 0xFFFF
    hi = p >> 16
    return jnp.concatenate([lo[:, None, :], hi[:, None, :]], axis=1).reshape(
        NLIMB, p.shape[-1]
    )


def _ks8(g, pr):
    """Kogge-Stone over 8 rows: generate/propagate -> (carry_in, carry_out)."""
    G, P = g, pr
    d = 1
    while d < 8:
        G = G | (P & _shift1(G, d))
        P = P & _shift1(P, d)
        d <<= 1
    return _shift1(G), G[7]


def _padd_raw(pa, pb, bump_row0=None):
    """pa + pb (+ bump on row 0) on packed rows.  Returns (sum, carry_out).

    Per-row u32 sums wrap at most once (2*(2^32-1)+1 < 2^33); the bump wrap
    and the pair-sum wrap are mutually exclusive, so OR-ing the two detects
    the row's single generate bit."""
    s = pa + pb
    g = (s < pa).astype(jnp.uint32)
    if bump_row0 is not None:
        s0 = s[:1] + bump_row0[None]
        g0 = g[:1] | (s0 < s[:1]).astype(jnp.uint32)
        s = jnp.concatenate([s0, s[1:]], axis=0)
        g = jnp.concatenate([g0, g[1:]], axis=0)
    pr = ((~s) == 0).astype(jnp.uint32)
    cin, cout = _ks8(g, pr)
    return s + cin, cout


def _psub_raw(pa, pb):
    """pa - pb with borrow on packed rows.  Returns (diff, borrow_out)."""
    s = pa - pb
    g = (pa < pb).astype(jnp.uint32)
    pr = (s == 0).astype(jnp.uint32)
    bin_, bout = _ks8(g, pr)
    return s - bin_, bout


def _pcond_sub_mod(x, pmod, extra=None):
    diff, borrow = _psub_raw(x, pmod)
    take = borrow == 0
    if extra is not None:
        take = jnp.logical_or(take, extra > 0)
    return jnp.where(take[None, :], diff, x)


def _pmod(mod128, shape):
    return _pack(jnp.broadcast_to(mod128[:, :1], (NLIMB,) + shape[1:]))


class TConsts:
    """Transposed per-field constant tensors, passed as kernel inputs
    (pallas kernels cannot capture array constants)."""

    def __init__(self, spec):
        self.mod = np.broadcast_to(
            np.asarray(spec.mod_limbs, np.uint32)[:, None], (NLIMB, 128)
        ).copy()
        self.nprime = np.broadcast_to(
            np.asarray(spec.nprime_limbs, np.uint32)[:, None], (NLIMB, 128)
        ).copy()

    def as_inputs(self):
        return (jnp.asarray(self.mod), jnp.asarray(self.nprime))

    @staticmethod
    def in_specs():
        return [
            pl.BlockSpec((NLIMB, 128), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, 128), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ]


@functools.lru_cache(maxsize=None)
def tconsts(spec):
    return TConsts(spec)


def tmul(a, b, mod128, npr128):
    """Montgomery product on (16, B) transposed limbs."""
    t_cols = _tcolumns(a, b, 2 * NLIMB)  # (32, B)
    t_limbs, _ = _tcarry(t_cols)
    t_lo, t_hi = t_limbs[:NLIMB], t_limbs[NLIMB:]
    npr = jnp.broadcast_to(npr128[:, :1], t_lo.shape)
    m_cols = _tcolumns(t_lo, npr, NLIMB)
    m, _ = _tcarry(m_cols)
    mod = jnp.broadcast_to(mod128[:, :1], m.shape)
    u_cols = _tcolumns(m, mod, 2 * NLIMB)
    u_limbs, _ = _tcarry(u_cols)
    u_lo, u_hi = u_limbs[:NLIMB], u_limbs[NLIMB:]
    low_nonzero = jnp.logical_or(jnp.any(t_lo != 0, axis=0), jnp.any(u_lo != 0, axis=0))
    res, cout = _padd_raw(
        _pack(t_hi), _pack(u_hi), bump_row0=low_nonzero.astype(jnp.uint32)
    )
    return _unpack(_pcond_sub_mod(res, _pmod(mod128, t_hi.shape), extra=cout))


def tadd(a, b, mod128):
    s, carry = _padd_raw(_pack(a), _pack(b))
    return _unpack(_pcond_sub_mod(s, _pmod(mod128, a.shape), extra=carry))


def tsub(a, b, mod128):
    """a - b with borrow: packed complement-add, then +mod when borrowed."""
    d, borrow = _psub_raw(_pack(a), _pack(b))
    corrected, _ = _padd_raw(d, _pmod(mod128, a.shape))
    return _unpack(jnp.where((borrow > 0)[None, :], corrected, d))


# ---------------------------------------------------------------------------
# Standalone fused mont_mul kernel (unit-tested building block)
# ---------------------------------------------------------------------------


def _mont_mul_kernel(a_ref, b_ref, mod_ref, npr_ref, out_ref):
    out_ref[:] = tmul(a_ref[:], b_ref[:], mod_ref[:], npr_ref[:])


@functools.partial(jax.jit, static_argnums=2)
def mont_mul_pallas(a, b, spec):
    """Drop-in Montgomery multiply: (..., 16) uint32 -> (..., 16)."""
    batch_shape = a.shape[:-1]
    a2, b2 = jnp.broadcast_arrays(a, b)
    n = int(np.prod(batch_shape)) if batch_shape else 1
    total = _padded_total(n, small_tiers=True)
    pad = total - n
    at = a2.reshape(n, NLIMB).T
    bt = b2.reshape(n, NLIMB).T
    if pad:
        at = jnp.pad(at, ((0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, pad)))
    tc = tconsts(spec)
    out = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMB, total), jnp.uint32),
        grid=(total // LANES,),
        in_specs=[
            pl.BlockSpec((NLIMB, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        + TConsts.in_specs(),
        out_specs=pl.BlockSpec((NLIMB, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret(),
    )(at, bt, *tc.as_inputs())
    return out[:, :n].T.reshape(batch_shape + (NLIMB,))
