"""Vectorized modular arithmetic over BN254 Fq/Fr for TPU (JAX).

Replaces the CPU field arithmetic the reference gets from `halo2curves`
(/root/reference/snark-verifier/src/util/arithmetic.rs:13-18) with
limb-decomposed Montgomery arithmetic designed for the TPU vector unit:

* elements: ``(..., 16)`` uint32, 16-bit limbs, little-endian, Montgomery
  form (R = 2^256);
* multiplication: separated-operand-scanning Montgomery — three schoolbook
  limb products whose 32 column sums are computed as ONE exact f32 matmul
  against a constant 0/1 scatter matrix (MXU work), with short carry chains
  on the VPU;
* inversion: Fermat exponentiation via a 4-bit windowed `lax.scan` (compact
  trace, ~320 muls);
* batch inversion: Montgomery trick via `associative_scan` prefix/suffix
  products (mirrors util/arithmetic.rs:47-69 semantics).

Every op is shape-polymorphic over leading batch dims and bit-exact against
the pure-Python oracle (tests/test_field_jax.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ops.limbs import (
    LIMB_BITS,
    LIMB_MASK,
    NLIMB,
    TOTAL_BITS,
    int_to_limbs,
    limbs_to_int,
)
from snark_verifier_tpu.util import bn254


@dataclass(frozen=True, eq=False)  # eq=False: identity hash, usable as a
class FieldSpec:                   # static jit argument
    """Static per-field constants, precomputed on host."""

    name: str
    modulus: int
    mod_limbs: np.ndarray = field(repr=False, default=None)
    nprime_limbs: np.ndarray = field(repr=False, default=None)  # -p^-1 mod 2^256
    r_mod: int = 0  # R mod p   (Montgomery one)
    r2: int = 0  # R^2 mod p (to-Montgomery factor)
    r3: int = 0

    def __post_init__(self):
        p = self.modulus
        R_ = 1 << TOTAL_BITS
        object.__setattr__(self, "mod_limbs", int_to_limbs(p))
        nprime = (-pow(p, -1, R_)) % R_
        object.__setattr__(self, "nprime_limbs", int_to_limbs(nprime))
        object.__setattr__(self, "r_mod", R_ % p)
        object.__setattr__(self, "r2", (R_ * R_) % p)
        object.__setattr__(self, "r3", (R_ * R_ * R_) % p)

    # -- host-side conversions ------------------------------------------------
    def to_mont_int(self, x: int) -> int:
        return x * (1 << TOTAL_BITS) % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * pow(1 << TOTAL_BITS, -1, self.modulus) % self.modulus

    def encode(self, values) -> np.ndarray:
        """Python ints (any nest) -> Montgomery limb array with trailing (16,)."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        out = np.stack(
            [int_to_limbs(self.to_mont_int(int(v) % self.modulus)) for v in flat]
        )
        return out.reshape(arr.shape + (NLIMB,)).astype(np.uint32)

    def decode(self, limbs) -> np.ndarray:
        """Montgomery limb array -> numpy object array of python ints."""
        arr = np.asarray(limbs)
        shape = arr.shape[:-1]
        flat = arr.reshape(-1, NLIMB)
        out = np.array(
            [self.from_mont_int(limbs_to_int(row)) for row in flat], dtype=object
        )
        return out.reshape(shape) if shape else out[0]


FQ = FieldSpec("Fq", bn254.P)
FR = FieldSpec("Fr", bn254.R)


# ---------------------------------------------------------------------------
# Column-sum scatter matrices (constant): map 256 lo-products + 256
# hi-products onto 32 columns.  f32 matmul is exact: entries < 2^16 and
# column sums < 2^22 < 2^24.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _col_matrix(n: int = NLIMB):
    m = np.zeros((2 * n * n, 2 * n), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            m[i * n + j, i + j] += 1.0  # lo part
            m[n * n + i * n + j, i + j + 1] += 1.0  # hi part
    return m


@functools.lru_cache(maxsize=None)
def _col_matrix_low(n: int = NLIMB):
    """Column matrix keeping only output columns < n (for the m = T*N' step)."""
    m = np.zeros((2 * n * n, n), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            if i + j < n:
                m[i * n + j, i + j] += 1.0
            if i + j + 1 < n:
                m[n * n + i * n + j, i + j + 1] += 1.0
    return m


def _columns(a, b, mat):
    """Schoolbook limb product of a,b -> column sums via MXU matmul.

    a, b: (..., 16) uint32 (limbs < 2^16). Returns (..., C) uint32 column
    sums (< 2^22), where C = mat.shape[1].
    """
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16) uint32 exact
    lo = (prod & LIMB_MASK).astype(jnp.float32)
    hi = (prod >> LIMB_BITS).astype(jnp.float32)
    nn = lo.shape[-1] * lo.shape[-2]  # explicit (not -1): zero-size batches
    flat = jnp.concatenate(           # appear inside associative_scan
        [lo.reshape(*lo.shape[:-2], nn), hi.reshape(*hi.shape[:-2], nn)], axis=-1
    )
    # Precision.HIGHEST is required: the default matmul precision computes
    # f32 matmuls via bf16 passes, destroying exactness.  All values stay
    # below 2^24 so a true-f32 matmul is exact.
    cols = jnp.matmul(
        flat,
        jnp.asarray(mat),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return cols.astype(jnp.uint32)


_UNROLL_CACHE = None


def _unroll(shape=None):
    """Unroll factor for the 16-step limb scans.

    Through the axon TPU runtime each while-loop iteration costs ~20 us of
    fixed overhead, so at SMALL batch a single mont_mul (~144 scan
    iterations) was ~3.5 ms regardless of tensor size; 4x-unrolled it is
    ~1 ms (full unroll OOM-kills the remote TPU compile helper on
    scan-of-switch graphs).  The unroll is scoped to small batches
    (< 1024 elements — the pairing/decide path, whose stacked-Fq12 shapes
    sit in the low hundreds): wide batched-verifier graphs amortize the
    loop overhead across lanes, and keeping them rolled preserves compile
    time — the round-3 threshold of 4096 caught the B=1820 batched
    verifier and DOUBLED its cold compile (291 s -> 663 s, BENCH_r03
    timeout) for a ~4% runtime gain.  On CPU the loops always stay rolled
    (cold suite compile time dominates there).
    SVTPU_UNROLL_LIMBS=<n> overrides the factor for every shape."""
    global _UNROLL_CACHE
    if _UNROLL_CACHE is None:
        import os

        flag = os.environ.get("SVTPU_UNROLL_LIMBS")
        if flag is not None:
            _UNROLL_CACHE = ("env", int(flag))
        elif jax.default_backend() != "cpu":
            _UNROLL_CACHE = ("auto", 4)
        else:
            _UNROLL_CACHE = ("auto", 1)
    mode, factor = _UNROLL_CACHE
    if mode == "env" or factor == 1:
        return factor
    if shape is None:
        return factor
    n = 1
    for d in shape[:-1]:
        n *= int(d)
    return factor if n < 1024 else 1


def _carry(cols, n_out=None):
    """Resolve column sums (< 2^22 each) into exact limbs.

    Returns (limbs (..., n_out), carry_out (...,)) where carry_out is the
    overflow beyond the last produced limb.
    """
    n = cols.shape[-1]
    n_out = n_out or n

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, t & LIMB_MASK

    cols_t = jnp.moveaxis(cols, -1, 0)
    carry, limbs_t = jax.lax.scan(
        step, jnp.zeros(cols.shape[:-1], jnp.uint32), cols_t,
        unroll=_unroll(cols.shape)
    )
    limbs = jnp.moveaxis(limbs_t, 0, -1)
    return limbs[..., :n_out], carry


def _sub_limbs(a, b):
    """a - b limbwise; returns (result limbs, borrow (uint32 0/1))."""
    a, b = jnp.broadcast_arrays(a, b)

    def step(bor, ab):
        ai, bi = ab
        t = ai.astype(jnp.int32) - bi.astype(jnp.int32) - bor.astype(jnp.int32)
        out = (t & LIMB_MASK).astype(jnp.uint32)
        nb = (t < 0).astype(jnp.uint32)
        return nb, out

    at = jnp.moveaxis(a, -1, 0)
    bt = jnp.moveaxis(b, -1, 0)
    borrow, out_t = jax.lax.scan(
        step, jnp.zeros(a.shape[:-1], jnp.uint32), (at, bt),
        unroll=_unroll(a.shape)
    )
    return jnp.moveaxis(out_t, 0, -1), borrow


def _add_limbs(a, b):
    a, b = jnp.broadcast_arrays(a, b)

    def step(c, ab):
        ai, bi = ab
        t = ai + bi + c
        return t >> LIMB_BITS, t & LIMB_MASK

    at = jnp.moveaxis(a, -1, 0)
    bt = jnp.moveaxis(b, -1, 0)
    carry, out_t = jax.lax.scan(
        step, jnp.zeros(a.shape[:-1], jnp.uint32), (at, bt),
        unroll=_unroll(a.shape)
    )
    return jnp.moveaxis(out_t, 0, -1), carry


def _cond_sub_mod(x, spec: FieldSpec, extra=None):
    """Reduce x (< 2p, possibly with a carry bit 'extra') into [0, p)."""
    mod = jnp.asarray(spec.mod_limbs)
    mod_b = jnp.broadcast_to(mod, x.shape)
    diff, borrow = _sub_limbs(x, mod_b)
    if extra is not None:
        # If there was a carry out of the top limb, x >= 2^256 > p: always sub.
        take_diff = jnp.logical_or(borrow == 0, extra > 0)
    else:
        take_diff = borrow == 0
    return jnp.where(take_diff[..., None], diff, x)


# ---------------------------------------------------------------------------
# Public field ops (all in Montgomery form unless stated otherwise)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=2)
def add(a, b, spec: FieldSpec):
    s, carry = _add_limbs(a, b)
    return _cond_sub_mod(s, spec, extra=carry)


@functools.partial(jax.jit, static_argnums=2)
def sub(a, b, spec: FieldSpec):
    d, borrow = _sub_limbs(a, b)
    mod = jnp.broadcast_to(jnp.asarray(spec.mod_limbs), d.shape)
    corrected, _ = _add_limbs(d, mod)
    return jnp.where((borrow > 0)[..., None], corrected, d)


@functools.partial(jax.jit, static_argnums=1)
def neg(a, spec: FieldSpec):
    return sub(zeros_like(a), a, spec)


@functools.partial(jax.jit, static_argnums=2)
def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product a*b*R^-1 mod p (separated operand scanning)."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    # T = a * b, exact 32 limbs.
    t_cols = _columns(a, b, _col_matrix())
    t_limbs, t_carry = _carry(t_cols)  # 32 limbs; t_carry must be 0
    t_lo, t_hi = t_limbs[..., :NLIMB], t_limbs[..., NLIMB:]
    # m = (T mod R) * N' mod R  (low-half product, exact limbs needed)
    npr = jnp.broadcast_to(jnp.asarray(spec.nprime_limbs), t_lo.shape)
    m_cols = _columns(t_lo, npr, _col_matrix_low())
    m, _ = _carry(m_cols)
    # u = m * p, exact 32 limbs.
    mod = jnp.broadcast_to(jnp.asarray(spec.mod_limbs), m.shape)
    u_cols = _columns(m, mod, _col_matrix())
    u_limbs, _ = _carry(u_cols)
    u_lo, u_hi = u_limbs[..., :NLIMB], u_limbs[..., NLIMB:]
    # T + u is divisible by R; low halves contribute exactly carry 0 or 1:
    # carry = 1 unless T_lo + u_lo == 0 (both all-zero).
    low_nonzero = jnp.logical_or(
        jnp.any(t_lo != 0, axis=-1), jnp.any(u_lo != 0, axis=-1)
    )
    res, carry = _add_limbs(t_hi, u_hi)
    res, carry2 = _add_limbs(
        res,
        jnp.concatenate(
            [
                low_nonzero.astype(jnp.uint32)[..., None],
                jnp.zeros(res.shape[:-1] + (NLIMB - 1,), jnp.uint32),
            ],
            axis=-1,
        ),
    )
    # t_hi + u_hi + 1 < 2p + 1 < 2^256 when p < 2^255, so carries are 0; but
    # add t_carry defensively into the comparison via extra.
    return _cond_sub_mod(res, spec, extra=carry + carry2 + t_carry)


def mont_sqr(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


@functools.partial(jax.jit, static_argnums=1)
def to_mont(a_canonical, spec: FieldSpec):
    r2 = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(spec.r2)), jnp.asarray(a_canonical).shape
    )
    return mont_mul(a_canonical, r2, spec)


@functools.partial(jax.jit, static_argnums=1)
def from_mont(a, spec: FieldSpec):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one, spec)


def ones(shape, spec: FieldSpec):
    return jnp.broadcast_to(jnp.asarray(int_to_limbs(spec.r_mod)), tuple(shape) + (NLIMB,))


def zeros(shape):
    return jnp.zeros(tuple(shape) + (NLIMB,), jnp.uint32)


def zeros_like(a):
    return jnp.zeros_like(a)


def constant(value: int, spec: FieldSpec, shape=()):
    """Load a python-int constant (canonical form) as Montgomery limbs."""
    enc = int_to_limbs(spec.to_mont_int(value % spec.modulus))
    return jnp.broadcast_to(jnp.asarray(enc), tuple(shape) + (NLIMB,))


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond boolean (...,); a,b (..., 16)."""
    return jnp.where(cond[..., None], a, b)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pow_const(a, exponent: int, spec: FieldSpec, window: int = 4):
    """a^exponent for a *static* integer exponent, via windowed lax.scan."""
    if exponent == 0:
        return ones(jnp.asarray(a).shape[:-1], spec)
    nwin = (exponent.bit_length() + window - 1) // window
    digits = np.array(
        [(exponent >> (window * i)) & ((1 << window) - 1) for i in range(nwin)][::-1],
        dtype=np.int32,
    )
    # table[k] = a^k, k in [0, 2^window)
    table = [ones(jnp.asarray(a).shape[:-1], spec), a]
    for _ in range(2, 1 << window):
        table.append(mont_mul(table[-1], a, spec))
    table = jnp.stack(table, axis=0)  # (2^w, ..., 16)

    def step(acc, digit):
        for _ in range(window):
            acc = mont_sqr(acc, spec)
        factor = table[digit]
        return mont_mul(acc, factor, spec), None

    init = table[digits[0]]
    acc, _ = jax.lax.scan(step, init, jnp.asarray(digits[1:]))
    return acc


@functools.partial(jax.jit, static_argnums=1)
def inv(a, spec: FieldSpec):
    """Fermat inversion a^(p-2); returns 0 for input 0 (like reference's
    batch-invert convention of skipping zeros)."""
    out = pow_const(a, spec.modulus - 2, spec)
    return select(is_zero(a), zeros_like(a), out)


@functools.partial(jax.jit, static_argnums=(1, 2))
def batch_inv(a, spec: FieldSpec, axis: int = 0):
    """Montgomery-trick batch inversion along `axis`.

    Zeros are passed through as zeros (mirrors util/arithmetic.rs:47-69).
    Cost: 2 associative scans (log-depth) + 1 inversion + 2 muls/element.
    """
    a = jnp.moveaxis(a, axis, 0)
    zero_mask = is_zero(a)
    safe = select(zero_mask, ones(a.shape[:-1], spec), a)

    def combine(x, y):
        return mont_mul(x, y, spec)

    prefix = jax.lax.associative_scan(combine, safe, axis=0)
    total_inv = inv(prefix[-1], spec)
    suffix = jax.lax.associative_scan(combine, safe, axis=0, reverse=True)
    n = a.shape[0]
    one = ones(a.shape[1:-1], spec)
    # inv(a_i) = total_inv * prefix[i-1] * suffix[i+1]
    pre = jnp.concatenate([one[None], prefix[:-1]], axis=0)
    suf = jnp.concatenate([suffix[1:], one[None]], axis=0)
    out = mont_mul(mont_mul(pre, suf, spec), jnp.broadcast_to(total_inv, a.shape), spec)
    out = select(zero_mask, zeros_like(out), out)
    return jnp.moveaxis(out, 0, axis)


def sum_products(pairs, spec: FieldSpec):
    """sum_i a_i * b_i  for a list of (a, b) limb arrays."""
    acc = None
    for x, y in pairs:
        t = mont_mul(x, y, spec)
        acc = t if acc is None else add(acc, t, spec)
    return acc
