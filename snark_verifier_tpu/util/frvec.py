"""FrVec: BN254 scalar-field vectors as numpy u64 Montgomery buffers.

The at-scale host prover (system/halo2/prover_fast.py) keeps every
polynomial in this form end-to-end, calling the threaded native kernels
(native/bn254_native.cpp v2 section) for elementwise ops, batch inversion,
and NTTs — the role halo2's rayon-parallel `Polynomial`/FFT layer plays for
the reference prover (reference util/poly.rs:15-185 + halo2's domain).
Conversions to/from python ints happen only at transcript boundaries.

Requires the native library; callers needing a pure-python path use
util/poly.py (the oracle-of-record — prover_fast output is tested
byte-identical against prover.py's).
"""

from __future__ import annotations

import numpy as np

from snark_verifier_tpu.util import bn254, native_ec

R = bn254.R
_R_MONT = (1 << 256) % R  # Montgomery R for a canonical->Montgomery scale


def _lib():
    lib = native_ec.lib_v2()
    if lib is None:
        raise RuntimeError("native bn254 library unavailable (FrVec needs it)")
    return lib


def _ptr(a):
    return native_ec._ptr(a)


def _mont_const(c: int) -> np.ndarray:
    """A single canonical int -> 4-limb Montgomery buffer."""
    return native_ec._quad(c % R * _R_MONT % R)


class FrVec:
    """A length-n Fr vector; `a` is an (n,4) u64 array in Montgomery form."""

    __slots__ = ("a",)

    def __init__(self, a: np.ndarray):
        assert a.dtype == np.uint64 and a.ndim == 2 and a.shape[1] == 4
        self.a = a

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_ints(cls, values) -> "FrVec":
        arr = native_ec._ints_to_u64([v % R for v in values])
        out = np.empty_like(arr)
        _lib().fr_vec_to_mont(_ptr(out), _ptr(arr), len(values))
        return cls(out)

    @classmethod
    def zeros(cls, n: int) -> "FrVec":
        return cls(np.zeros((n, 4), np.uint64))

    @classmethod
    def full(cls, n: int, c: int) -> "FrVec":
        m = _mont_const(c)
        return cls(np.broadcast_to(m, (n, 4)).copy())

    @classmethod
    def pow_series(cls, base: int, n: int) -> "FrVec":
        """[1, base, base^2, ...] of length n."""
        out = np.empty((n, 4), np.uint64)
        _lib().fr_vec_pow_series(_ptr(out), _ptr(_mont_const(base)), n)
        return cls(out)

    # -- conversions ---------------------------------------------------------

    def to_ints(self) -> list:
        out = np.empty_like(self.a)
        _lib().fr_vec_from_mont(_ptr(out), _ptr(self.a), len(self))
        return native_ec._u64_to_ints(out)

    def to_canonical_u64(self) -> np.ndarray:
        """(n,4) canonical-form u64 array (MSM scalar input)."""
        out = np.empty_like(self.a)
        _lib().fr_vec_from_mont(_ptr(out), _ptr(self.a), len(self))
        return out

    def __len__(self):
        return self.a.shape[0]

    def copy(self) -> "FrVec":
        return FrVec(self.a.copy())

    # -- elementwise ops -----------------------------------------------------

    def __add__(self, other: "FrVec") -> "FrVec":
        out = np.empty_like(self.a)
        _lib().fr_vec_add(_ptr(out), _ptr(self.a), _ptr(other.a), len(self))
        return FrVec(out)

    def __sub__(self, other: "FrVec") -> "FrVec":
        out = np.empty_like(self.a)
        _lib().fr_vec_sub(_ptr(out), _ptr(self.a), _ptr(other.a), len(self))
        return FrVec(out)

    def __mul__(self, other: "FrVec") -> "FrVec":
        out = np.empty_like(self.a)
        _lib().fr_vec_mul(_ptr(out), _ptr(self.a), _ptr(other.a), len(self))
        return FrVec(out)

    def scale(self, c: int) -> "FrVec":
        out = np.empty_like(self.a)
        _lib().fr_vec_scale(_ptr(out), _ptr(self.a), _ptr(_mont_const(c)), len(self))
        return FrVec(out)

    def add_scaled(self, other: "FrVec", c: int) -> "FrVec":
        """self + c * other (fused)."""
        out = np.empty_like(self.a)
        _lib().fr_vec_add_scaled(
            _ptr(out), _ptr(self.a), _ptr(other.a), _ptr(_mont_const(c)), len(self)
        )
        return FrVec(out)

    def neg(self) -> "FrVec":
        return self.scale(R - 1)

    def inv(self) -> "FrVec":
        """Elementwise inverse (batched); zeros map to zero."""
        out = np.empty_like(self.a)
        _lib().fr_vec_inv(_ptr(out), _ptr(self.a), len(self))
        return FrVec(out)

    def prefix_prod(self) -> "FrVec":
        """Inclusive running product."""
        out = np.empty_like(self.a)
        _lib().fr_vec_prefix_prod(_ptr(out), _ptr(self.a), len(self))
        return FrVec(out)

    def rotate(self, r: int) -> "FrVec":
        """Cyclic shift: out[i] = self[(i + r) mod n]."""
        if r % len(self) == 0:
            return self
        return FrVec(np.roll(self.a, -int(r) % len(self), axis=0))

    # -- NTT -----------------------------------------------------------------

    def ntt_inplace(self, omega: int, scale: int = 1):
        n = len(self)
        assert n and n & (n - 1) == 0
        _lib().bn254_fr_ntt_mont(
            _ptr(self.a),
            n.bit_length() - 1,
            _ptr(_mont_const(omega)),
            _ptr(_mont_const(scale)),
        )

    def ntt(self, omega: int, scale: int = 1) -> "FrVec":
        out = self.copy()
        out.ntt_inplace(omega, scale)
        return out

    # -- value access (scalar boundary) ---------------------------------------

    def at(self, i: int) -> int:
        raw = self.a[i : i + 1].copy()
        out = np.empty_like(raw)
        _lib().fr_vec_from_mont(_ptr(out), _ptr(raw), 1)
        return int.from_bytes(out.tobytes(), "little")

    def pad_to(self, n: int) -> "FrVec":
        if n == len(self):
            return self
        assert n > len(self)
        out = np.zeros((n, 4), np.uint64)
        out[: len(self)] = self.a
        return FrVec(out)


def available() -> bool:
    return native_ec.lib_v2() is not None


def horner(coeffs: FrVec, x: int) -> int:
    """Evaluate the coefficient vector at canonical x; canonical result."""
    out = np.empty((1, 4), np.uint64)
    _lib().fr_vec_horner(_ptr(out), _ptr(coeffs.a), len(coeffs), _ptr(_mont_const(x)))
    o = np.empty_like(out)
    _lib().fr_vec_from_mont(_ptr(o), _ptr(out), 1)
    return int.from_bytes(o.tobytes(), "little")


def div_linear(coeffs: FrVec, a: int) -> tuple:
    """Divide by (X - a); returns (quotient FrVec, canonical remainder)."""
    n = len(coeffs)
    q = np.empty((max(n - 1, 1), 4), np.uint64)
    if n == 1:
        q[:] = 0
    rem = np.empty((1, 4), np.uint64)
    _lib().fr_vec_div_linear(
        _ptr(q), _ptr(rem), _ptr(coeffs.a), n, _ptr(_mont_const(a))
    )
    o = np.empty_like(rem)
    _lib().fr_vec_from_mont(_ptr(o), _ptr(rem), 1)
    quot = FrVec(q if n > 1 else np.zeros((1, 4), np.uint64))
    return quot, int.from_bytes(o.tobytes(), "little")
