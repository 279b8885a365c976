"""Host-side polynomial arithmetic over Fr (python ints) for the prover and
protocol tooling.

Counterpart of the reference's `Polynomial` (util/poly.rs:15-185) plus the
NTT/coset machinery its prover gets from halo2.  Performance is irrelevant
here (the prover only generates test vectors / aggregation pre-passes);
device-side polynomial work lives in ops/.
"""

from __future__ import annotations

from snark_verifier_tpu.util import bn254

R = bn254.R


def _native_ntt_ok(n, modulus):
    import os

    if modulus != R or n < 64 or n & (n - 1):
        return False
    if os.environ.get("SVTPU_NATIVE", "1") == "0":
        return False
    from snark_verifier_tpu.util import native_ec

    return native_ec.available()


def ntt(values, omega, modulus=R):
    """Radix-2 Cooley–Tukey NTT; len(values) power of two.  Routes to the
    native C++ kernel (native/bn254_native.cpp bn254_fr_ntt) for BN254 Fr —
    the host prover's FFT hot loop — with this python path as the
    oracle-of-record (cross-checked in tests/test_native_ec.py)."""
    n = len(values)
    if _native_ntt_ok(n, modulus):
        from snark_verifier_tpu.util import native_ec

        return native_ec.fr_ntt(values, omega % modulus, 1)
    return _ntt_py(values, omega, modulus)


def _ntt_py(values, omega, modulus=R):
    n = len(values)
    if n == 1:
        return list(values)
    assert n & (n - 1) == 0
    even = _ntt_py(values[0::2], omega * omega % modulus, modulus)
    odd = _ntt_py(values[1::2], omega * omega % modulus, modulus)
    out = [0] * n
    w = 1
    for i in range(n // 2):
        t = w * odd[i] % modulus
        out[i] = (even[i] + t) % modulus
        out[i + n // 2] = (even[i] - t) % modulus
        w = w * omega % modulus
    return out


def intt(values, omega, modulus=R):
    n = len(values)
    if _native_ntt_ok(n, modulus):
        from snark_verifier_tpu.util import native_ec

        return native_ec.fr_ntt(
            values, bn254.inv_mod(omega, modulus), bn254.inv_mod(n, modulus)
        )
    out = _ntt_py(values, bn254.inv_mod(omega, modulus), modulus)
    n_inv = bn254.inv_mod(n, modulus)
    return [v * n_inv % modulus for v in out]


def lagrange_to_coeffs(values, domain):
    """Evaluations on the domain -> coefficient form."""
    assert len(values) == domain.n
    return intt(values, domain.gen)


def coeffs_to_lagrange(coeffs, domain):
    assert len(coeffs) == domain.n
    return ntt(coeffs, domain.gen)


def eval_poly(coeffs, x, modulus=R):
    """Horner evaluation (util/poly.rs:63-83 semantics)."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % modulus
    return acc


def _powmul(values, base, modulus=R):
    """values[i] * base^i; native when available."""
    if _native_ntt_ok(len(values), modulus):
        from snark_verifier_tpu.util import native_ec

        return native_ec.fr_powmul(values, base % modulus)
    out = []
    g = 1
    for c in values:
        out.append(c * g % modulus)
        g = g * base % modulus
    return out


def coset_eval(coeffs, extended_k, coset_gen, modulus=R):
    """Evaluate on the coset {coset_gen * w_ext^i} of size 2^extended_k."""
    n_ext = 1 << extended_k
    padded = list(coeffs) + [0] * (n_ext - len(coeffs))
    scaled = _powmul(padded, coset_gen, modulus)
    omega_ext = bn254.root_of_unity(extended_k)
    return ntt(scaled, omega_ext)


def coset_interp(values, extended_k, coset_gen, modulus=R):
    """Inverse of coset_eval: values on the coset -> coefficients."""
    omega_ext = bn254.root_of_unity(extended_k)
    scaled = intt(values, omega_ext)
    return _powmul(scaled, bn254.inv_mod(coset_gen, modulus), modulus)


def poly_add(a, b, modulus=R):
    n = max(len(a), len(b))
    a = list(a) + [0] * (n - len(a))
    b = list(b) + [0] * (n - len(b))
    return [(x + y) % modulus for x, y in zip(a, b)]


def poly_scale(a, k, modulus=R):
    return [x * k % modulus for x in a]


def poly_sub(a, b, modulus=R):
    return poly_add(a, poly_scale(b, modulus - 1, modulus), modulus)


def divide_by_linear(coeffs, a, modulus=R):
    """Divide by (X - a); returns (quotient, remainder) — synthetic division."""
    q = [0] * (len(coeffs) - 1) if len(coeffs) > 1 else []
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (coeffs[i] + acc * a) % modulus
        q[i - 1] = acc
    rem = (coeffs[0] + acc * a) % modulus
    return q, rem


def divide_by_vanishing(coeffs, points, modulus=R):
    """Divide by prod (X - p); asserts exact division."""
    cur = list(coeffs)
    for p in points:
        cur, rem = divide_by_linear(cur, p, modulus)
        assert rem == 0, "polynomial not divisible by vanishing set"
    return cur


def lagrange_interp(points, values, modulus=R):
    """Interpolate the poly through (points[i], values[i]); small sets only."""
    n = len(points)
    out = [0] * n
    for i in range(n):
        # numerator poly prod_{j!=i} (X - x_j), scaled
        num = [1]
        denom = 1
        for j in range(n):
            if j == i:
                continue
            num = poly_mul_linear(num, points[j], modulus)
            denom = denom * (points[i] - points[j]) % modulus
        coeff = values[i] * bn254.inv_mod(denom, modulus) % modulus
        out = poly_add(out, poly_scale(num, coeff, modulus), modulus)
    return out


def poly_mul_linear(coeffs, a, modulus=R):
    """Multiply by (X - a)."""
    out = [0] * (len(coeffs) + 1)
    for i, c in enumerate(coeffs):
        out[i + 1] = (out[i + 1] + c) % modulus
        out[i] = (out[i] - c * a) % modulus
    return out
