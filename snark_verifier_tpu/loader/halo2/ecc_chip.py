"""EccChip: non-native BN254 G1 arithmetic in an Fr circuit.

The role halo2_wrong's Ecc chip plays behind the reference shim
(loader/halo2/shim.rs:302-472): affine points with 68-bit-limb coordinates
(IntegerChip), incomplete addition made SOUND by a witnessed inverse
proving x1 != x2, double-and-add MSM over witnessed (boolean-constrained)
scalar bits, started from a nothing-up-my-sleeve auxiliary point whose
doubled tail is subtracted as a constant at the end (the classic aux-offset
trick, keeping intermediate sums away from the incomplete-add failure case
for honest provers while remaining sound against dishonest ones).

Limitations mirrored from the reference chips: points are non-identity, and
an MSM whose true result is the identity is unsatisfiable (the verifier's
accumulator MSMs never are).
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.loader.halo2.integer import Integer, IntegerChip
from snark_verifier_tpu.loader.halo2.main_gate import MainGateChip
from snark_verifier_tpu.loader.halo2.shim import (
    AssignedInteger,
    Context,
    EccInstructions,
)
from snark_verifier_tpu.util import bn254

R = bn254.R
SCALAR_BITS = 254


@dataclass
class AssignedEcPoint:
    x: Integer
    y: Integer

    @property
    def value(self):
        return (self.x.value % bn254.P, self.y.value % bn254.P)


# nothing-up-my-sleeve auxiliary point: hash-derived scalar times the
# generator (any fixed non-identity point works; constant-folded at build)
_AUX_SCALAR = int.from_bytes(b"svtpu/ecc-chip/aux-point/v1", "big") % bn254.R
_AUX = bn254.g1_mul(bn254.G1_GEN, _AUX_SCALAR)


class EccChip(EccInstructions):
    def __init__(self, scalar_chip: MainGateChip | None = None):
        self.gate = scalar_chip or MainGateChip()
        self.integer = IntegerChip(self.gate)

    def scalar_chip(self):
        return self.gate

    # -- assignment -----------------------------------------------------------

    def assign_point(self, ctx: Context, point) -> AssignedEcPoint:
        """Witness an affine point and constrain y^2 == x^3 + 3 (mod p)."""
        assert point is not None, "identity cannot be witnessed (shim parity)"
        x, y = point
        ax = self.integer.assign(ctx, x)
        ay = self.integer.assign(ctx, y)
        xx = self.integer.mul(ctx, ax, ax)
        self.integer.constrain_zero_mod_p(
            ctx, [(1, ay, ay), (-1, xx, ax)], [], const=-bn254.G1_B
        )
        return AssignedEcPoint(ax, ay)

    def assign_constant(self, ctx: Context, point) -> AssignedEcPoint:
        assert point is not None, "identity cannot be a constant point here"
        x, y = point
        return AssignedEcPoint(
            self.integer.assign_constant(ctx, x),
            self.integer.assign_constant(ctx, y),
        )

    def assert_equal(self, ctx, lhs: AssignedEcPoint, rhs: AssignedEcPoint):
        self.integer.assert_equal(ctx, lhs.x, rhs.x)
        self.integer.assert_equal(ctx, lhs.y, rhs.y)

    # -- group law --------------------------------------------------------------

    def add(self, ctx, p1: AssignedEcPoint, p2: AssignedEcPoint) -> AssignedEcPoint:
        """Incomplete affine addition; unsatisfiable when x1 == x2 (the
        witnessed inverse of dx proves distinctness)."""
        ic = self.integer
        P = bn254.P
        x1, y1 = p1.x.value % P, p1.y.value % P
        x2, y2 = p2.x.value % P, p2.y.value % P
        assert x1 != x2, "incomplete addition hit x1 == x2 (aux offset bug?)"
        lam_v = (y2 - y1) * bn254.inv_mod((x2 - x1) % P, P) % P
        x3_v = (lam_v * lam_v - x1 - x2) % P
        y3_v = (lam_v * (x1 - x3_v) - y1) % P

        dx = ic.sub(ctx, p2.x, p1.x)
        dy = ic.sub(ctx, p2.y, p1.y)
        lam = ic.assign(ctx, lam_v)
        ic.constrain_zero_mod_p(ctx, [(1, dx, lam)], [(-1, dy)])
        inv = ic.assign(ctx, bn254.inv_mod((x2 - x1) % P, P))
        ic.constrain_zero_mod_p(ctx, [(1, dx, inv)], [], const=-1)
        x3 = ic.assign(ctx, x3_v)
        ic.constrain_zero_mod_p(
            ctx, [(1, lam, lam)], [(-1, p1.x), (-1, p2.x), (-1, x3)]
        )
        y3 = ic.assign(ctx, y3_v)
        x1_minus_x3 = ic.sub(ctx, p1.x, x3)
        ic.constrain_zero_mod_p(
            ctx, [(1, lam, x1_minus_x3)], [(-1, p1.y), (-1, y3)]
        )
        return AssignedEcPoint(x3, y3)

    def double(self, ctx, p: AssignedEcPoint) -> AssignedEcPoint:
        ic = self.integer
        P = bn254.P
        x1, y1 = p.x.value % P, p.y.value % P
        assert y1 != 0
        lam_v = 3 * x1 * x1 * bn254.inv_mod(2 * y1 % P, P) % P
        x3_v = (lam_v * lam_v - 2 * x1) % P
        y3_v = (lam_v * (x1 - x3_v) - y1) % P

        lam = ic.assign(ctx, lam_v)
        # 2*y*lam - 3*x^2 == 0
        ic.constrain_zero_mod_p(ctx, [(2, p.y, lam), (-3, p.x, p.x)], [])
        x3 = ic.assign(ctx, x3_v)
        ic.constrain_zero_mod_p(
            ctx, [(1, lam, lam)], [(-2, p.x), (-1, x3)]
        )
        y3 = ic.assign(ctx, y3_v)
        x1_minus_x3 = ic.sub(ctx, p.x, x3)
        ic.constrain_zero_mod_p(
            ctx, [(1, lam, x1_minus_x3)], [(-1, p.y), (-1, y3)]
        )
        return AssignedEcPoint(x3, y3)

    def neg(self, ctx, p: AssignedEcPoint) -> AssignedEcPoint:
        return AssignedEcPoint(p.x, self.integer.neg(ctx, p.y))

    # -- selection ----------------------------------------------------------------

    def _select_integer(self, ctx, bit: AssignedInteger, u: Integer, v: Integer):
        """bit ? u : v — per-limb  out = bit*(u - v) + v  (bit is boolean-
        constrained, so the value is exactly one of the operands)."""
        limbs, bounds = [], []
        for ul, vl, ub, vb in zip(u.limbs, v.limbs, u.max_limb, v.max_limb):
            d = self.gate.sum_with_coeff_and_const(ctx, [(1, ul), (-1, vl)], 0)
            out = self.gate.sum_products_with_coeff_and_const(
                ctx, [(1, bit, d)], 0
            )
            out = self.gate.sum_with_coeff_and_const(ctx, [(1, out), (1, vl)], 0)
            # native wrap-around cancels: value is exactly ul or vl
            out.value = ul.value if bit.value else vl.value
            limbs.append(out)
            bounds.append(max(ub, vb))
        return Integer(limbs, bounds)

    def select(self, ctx, bit, p_if, p_else) -> AssignedEcPoint:
        return AssignedEcPoint(
            self._select_integer(ctx, bit, p_if.x, p_else.x),
            self._select_integer(ctx, bit, p_if.y, p_else.y),
        )

    # -- scalar decomposition -------------------------------------------------------

    def scalar_bits(self, ctx, scalar: AssignedInteger, nbits=SCALAR_BITS):
        """Boolean-constrained big-endian-processed bit cells with
        sum b_i 2^i == scalar enforced natively."""
        bits = []
        v = scalar.value
        for i in range(nbits):
            bv = (v >> i) & 1
            cell = self.gate.assign_integer(ctx, bv)
            # b*b - b == 0
            ctx.builder.new_row(
                qab=1, qa=-1, a=bv, b=bv, copy_a=cell.cell, copy_b=cell.cell
            )
            bits.append(AssignedInteger(cell.cell, bv))
        recomposed = self.gate.sum_with_coeff_and_const(
            ctx, [(1 << i, b) for i, b in enumerate(bits)], 0
        )
        self.gate.assert_equal(ctx, recomposed, scalar)
        return bits

    # -- MSM ------------------------------------------------------------------------

    def variable_base_msm(self, ctx, pairs, constant=None) -> AssignedEcPoint:
        """sum scalar_i * P_i (+ constant point): windowed (w=4)
        double-and-add with per-term one-hot table selection and the
        aux-offset trick — ~3x fewer rows than bitwise double-and-add."""
        return self._msm_windowed(ctx, pairs, constant)

    def fixed_base_msm(self, ctx, pairs) -> AssignedEcPoint:
        loaded = [
            (s, self.assign_constant(ctx, pt)) for s, pt in pairs
        ]
        return self._msm_windowed(ctx, loaded, None)

    def msm_bits(self, ctx, pairs, constant, nbits) -> AssignedEcPoint:
        """Bitwise double-and-add variant (kept for small-width tests)."""
        return self._msm(ctx, pairs, constant, nbits)

    def _msm(self, ctx, pairs, constant, nbits) -> AssignedEcPoint:
        all_bits = [self.scalar_bits(ctx, s, nbits) for s, _ in pairs]
        acc = self.assign_constant(ctx, _AUX)
        for bit_idx in range(nbits - 1, -1, -1):
            acc = self.double(ctx, acc)
            for bits, (_, point) in zip(all_bits, pairs):
                summed = self.add(ctx, acc, point)
                acc = self.select(ctx, bits[bit_idx], summed, acc)
        # subtract the doubled-away aux tail: acc -= 2^nbits * AUX
        tail = bn254.g1_mul(_AUX, pow(2, nbits, bn254.R))
        acc = self.add(ctx, acc, self.assign_constant(ctx, bn254.g1_neg(tail)))
        if constant is not None:
            acc = self.add(ctx, acc, self.assign_constant(ctx, constant))
        return acc

    # -- windowed MSM -----------------------------------------------------------

    def _one_hot(self, ctx, bits):
        """2^len(bits) one-hot selectors from boolean cells (products of
        bits/complements, built level-wise — exactly one is 1)."""
        one = self.gate.assign_constant(ctx, 1)
        sel = [one]
        for b in bits:  # LSB-first: index k's bit i = (k >> i) & 1
            not_b = self.gate.sum_with_coeff_and_const(ctx, [(-1, b)], 1)
            nxt = []
            for s in sel:
                nxt.append(
                    self.gate.sum_products_with_coeff_and_const(ctx, [(1, s, not_b)], 0)
                )
            for s in sel:
                nxt.append(
                    self.gate.sum_products_with_coeff_and_const(ctx, [(1, s, b)], 0)
                )
            # ordering: new bit is the HIGH bit -> k = bit*2^level + rest
            sel = nxt
        return sel

    def _select_from_table(self, ctx, sel, table):
        """sum_k sel_k * T[k] per coordinate limb (sel one-hot)."""

        def pick(coords, bounds):
            limbs, out_bounds = [], []
            for li in range(len(coords[0].limbs)):
                terms = [(1, s, ent.limbs[li]) for s, ent in zip(sel, coords)]
                limbs.append(
                    self.gate.sum_products_with_coeff_and_const(ctx, terms, 0)
                )
                out_bounds.append(max(ent.max_limb[li] for ent in coords))
            return Integer(limbs, out_bounds)

        xs = [t.x for t in table]
        ys = [t.y for t in table]
        return AssignedEcPoint(pick(xs, None), pick(ys, None))

    def _msm_windowed(self, ctx, pairs, constant, w: int = 4) -> AssignedEcPoint:
        nbits = ((SCALAR_BITS + w - 1) // w) * w
        nwin = nbits // w
        all_bits = [self.scalar_bits(ctx, s, nbits) for s, _ in pairs]
        # per-term table T[k] = k*P for k=1..2^w-1; T[0] is a dummy (P) whose
        # selection is discarded by the zero-digit select below
        tables = []
        for _, p in pairs:
            t = [p, p, self.double(ctx, p)]
            for k in range(3, 1 << w):
                t.append(self.add(ctx, t[k - 1], p))
            tables.append(t)

        acc = self.assign_constant(ctx, _AUX)
        for win in range(nwin - 1, -1, -1):
            for _ in range(w):
                acc = self.double(ctx, acc)
            for bits, table in zip(all_bits, tables):
                digit_bits = bits[w * win : w * (win + 1)]  # LSB-first
                sel = self._one_hot(ctx, digit_bits)
                chosen = self._select_from_table(ctx, sel, table)
                summed = self.add(ctx, acc, chosen)
                # digit == 0 <=> sel[0] == 1: keep acc
                not_zero = self.gate.sum_with_coeff_and_const(
                    ctx, [(-1, sel[0])], 1
                )
                acc = self.select(ctx, not_zero, summed, acc)
        tail = bn254.g1_mul(_AUX, pow(2, nbits, bn254.R))
        acc = self.add(ctx, acc, self.assign_constant(ctx, bn254.g1_neg(tail)))
        if constant is not None:
            acc = self.add(ctx, acc, self.assign_constant(ctx, constant))
        return acc

    # -- transcript support -----------------------------------------------------------

    def coords_reduced_native(self, ctx, p: AssignedEcPoint):
        """(x mod r, y mod r) as native cells — what the Poseidon transcript
        absorbs (system/halo2/transcript.py common_ec_point).  Coordinates
        are normalized first so the limb encoding is canonical."""
        out = []
        for coord in (p.x, p.y):
            canon = self.integer.normalize(ctx, coord)
            terms = [
                (pow(2, 68 * i, R), l) for i, l in enumerate(canon.limbs)
            ]
            out.append(self.gate.sum_with_coeff_and_const(ctx, terms, 0))
        return out[0], out[1]
