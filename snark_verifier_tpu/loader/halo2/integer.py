"""Non-native Fq arithmetic in an Fr circuit: the integer gadget.

The role halo2_wrong's integer chip plays behind the reference's EccChip
(loader/halo2/shim.rs:161-472 delegates to external Integer/Ecc chips): a
base-field element is 4 x 68-bit limbs (same LIMBS/BITS split as the
accumulator encoding, pcs/kzg/accumulator.rs:36-83), every limb
range-checked by lookup.  Additions are lazy (native limb-wise sums with
max-value bookkeeping); any bilinear identity

    sum coeff_i * u_i * v_i + sum coeff_j * x_j + const  ==  0   (mod p)

is enforced by `constrain_zero_mod_p`: witness an offset quotient, balance
the 68-bit schoolbook columns with offset carry witnesses, range-check
everything.  Soundness rests on magnitude bounds: every column value and
carry stays far below the native modulus, so the native row constraints
pin the exact integer identity.

All rows go through the MainGateChip, so synthesized circuits prove with
the unmodified host prover.
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.loader.halo2.shim import AssignedInteger, Context
from snark_verifier_tpu.util import bn254

LIMBS = 4
BITS = 68
R = bn254.R
_MASK = (1 << BITS) - 1


def to_limbs(value: int, n=LIMBS, bits=BITS):
    mask = (1 << bits) - 1
    return [(value >> (bits * i)) & mask for i in range(n)]


def from_limbs(limbs, bits=BITS):
    return sum(v << (bits * i) for i, v in enumerate(limbs))


@dataclass
class Integer:
    """A non-native value: limb cells + exclusive per-limb upper bounds."""

    limbs: list  # [AssignedInteger]
    max_limb: list  # [int] bounds the range checks actually enforce

    @property
    def value(self) -> int:
        return from_limbs([l.value for l in self.limbs])


class IntegerChip:
    def __init__(self, scalar_chip, p: int = bn254.P):
        self.gate = scalar_chip
        self.p = p
        self.p_limbs = to_limbs(p)
        self.top_bits = self.p_limbs[LIMBS - 1].bit_length()

    # -- range plumbing -------------------------------------------------------

    def range_check(self, ctx: Context, cell: AssignedInteger, bits: int):
        """Constrain cell < 2^bits via chunked lookups (chunk width =
        builder.range_bits; a narrower top chunk is checked both raw and
        shifted so partial widths stay exact)."""
        b = ctx.builder
        w = b.range_bits
        assert w > 0, "builder needs a range table for non-native arithmetic"
        value = cell.value
        assert value < (1 << bits), f"witness {value} exceeds {bits} bits"
        terms, shift, v, rest = [], 0, value, bits
        while rest > 0:
            take = min(w, rest)
            c = v & ((1 << take) - 1)
            v >>= take
            cc = b.range_cell(c)
            if take < w:
                shifted = c << (w - take)
                sc = b.range_cell(shifted)
                b.new_row(
                    qa=1 << (w - take), qb=-1, a=c, b=shifted,
                    copy_a=cc, copy_b=sc,
                )
            terms.append((1 << shift, AssignedInteger(cc, c)))
            shift += take
            rest -= take
        recomposed = self.gate.sum_with_coeff_and_const(ctx, terms, 0)
        ctx.constrain_equal(recomposed.cell, cell.cell)

    def _ranged_witness(self, ctx, value: int, bits: int) -> AssignedInteger:
        cell = self.gate.assign_integer(ctx, value)
        self.range_check(ctx, cell, bits)
        return cell

    # -- assignment -----------------------------------------------------------

    def assign(self, ctx, value: int) -> Integer:
        """Witness a base-field value < 2^(3*68 + top_bits) (canonical when
        the prover is honest; soundness only needs the bound)."""
        value %= self.p
        widths = [BITS] * (LIMBS - 1) + [self.top_bits]
        limbs = [
            self._ranged_witness(ctx, lv, wd)
            for lv, wd in zip(to_limbs(value), widths)
        ]
        return Integer(limbs, [1 << wd for wd in widths])

    def assign_constant(self, ctx, value: int) -> Integer:
        value %= self.p
        limbs = [self.gate.assign_constant(ctx, lv) for lv in to_limbs(value)]
        return Integer(limbs, [lv + 1 for lv in to_limbs(value)])

    # -- lazy linear ops --------------------------------------------------------

    def add(self, ctx, a: Integer, b: Integer) -> Integer:
        limbs = [
            self.gate.sum_with_coeff_and_const(ctx, [(1, x), (1, y)], 0)
            for x, y in zip(a.limbs, b.limbs)
        ]
        out = Integer(limbs, [x + y for x, y in zip(a.max_limb, b.max_limb)])
        return self._maybe_reduce(ctx, out)

    def sub(self, ctx, a: Integer, b: Integer) -> Integer:
        """a - b + S where S is a multiple of p whose limbs dominate b's
        bounds, keeping limb witnesses non-negative."""
        shift = self._dominating_multiple(b.max_limb)
        limbs = [
            self.gate.sum_with_coeff_and_const(ctx, [(1, x), (-1, y)], s)
            for x, y, s in zip(a.limbs, b.limbs, shift)
        ]
        out = Integer(limbs, [ma + s for ma, s in zip(a.max_limb, shift)])
        return self._maybe_reduce(ctx, out)

    def neg(self, ctx, b: Integer) -> Integer:
        shift = self._dominating_multiple(b.max_limb)
        limbs = [
            self.gate.sum_with_coeff_and_const(ctx, [(-1, y)], s)
            for y, s in zip(b.limbs, shift)
        ]
        out = Integer(limbs, list(shift))
        return self._maybe_reduce(ctx, out)

    def _dominating_multiple(self, b_max):
        """Limbs of 2^t * p, with 2^BITS units borrowed downward so every
        limb dominates the matching bound in b_max."""
        t = 2
        while any((pl << t) < mb + (1 << BITS) for pl, mb in zip(self.p_limbs, b_max)):
            t += 1
        s = [pl << t for pl in self.p_limbs]
        for i in range(LIMBS - 1):
            while s[i] < b_max[i]:
                s[i] += 1 << BITS
                s[i + 1] -= 1
        assert all(si >= mb for si, mb in zip(s, b_max)) and min(s) >= 0
        assert from_limbs(s) % self.p == 0
        return s

    def mul_small(self, ctx, a: Integer, k: int) -> Integer:
        assert k >= 0
        limbs = [
            self.gate.sum_with_coeff_and_const(ctx, [(k, x)], 0) for x in a.limbs
        ]
        out = Integer(limbs, [m * k for m in a.max_limb])
        return self._maybe_reduce(ctx, out)

    def _maybe_reduce(self, ctx, a: Integer) -> Integer:
        if max(a.max_limb) >= (1 << (BITS + 10)):
            return self.reduce(ctx, a)
        return a

    # -- reductions built on the identity gadget --------------------------------

    def reduce(self, ctx, a: Integer) -> Integer:
        r = self.assign(ctx, a.value % self.p)
        self.constrain_zero_mod_p(ctx, [], [(1, a), (-1, r)])
        return r

    def mul(self, ctx, a: Integer, b: Integer) -> Integer:
        r = self.assign(ctx, a.value * b.value % self.p)
        self.constrain_zero_mod_p(ctx, [(1, a, b)], [(-1, r)])
        return r

    def invert(self, ctx, a: Integer) -> Integer:
        """1/a witnessed; a * w == 1 (mod p) — unsatisfiable for a == 0."""
        w = self.assign(ctx, bn254.inv_mod(a.value % self.p, self.p) if a.value % self.p else 0)
        self.constrain_zero_mod_p(ctx, [(1, a, w)], [], const=-1)
        return w

    def assert_equal(self, ctx, a: Integer, b: Integer):
        self.constrain_zero_mod_p(ctx, [], [(1, a), (-1, b)])

    def normalize(self, ctx, a: Integer) -> Integer:
        """Strictly canonical form: r == a (mod p) and r < p (the exposure
        path — instance limbs must match the native pre-pass exactly)."""
        r = self.assign(ctx, a.value % self.p)
        self.constrain_zero_mod_p(ctx, [], [(1, a), (-1, r)])
        # r <= p-1 via an exact (quotient-free) integer identity
        d = self.assign(ctx, (self.p - 1) - (a.value % self.p))
        self._constrain_zero_exact(ctx, [(1, r), (1, d)], const=-(self.p - 1))
        return r

    # -- the core column-balance gadget -----------------------------------------

    def constrain_zero_mod_p(self, ctx, products, linears, const: int = 0):
        """sum c*u*v + sum c*x + const == 0 (mod p), exactly.

        Witnesses the offset quotient q' = q + 2^Q with q = value/p, folds
        -q'*p + 2^Q*p + const into per-column constants, and balances each
        68-bit column with offset carries.  All magnitudes are bounded by
        the operands' tracked limb bounds, far below the native modulus, so
        the native row equations pin the exact integer identity."""
        val = (
            sum(c * u.value * v.value for c, u, v in products)
            + sum(c * x.value for c, x in linears)
            + const
        )
        assert val % self.p == 0, "identity does not hold on the witness"
        q = val // self.p

        # magnitude bound decides the quotient offset
        bound = abs(const)
        for c, u, v in products:
            bound += abs(c) * from_limbs(u.max_limb) * from_limbs(v.max_limb)
        for c, x in linears:
            bound += abs(c) * from_limbs(x.max_limb)
        Q = (bound // self.p).bit_length() + 1
        q_off = q + (1 << Q)
        assert 0 <= q_off < (1 << (Q + 2))
        nq = -(-(Q + 2) // BITS)
        q_limbs = [
            self._ranged_witness(ctx, (q_off >> (BITS * i)) & _MASK, BITS)
            for i in range(nq)
        ]

        # constants: 2^Q * p + const, decomposed into non-negative columns
        k_total = (1 << Q) * self.p + const
        assert k_total >= 0
        ncols = max(
            2 * LIMBS - 1,
            nq + LIMBS - 1,
            -(-(k_total.bit_length() or 1) // BITS),
        )
        k_cols = [(k_total >> (BITS * k)) & _MASK for k in range(ncols)]
        assert from_limbs(k_cols, BITS) == k_total, "constant overflow"

        self._balance_columns(ctx, products, linears, q_limbs, k_cols, ncols)

    def _constrain_zero_exact(self, ctx, linears, const: int = 0):
        """sum c*x + const == 0 as INTEGERS (no quotient term)."""
        val = sum(c * x.value for c, x in linears) + const
        assert val == 0
        neg = -const if const < 0 else 0
        pos = const if const > 0 else 0
        ncols = max(
            LIMBS,
            -(-(max(neg, pos).bit_length() or 1) // BITS),
        )
        k_cols = [(pos >> (BITS * k)) & _MASK for k in range(ncols)]
        # negative consts ride through the carry offsets via signed columns:
        # fold -neg into column constants directly (columns accept negatives)
        if neg:
            k_cols = [k_cols[k] - ((neg >> (BITS * k)) & _MASK) for k in range(ncols)]
        self._balance_columns(ctx, [], linears, [], k_cols, ncols)

    def _balance_columns(self, ctx, products, linears, q_limbs, k_cols, ncols):
        carry_cell, carry_val, carry_bits_prev = None, 0, 0
        for k in range(ncols):
            prod_terms, lin_terms = [], []
            col_const = k_cols[k]
            col_bound = abs(col_const)
            for c, u, v in products:
                for i in range(LIMBS):
                    j = k - i
                    if 0 <= j < LIMBS:
                        prod_terms.append((c, u.limbs[i], v.limbs[j]))
                        col_bound += abs(c) * u.max_limb[i] * v.max_limb[j]
            for c, x in linears:
                if k < len(x.limbs):
                    lin_terms.append((c, x.limbs[k]))
                    col_bound += abs(c) * x.max_limb[k]
            for i, ql in enumerate(q_limbs):
                j = k - i
                if 0 <= j < LIMBS and self.p_limbs[j]:
                    lin_terms.append((-self.p_limbs[j], ql))
                    col_bound += self.p_limbs[j] << BITS

            # witness column value
            cv = col_const
            for c, u, v in prod_terms:
                cv += c * u.value * v.value
            for c, x in lin_terms:
                cv += c * x.value
            total = cv + carry_val
            assert total % (1 << BITS) == 0, f"column {k} does not balance"
            new_carry = total >> BITS

            if k == ncols - 1:
                # last column: total must be exactly zero
                assert new_carry == 0, "nonzero final carry"
                terms = list(lin_terms)
                const = col_const
                if carry_cell is not None:
                    terms.append((1, carry_cell))
                    const -= 1 << carry_bits_prev
                if prod_terms:
                    s = self.gate.sum_products_with_coeff_and_const(
                        ctx, prod_terms, 0
                    )
                    terms.append((1, s))
                out = self.gate.sum_with_coeff_and_const(ctx, terms, const)
                zero = self.gate.assign_constant(ctx, 0)
                self.gate.assert_equal(ctx, out, zero)
                return

            carry_mag = col_bound + (1 << carry_bits_prev if carry_cell is not None else 0)
            carry_bits = max(((carry_mag >> BITS) + 1).bit_length() + 1, 2)
            w = self._ranged_witness(
                ctx, new_carry + (1 << carry_bits), carry_bits + 1
            )
            # col + (carry_prev - 2^prev) - (w - 2^bits)*2^68 == 0
            terms = list(lin_terms)
            const = col_const + ((1 << carry_bits) << BITS)
            terms.append((-(1 << BITS), w))
            if carry_cell is not None:
                terms.append((1, carry_cell))
                const -= 1 << carry_bits_prev
            if prod_terms:
                s = self.gate.sum_products_with_coeff_and_const(ctx, prod_terms, 0)
                terms.append((1, s))
            out = self.gate.sum_with_coeff_and_const(ctx, terms, const)
            zero = self.gate.assign_constant(ctx, 0)
            self.gate.assert_equal(ctx, out, zero)
            carry_cell, carry_val, carry_bits_prev = w, new_carry, carry_bits
