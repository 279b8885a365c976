"""Non-native Fq arithmetic in an Fr circuit: the integer gadget.

The role halo2_wrong's integer chip plays behind the reference's EccChip
(loader/halo2/shim.rs:161-472 delegates to external Integer/Ecc chips): a
base-field element is 4 x 68-bit limbs (same LIMBS/BITS split as the
accumulator encoding, pcs/kzg/accumulator.rs:36-83), every limb
range-checked by lookup.  Additions are lazy (native limb-wise sums with
max-value bookkeeping); any bilinear identity

    sum coeff_i * u_i * v_i + sum coeff_j * x_j + const  ==  0   (mod p)

is enforced by `constrain_zero_mod_p` via the CRT decomposition that
halo2_wrong's integer chip uses: witness an offset quotient q' and check

    E + 2^Q*p - q'*p  ==  0   (mod r)        [native check on recomposed
                                              values, 2^68-weighted folds]
    E + 2^Q*p - q'*p  ==  0   (mod 2^272)    [two 136-bit column groups of
                                              schoolbook partial products
                                              with range-checked carries]

Both congruences with |value| < r * 2^272 pin the exact integer identity
(r odd), so E == 0 (mod p).  Magnitude bookkeeping: every Integer tracks
exclusive per-limb bounds; product operands are auto-reduced below 2^257 so
the CRT bound and the in-field group equations (each < r/2) stay sound.

Range checks are FUSED decompose-and-fold rows: each row both looks up its
a-cell in the range table (q_range = 1) and accumulates it into the running
recomposition, so a 68-bit check costs ceil(68/range_bits) rows (+2 for a
partial-width top chunk, checked raw and shifted).

All rows go through the MainGateChip, so synthesized circuits prove with
the unmodified host prover.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from snark_verifier_tpu.loader.halo2.shim import AssignedInteger, Context
from snark_verifier_tpu.util import bn254

LIMBS = 4
BITS = 68
R = bn254.R
_MASK = (1 << BITS) - 1
GROUP_BITS = 2 * BITS  # 136: two limb columns per binary group
T_BITS = 2 * GROUP_BITS  # 272: the binary modulus of the CRT check
# product operands above this magnitude are reduced first (keeps the CRT
# bound far under r * 2^272 and group equations far under r)
_OPERAND_CAP = 1 << 257


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
    nat: AssignedInteger | None = field(default=None, compare=False)
    # cached native recomposition sum(limb_i * 2^(68 i)) mod r

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

    def ranged_witness(self, ctx: Context, value: int, bits: int) -> AssignedInteger:
        """Witness value < 2^bits via fused decompose-and-fold rows: each row
        range-checks its chunk (lookup on the a-cell) AND accumulates it, so
        the final fold cell IS the value cell — no separate recomposition."""
        from snark_verifier_tpu.loader.halo2.builder import Cell

        b = ctx.builder
        w = b.range_bits
        assert w > 0, "builder needs a range table for non-native arithmetic"
        assert 0 <= value < (1 << bits), f"witness {value} exceeds {bits} bits"

        chunks, v, rest = [], value, bits
        while rest > 0:
            take = min(w, rest)
            chunks.append((v & ((1 << take) - 1), take))
            v >>= take
            rest -= take
        if not chunks:
            chunks = [(0, 1)]

        def chunk_cell(c, take):
            """A cell holding c, constrained < 2^take (partial widths check
            the raw and shifted value on two fused rows)."""
            if take == w:
                return None  # full chunk: fold row itself carries the lookup
            shifted = c << (w - take)
            r1 = b.new_row(a=shifted, range_a=True)
            r2 = b.new_row(
                qa=1 << (w - take), qb=-1, a=c, b=shifted,
                copy_b=Cell(0, r1), range_a=True,
            )
            return Cell(0, r2)

        if len(chunks) == 1:
            c, take = chunks[0]
            cell = chunk_cell(c, take)
            if cell is None:
                row = b.new_row(a=c, range_a=True)
                cell = Cell(0, row)
            return AssignedInteger(cell, value)

        # two chunks per fold row: chunk 2i range-checked on the a-wire,
        # chunk 2i+1 on the b-wire (second lookup argument), accumulator on
        # d/e — a full 68-bit limb costs 2 rows
        acc_val, acc_cell, shift = 0, None, 0
        for i in range(0, len(chunks), 2):
            pair = chunks[i : i + 2]
            kw = {}
            new_val = acc_val
            for (c, take), slot, flag in zip(
                pair, ("a", "b"), ("range_a", "range_b")
            ):
                pre = chunk_cell(c, take)
                kw[f"q{slot}"] = (1 << shift) % R
                kw[slot] = c
                if pre is not None:
                    kw[f"copy_{slot}"] = pre
                else:
                    kw[flag] = True
                new_val = (new_val + (c << shift)) % R
                shift += take
            kw.update(qe=-1, e=new_val)
            if acc_cell is not None:
                kw.update(qd=1, d=acc_val, copy_d=acc_cell)
            row = b.new_row(**kw)
            acc_cell, acc_val = Cell(4, row), new_val
        return AssignedInteger(acc_cell, value)

    def range_check(self, ctx: Context, cell: AssignedInteger, bits: int):
        """Constrain an EXISTING cell < 2^bits (fused chain + one copy)."""
        w = self.ranged_witness(ctx, cell.value, bits)
        ctx.constrain_equal(w.cell, cell.cell)

    # -- native recomposition ---------------------------------------------------

    def native_of(self, ctx, x: Integer) -> AssignedInteger:
        """sum limb_i * 2^(68 i) mod r as one cell, cached on the Integer
        (every CRT constraint an Integer appears in reuses it)."""
        if x.nat is None:
            x.nat = self.gate.sum_with_coeff_and_const(
                ctx,
                [(pow(2, BITS * i, R), l) for i, l in enumerate(x.limbs)],
                0,
            )
        return x.nat

    # -- assignment -----------------------------------------------------------

    def assign(self, ctx, value: int) -> Integer:
        """Witness a base-field value < 2^(3*68 + top_bits) (canonical when
        the prover is honest; soundness only needs the bound)."""
        value %= self.p
        widths = [BITS] * (LIMBS - 1) + [self.top_bits]
        limbs = [
            self.ranged_witness(ctx, lv, wd)
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

    def _cap_operand(self, ctx, a: Integer) -> Integer:
        if from_limbs(a.max_limb) >= _OPERAND_CAP:
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

    # -- the core CRT gadget ------------------------------------------------------

    def constrain_zero_mod_p(self, ctx, products, linears, const: int = 0):
        """sum c*u*v + sum c*x + const == 0 (mod p), exactly.

        Witnesses the offset quotient q' = q + 2^Q with q = value/p, then
        checks V = E + 2^Q*p - q'*p == 0 both mod r (native check over the
        cached limb recompositions) and mod 2^272 (two 136-bit column
        groups of schoolbook partial products with offset range-checked
        carries).  |V| < r*2^272/2 (asserted from the tracked bounds), so
        the two congruences pin V == 0 as an integer."""
        products = [
            (c, self._cap_operand(ctx, u), self._cap_operand(ctx, v))
            for c, u, v in products
        ]
        val = (
            sum(c * u.value * v.value for c, u, v in products)
            + sum(c * x.value for c, x in linears)
            + const
        )
        assert val % self.p == 0, "identity does not hold on the witness"
        q = val // self.p

        bound = abs(const)
        for c, u, v in products:
            bound += abs(c) * from_limbs(u.max_limb) * from_limbs(v.max_limb)
        for c, x in linears:
            bound += abs(c) * from_limbs(x.max_limb)
        Q = (bound // self.p).bit_length() + 1
        q_off = q + (1 << Q)
        assert 0 <= q_off < (1 << (Q + 2))
        # CRT soundness: |V| must stay below r * 2^272 (with margin)
        assert bound + (1 << (Q + 2)) * self.p < (R << T_BITS) // 2, (
            "operand bounds too large for the CRT check"
        )
        nq = -(-(Q + 2) // BITS)
        q_widths = [BITS] * (nq - 1) + [Q + 2 - BITS * (nq - 1)]
        q_limbs = [
            self.ranged_witness(ctx, (q_off >> (BITS * i)) & _MASK, wd)
            for i, wd in enumerate(q_widths)
        ]

        k_total = (1 << Q) * self.p + const
        assert k_total >= 0, "constant dominates the quotient offset"

        # ---- native check: E + k_total - q'*p == 0 (mod r) -----------------
        nat_prods = [
            (c, self.native_of(ctx, u), self.native_of(ctx, v))
            for c, u, v in products
        ]
        nat_lins = [(c, self.native_of(ctx, x)) for c, x in linears]
        q_nat = self.gate.sum_with_coeff_and_const(
            ctx,
            [(pow(2, BITS * i, R), ql) for i, ql in enumerate(q_limbs)],
            0,
        )
        nat_lins.append((-self.p, q_nat))
        self.gate.assert_zero_sum(ctx, nat_prods, nat_lins, k_total)

        # ---- binary check: two 136-bit column groups mod 2^272 -------------
        carry_cell, carry_val, carry_bits_prev = None, 0, 0
        for g in (0, 1):
            base = 2 * g
            prod_terms, lin_terms = [], []
            gconst = (k_total >> (BITS * base)) & ((1 << GROUP_BITS) - 1)
            gbound = gconst
            gval = gconst
            for c, u, v in products:
                for i in range(LIMBS):
                    for j in range(LIMBS):
                        k = i + j
                        if base <= k <= base + 1:
                            wgt = 1 << (BITS * (k - base))
                            prod_terms.append((c * wgt, u.limbs[i], v.limbs[j]))
                            gbound += abs(c) * wgt * u.max_limb[i] * v.max_limb[j]
                            gval += c * wgt * u.limbs[i].value * v.limbs[j].value
            for c, x in linears:
                for k in (base, base + 1):
                    if k < len(x.limbs):
                        wgt = 1 << (BITS * (k - base))
                        lin_terms.append((c * wgt, x.limbs[k]))
                        gbound += abs(c) * wgt * x.max_limb[k]
                        gval += c * wgt * x.limbs[k].value
            for i, (ql, wd) in enumerate(zip(q_limbs, q_widths)):
                for k in (base, base + 1):
                    j = k - i
                    if 0 <= j < LIMBS and self.p_limbs[j]:
                        wgt = 1 << (BITS * (k - base))
                        lin_terms.append((-self.p_limbs[j] * wgt, ql))
                        gbound += self.p_limbs[j] * wgt * (1 << wd)
                        gval += -self.p_limbs[j] * wgt * ql.value
            if carry_cell is not None:
                lin_terms.append((1, carry_cell))
                gconst -= 1 << carry_bits_prev
                gbound += 1 << (carry_bits_prev + 1)
                gval += carry_val

            assert gval % (1 << GROUP_BITS) == 0, f"group {g} does not balance"
            new_carry = gval >> GROUP_BITS
            carry_bits = max(((gbound >> GROUP_BITS) + 1).bit_length() + 1, 2)
            assert abs(new_carry) < (1 << carry_bits)
            w = self.ranged_witness(
                ctx, new_carry + (1 << carry_bits), carry_bits + 1
            )
            lin_terms.append((-(1 << GROUP_BITS), w))
            gconst += 1 << (carry_bits + GROUP_BITS)
            gbound += 1 << (carry_bits + 1 + GROUP_BITS)
            # the in-field equation must pin the exact integer relation
            assert gbound < R // 2, "group magnitude reaches the native modulus"
            self.gate.assert_zero_sum(ctx, prod_terms, lin_terms, gconst)
            carry_cell, carry_val, carry_bits_prev = w, new_carry, carry_bits

    def _constrain_zero_exact(self, ctx, linears, const: int = 0):
        """sum c*x + const == 0 as INTEGERS (no quotient term): 136-bit
        column groups with a REQUIRED-zero final carry."""
        val = sum(c * x.value for c, x in linears) + const
        assert val == 0
        ncols = max(len(x.limbs) for _, x in linears) if linears else LIMBS
        ngroups = -(-ncols // 2)
        carry_cell, carry_val, carry_bits_prev = None, 0, 0
        for g in range(ngroups):
            base = 2 * g
            lin_terms = []
            # const = sum_g gconst_g * 2^(136 g): masked non-negative low
            # groups, signed floor-shifted high remainder in the last group
            if g == ngroups - 1:
                gconst = const >> (BITS * base)
            else:
                gconst = (const >> (BITS * base)) & ((1 << GROUP_BITS) - 1)
            gbound = abs(gconst)
            gval = gconst
            for c, x in linears:
                for k in (base, base + 1):
                    if k < len(x.limbs):
                        wgt = 1 << (BITS * (k - base))
                        lin_terms.append((c * wgt, x.limbs[k]))
                        gbound += abs(c) * wgt * x.max_limb[k]
                        gval += c * wgt * x.limbs[k].value
            if carry_cell is not None:
                lin_terms.append((1, carry_cell))
                gconst -= 1 << carry_bits_prev
                gbound += 1 << (carry_bits_prev + 1)
                gval += carry_val
            if g == ngroups - 1:
                assert gval == 0, "nonzero final group"
                assert gbound < R // 2
                self.gate.assert_zero_sum(ctx, [], lin_terms, gconst)
                return
            assert gval % (1 << GROUP_BITS) == 0, f"group {g} does not balance"
            new_carry = gval >> GROUP_BITS
            carry_bits = max(((gbound >> GROUP_BITS) + 1).bit_length() + 1, 2)
            assert abs(new_carry) < (1 << carry_bits)
            w = self.ranged_witness(
                ctx, new_carry + (1 << carry_bits), carry_bits + 1
            )
            lin_terms.append((-(1 << GROUP_BITS), w))
            gconst += 1 << (carry_bits + GROUP_BITS)
            gbound += 1 << (carry_bits + 1 + GROUP_BITS)
            assert gbound < R // 2
            self.gate.assert_zero_sum(ctx, [], lin_terms, gconst)
            carry_cell, carry_val, carry_bits_prev = w, new_carry, carry_bits
