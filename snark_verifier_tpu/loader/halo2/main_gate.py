"""MainGateChip: native-Fr IntegerInstructions over the 5-wire plonk gate.

The role halo2_wrong's MainGate plays behind the reference shim
(loader/halo2/shim.rs:161-315): every scalar operation becomes rows of

    q_a*a + q_b*b + q_c*c + q_d*d + q_e*e + q_ab*a*b + const = 0

with copy constraints wiring operand cells.  The 5-wire shape enables the
reference's row fusion (shim.rs:231-315): linear accumulate chains fold
THREE fresh terms per row (d carries the running sum in, e carries it out)
and sum-of-products chains fold one product plus the carry per row —
roughly halving the in-circuit verifier's rows vs a 3-wire gate.  Witness
values are tracked alongside so the loader run doubles as witness
generation.
"""

from __future__ import annotations

from snark_verifier_tpu.loader.halo2.builder import Cell
from snark_verifier_tpu.loader.halo2.shim import (
    AssignedInteger,
    Context,
    IntegerInstructions,
)
from snark_verifier_tpu.util import bn254

R = bn254.R


class MainGateChip(IntegerInstructions):
    def assign_integer(self, ctx: Context, value: int) -> AssignedInteger:
        cell = ctx.builder.witness_cell(value)
        return AssignedInteger(cell, value % R)

    def assign_constant(self, ctx: Context, value: int) -> AssignedInteger:
        cell = ctx.builder.constant_cell(value)
        return AssignedInteger(cell, value % R)

    def sum_with_coeff_and_const(self, ctx, values, constant: int):
        """acc = constant + sum coeff_i * v_i: three fresh terms per row,
        the accumulator riding d (in) and e (out)."""
        b = ctx.builder
        values = [(c % R, v) for c, v in values]
        if not values:
            return self.assign_constant(ctx, constant)
        acc_val = constant % R
        acc_cell = None
        first = True
        for i in range(0, len(values), 3):
            group = values[i : i + 3]
            new_val = acc_val
            for coeff, v in group:
                new_val = (new_val + coeff * v.value) % R
            kw = dict(qe=-1, e=new_val)
            slots = ("a", "b", "c")
            for (coeff, v), slot in zip(group, slots):
                kw[f"q{slot}"] = coeff
                kw[slot] = v.value
                kw[f"copy_{slot}"] = v.cell
            if first:
                kw["const"] = constant
                first = False
            if acc_cell is not None:
                kw.update(qd=1, d=acc_val, copy_d=acc_cell)
            row = b.new_row(**kw)
            acc_cell, acc_val = Cell(4, row), new_val
        return AssignedInteger(acc_cell, acc_val)

    def sum_products_with_coeff_and_const(self, ctx, values, constant: int):
        """acc = constant + sum coeff_i * u_i * v_i: ONE row per product
        (q_ab carries the coefficient, a/b the operands, d/e the carry) —
        the shim.rs:231-315 fusion."""
        b = ctx.builder
        if not values:
            return self.assign_constant(ctx, constant)
        acc_val = constant % R
        acc_cell = None
        first = True
        for coeff, u, v in values:
            coeff %= R
            new_val = (acc_val + coeff * u.value % R * v.value) % R
            kw = dict(
                qab=coeff, qe=-1, a=u.value, b=v.value, e=new_val,
                copy_a=u.cell, copy_b=v.cell,
            )
            if first:
                kw["const"] = constant
                first = False
            if acc_cell is not None:
                kw.update(qd=1, d=acc_val, copy_d=acc_cell)
            row = b.new_row(**kw)
            acc_cell, acc_val = Cell(4, row), new_val
        return AssignedInteger(acc_cell, acc_val)

    def assert_zero_sum(self, ctx, prod_terms, lin_terms, constant: int):
        """sum c*u*v + sum c*x + constant == 0 (mod r) WITHOUT materializing
        a result cell: product rows chain through d/e; the linear terms fold
        three per row; the final row closes the chain with no output wire."""
        b = ctx.builder
        R_ = R
        const = constant % R_
        prod_terms = [(c % R_, u, v) for c, u, v in prod_terms]
        lin_terms = [(c % R_, x) for c, x in lin_terms]

        if not prod_terms and not lin_terms:
            assert const == 0, "constant-only zero sum is nonzero"
            return

        acc_val, acc_cell = const, None
        first = True
        # all product terms except possibly the last row's worth
        for j, (coeff, u, v) in enumerate(prod_terms):
            last_row = j == len(prod_terms) - 1 and not lin_terms
            new_val = (acc_val + coeff * u.value % R_ * v.value) % R_
            kw = dict(qab=coeff, a=u.value, b=v.value,
                      copy_a=u.cell, copy_b=v.cell)
            if first:
                kw["const"] = const
                first = False
            if acc_cell is not None:
                kw.update(qd=1, d=acc_val, copy_d=acc_cell)
            if last_row:
                assert new_val == 0, "zero-sum constraint unsatisfied"
                b.new_row(**kw)
                return
            kw.update(qe=-1, e=new_val)
            row = b.new_row(**kw)
            acc_cell, acc_val = Cell(4, row), new_val

        for i in range(0, len(lin_terms), 3):
            group = lin_terms[i : i + 3]
            last_row = i + 3 >= len(lin_terms)
            new_val = acc_val
            for coeff, x in group:
                new_val = (new_val + coeff * x.value) % R_
            kw = {}
            for (coeff, x), slot in zip(group, ("a", "b", "c")):
                kw[f"q{slot}"] = coeff
                kw[slot] = x.value
                kw[f"copy_{slot}"] = x.cell
            if first:
                kw["const"] = const
                first = False
            if acc_cell is not None:
                kw.update(qd=1, d=acc_val, copy_d=acc_cell)
            if last_row:
                assert new_val == 0, "zero-sum constraint unsatisfied"
                b.new_row(**kw)
                return
            kw.update(qe=-1, e=new_val)
            row = b.new_row(**kw)
            acc_cell, acc_val = Cell(4, row), new_val

    def sub(self, ctx, lhs, rhs):
        out = (lhs.value - rhs.value) % R
        row = ctx.builder.new_row(
            qa=1, qb=-1, qc=-1, a=lhs.value, b=rhs.value, c=out,
            copy_a=lhs.cell, copy_b=rhs.cell,
        )
        return AssignedInteger(Cell(2, row), out)

    def neg(self, ctx, value):
        out = (-value.value) % R
        row = ctx.builder.new_row(
            qa=-1, qc=-1, a=value.value, c=out, copy_a=value.cell
        )
        return AssignedInteger(Cell(2, row), out)

    def invert(self, ctx, value):
        """w = 1/v witnessed, constrained by v*w - 1 = 0 (so v=0 is
        unsatisfiable, matching shim.rs invert which assumes nonzero)."""
        w = bn254.inv_mod(value.value, R) if value.value else 0
        row = ctx.builder.new_row(
            qab=1, const=-1, a=value.value, b=w, copy_a=value.cell
        )
        return AssignedInteger(Cell(1, row), w)

    def assert_equal(self, ctx, lhs, rhs):
        ctx.constrain_equal(lhs.cell, rhs.cell)
