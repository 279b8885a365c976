"""MainGateChip: native-Fr IntegerInstructions over the standard-plonk gate.

The role halo2_wrong's MainGate plays behind the reference shim
(loader/halo2/shim.rs:161-300): every scalar operation becomes one or two
rows of  q_a*a + q_b*b + q_c*c + q_ab*a*b + const = 0  with copy
constraints wiring operand cells.  Witness values are tracked alongside so
the loader run doubles as witness generation.
"""

from __future__ import annotations

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
        """acc = constant + sum coeff_i * v_i, one row per term:
        row_i:  qa=coeff, qb=1 (acc so far), qc=-1  ->  c = coeff*a + b."""
        b = ctx.builder
        acc_val = constant % R
        acc_cell = None
        for coeff, v in values:
            coeff %= R
            new_val = (acc_val + coeff * v.value) % R
            if acc_cell is None:
                row = b.new_row(
                    qa=coeff, qc=-1, const=constant, a=v.value, c=new_val,
                    copy_a=v.cell,
                )
            else:
                row = b.new_row(
                    qa=coeff, qb=1, qc=-1, a=v.value, b=acc_val, c=new_val,
                    copy_a=v.cell, copy_b=acc_cell,
                )
            from snark_verifier_tpu.loader.halo2.builder import Cell

            acc_cell, acc_val = Cell(2, row), new_val
        if acc_cell is None:
            return self.assign_constant(ctx, constant)
        return AssignedInteger(acc_cell, acc_val)

    def sum_products_with_coeff_and_const(self, ctx, values, constant: int):
        """acc = constant + sum coeff_i * u_i * v_i; per term one product row
        (qab=coeff, qc=-1) then folds via sum_with_coeff."""
        terms = []
        b = ctx.builder
        from snark_verifier_tpu.loader.halo2.builder import Cell

        for coeff, u, v in values:
            coeff %= R
            t_val = coeff * u.value % R * v.value % R
            row = b.new_row(
                qab=coeff, qc=-1, a=u.value, b=v.value, c=t_val,
                copy_a=u.cell, copy_b=v.cell,
            )
            terms.append(AssignedInteger(Cell(2, row), t_val))
        if len(terms) == 1 and constant % R == 0:
            return terms[0]
        return self.sum_with_coeff_and_const(
            ctx, [(1, t) for t in terms], constant
        )

    def assert_zero_sum(self, ctx, prod_terms, lin_terms, constant: int):
        """sum c*u*v + sum c*x + constant == 0 (mod r) WITHOUT materializing
        a result cell: one product row per product term, then one accumulate
        chain whose final row has no output column — saves the result cell +
        zero-constant + copy of the assert-via-cell pattern."""
        from snark_verifier_tpu.loader.halo2.builder import Cell

        b = ctx.builder
        R_ = R
        terms = []
        for coeff, u, v in prod_terms:
            coeff %= R_
            t_val = coeff * u.value % R_ * v.value % R_
            row = b.new_row(
                qab=coeff, qc=-1, a=u.value, b=v.value, c=t_val,
                copy_a=u.cell, copy_b=v.cell,
            )
            terms.append((1, AssignedInteger(Cell(2, row), t_val)))
        terms += [(c % R_, x) for c, x in lin_terms]
        const = constant % R_
        if not terms:
            assert const == 0, "constant-only zero sum is nonzero"
            return
        if len(terms) == 1:
            c0, x0 = terms[0]
            assert (c0 * x0.value + const) % R_ == 0
            b.new_row(qa=c0, const=const, a=x0.value, copy_a=x0.cell)
            return
        acc_val, acc_cell = const, None
        for coeff, x in terms[:-1]:
            new_val = (acc_val + coeff * x.value) % R_
            if acc_cell is None:
                row = b.new_row(
                    qa=coeff, qc=-1, const=const, a=x.value, c=new_val,
                    copy_a=x.cell,
                )
            else:
                row = b.new_row(
                    qa=coeff, qb=1, qc=-1, a=x.value, b=acc_val, c=new_val,
                    copy_a=x.cell, copy_b=acc_cell,
                )
            acc_cell, acc_val = Cell(2, row), new_val
        cl, xl = terms[-1]
        assert (cl * xl.value + acc_val) % R_ == 0
        b.new_row(
            qa=cl, qb=1, a=xl.value, b=acc_val, copy_a=xl.cell, copy_b=acc_cell
        )

    def sub(self, ctx, lhs, rhs):
        from snark_verifier_tpu.loader.halo2.builder import Cell

        out = (lhs.value - rhs.value) % R
        row = ctx.builder.new_row(
            qa=1, qb=-1, qc=-1, a=lhs.value, b=rhs.value, c=out,
            copy_a=lhs.cell, copy_b=rhs.cell,
        )
        return AssignedInteger(Cell(2, row), out)

    def neg(self, ctx, value):
        from snark_verifier_tpu.loader.halo2.builder import Cell

        out = (-value.value) % R
        row = ctx.builder.new_row(
            qa=-1, qc=-1, a=value.value, c=out, copy_a=value.cell
        )
        return AssignedInteger(Cell(2, row), out)

    def invert(self, ctx, value):
        """w = 1/v witnessed, constrained by v*w - 1 = 0 (so v=0 is
        unsatisfiable, matching shim.rs invert which assumes nonzero)."""
        from snark_verifier_tpu.loader.halo2.builder import Cell

        w = bn254.inv_mod(value.value, R) if value.value else 0
        row = ctx.builder.new_row(
            qab=1, const=-1, a=value.value, b=w, copy_a=value.cell
        )
        return AssignedInteger(Cell(1, row), w)

    def assert_equal(self, ctx, lhs, rhs):
        ctx.constrain_equal(lhs.cell, rhs.cell)
