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
