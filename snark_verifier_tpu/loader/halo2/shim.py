"""Chip shim: the instruction interfaces the Halo2Loader drives.

Mirrors loader/halo2/shim.rs:8-159 — `Context` (equality constraints +
row offset), `IntegerInstructions` (scalar field ops over assigned cells),
`EccInstructions` (EC ops over assigned points).  Concrete chips:
`main_gate.MainGateChip` (native Fr, real standard-plonk constraints) and
`ecc_chip.EccChip` (non-native Fq via 68-bit limbs + range lookups).
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.loader.halo2.builder import Cell, CircuitBuilder


@dataclass
class AssignedInteger:
    """A scalar-field value bound to an advice cell (shim.rs AssignedCell)."""

    cell: Cell
    value: int  # witness value, python int


class Context:
    """Region context: owns the builder (shim.rs:9-15)."""

    def __init__(self, builder: CircuitBuilder):
        self.builder = builder

    def constrain_equal(self, lhs: Cell, rhs: Cell):
        self.builder.copy(lhs, rhs)

    def offset(self) -> int:
        return len(self.builder.rows)


class IntegerInstructions:
    """Scalar-field instruction set (shim.rs:17-89)."""

    def assign_integer(self, ctx, value: int) -> AssignedInteger:
        raise NotImplementedError

    def assign_constant(self, ctx, value: int) -> AssignedInteger:
        raise NotImplementedError

    def sum_with_coeff_and_const(self, ctx, values, constant: int) -> AssignedInteger:
        raise NotImplementedError

    def sum_products_with_coeff_and_const(
        self, ctx, values, constant: int
    ) -> AssignedInteger:
        raise NotImplementedError

    def sub(self, ctx, lhs, rhs) -> AssignedInteger:
        raise NotImplementedError

    def neg(self, ctx, value) -> AssignedInteger:
        raise NotImplementedError

    def invert(self, ctx, value) -> AssignedInteger:
        raise NotImplementedError

    def assert_equal(self, ctx, lhs, rhs):
        raise NotImplementedError


class EccInstructions:
    """EC instruction set (shim.rs:91-160)."""

    def scalar_chip(self) -> IntegerInstructions:
        raise NotImplementedError

    def assign_constant(self, ctx, point):
        raise NotImplementedError

    def assign_point(self, ctx, point):
        raise NotImplementedError

    def sum_with_const(self, ctx, points, constant):
        raise NotImplementedError

    def fixed_base_msm(self, ctx, pairs):
        raise NotImplementedError

    def variable_base_msm(self, ctx, pairs):
        raise NotImplementedError

    def assert_equal(self, ctx, lhs, rhs):
        raise NotImplementedError
