"""Halo2Loader: the in-circuit interpreter of the verifier program.

Parity target: loader/halo2/loader.rs:22-734 — running the loader-generic
PLONK verifier with this loader SYNTHESIZES a circuit (rows + copy
constraints in a CircuitBuilder) whose satisfying witness is the verifier
run itself.  Scalars live as assigned Fr cells (MainGateChip); EC points as
non-native 68-bit-limb coordinates (EccChip).  The resulting circuit is
proven by the host prover and verified by every backend, closing the
recursion loop: the aggregated accumulator's limbs become the outer
circuit's public instances (sdk/aggregation.py).
"""

from __future__ import annotations

from typing import Optional

from snark_verifier_tpu.loader import EcPoint, Loader, Scalar
from snark_verifier_tpu.loader.halo2.builder import CircuitBuilder
from snark_verifier_tpu.loader.halo2.main_gate import MainGateChip
from snark_verifier_tpu.loader.halo2.shim import AssignedInteger, Context
from snark_verifier_tpu.util import bn254


class Halo2Loader(Loader):
    """Scalars carry `AssignedInteger`; EC points carry the ecc chip's
    assigned point representation."""

    def __init__(self, ecc_chip=None, builder: CircuitBuilder | None = None):
        self.builder = builder or CircuitBuilder()
        self.ctx = Context(self.builder)
        self.ecc_chip = ecc_chip
        self.scalar_chip = (
            ecc_chip.scalar_chip() if ecc_chip is not None else MainGateChip()
        )
        self._const_cache: dict[int, Scalar] = {}

    # -- assignment entry points (loader.rs:80-108) ---------------------------
    def assign_scalar(self, value: int) -> Scalar:
        """Witness a scalar (unconstrained cell)."""
        return Scalar(self, self.scalar_chip.assign_integer(self.ctx, value))

    def assign_ec_point(self, point) -> EcPoint:
        """Witness an EC point ((x, y) ints or None)."""
        return EcPoint(self, self.ecc_chip.assign_point(self.ctx, point))

    def expose_scalar(self, scalar: Scalar):
        """Make an assigned scalar a public instance of the circuit."""
        self.builder.expose_public(scalar.value.cell, scalar.value.value)

    def ec_point_from_limbs(self, scalars, limbs: int, bits: int) -> EcPoint:
        """In-circuit LimbsEncoding decode (accumulator.rs:133-262): witness
        the point (on-curve constrained, limb range checks via assign_point)
        and copy-constrain each coordinate limb cell to the corresponding
        limb scalar cell — the halo2 `LimbsEncodingInstructions` role.  This
        is what lets an aggregation circuit verify another AGGREGATION snark
        (two-level recursion): the inner-old accumulator decoded from the
        verified snark's instances inside the circuit."""
        from snark_verifier_tpu.loader.halo2.integer import BITS as GADGET_BITS
        from snark_verifier_tpu.loader.halo2.integer import LIMBS as GADGET_LIMBS
        from snark_verifier_tpu.loader.halo2.integer import from_limbs

        assert limbs == GADGET_LIMBS and bits == GADGET_BITS, (
            "accumulator limb encoding must match the integer gadget split"
        )
        vals = [s.value.value for s in scalars]
        x = from_limbs(vals[:limbs]) % bn254.P
        y = from_limbs(vals[limbs : 2 * limbs]) % bn254.P
        pt = self.ecc_chip.assign_point(self.ctx, (x, y))
        for coord, off in ((pt.x, 0), (pt.y, limbs)):
            for i in range(limbs):
                self.ctx.constrain_equal(
                    coord.limbs[i].cell, scalars[off + i].value.cell
                )
        return EcPoint(self, pt)

    # -- cost metering (loader.rs:269-273; halo2 impl loader.rs:272-295) ------
    def start_cost_metering(self, identifier: str):
        """Record the row offset; end_cost_metering logs the delta."""
        if not hasattr(self, "_meter_stack"):
            self._meter_stack = []
            self.row_costs = {}
        self._meter_stack.append((identifier, self._n_rows()))

    def end_cost_metering(self):
        identifier, start = self._meter_stack.pop()
        self.row_costs[identifier] = (
            self.row_costs.get(identifier, 0) + self._n_rows() - start
        )

    def _n_rows(self) -> int:
        b = self.builder
        return b.n_rows if hasattr(b, "n_rows") else len(b.rows)

    # -- Loader primitives ----------------------------------------------------
    def load_const(self, value: int) -> Scalar:
        value %= bn254.R
        if value not in self._const_cache:
            self._const_cache[value] = Scalar(
                self, self.scalar_chip.assign_constant(self.ctx, value)
            )
        return self._const_cache[value]

    def add(self, a: Scalar, b: Scalar) -> Scalar:
        return Scalar(
            self,
            self.scalar_chip.sum_with_coeff_and_const(
                self.ctx, [(1, a.value), (1, b.value)], 0
            ),
        )

    def sub(self, a: Scalar, b: Scalar) -> Scalar:
        return Scalar(self, self.scalar_chip.sub(self.ctx, a.value, b.value))

    def mul(self, a: Scalar, b: Scalar) -> Scalar:
        return Scalar(
            self,
            self.scalar_chip.sum_products_with_coeff_and_const(
                self.ctx, [(1, a.value, b.value)], 0
            ),
        )

    def neg(self, a: Scalar) -> Scalar:
        return Scalar(self, self.scalar_chip.neg(self.ctx, a.value))

    def invert(self, a: Scalar) -> Scalar:
        return Scalar(self, self.scalar_chip.invert(self.ctx, a.value))

    def assert_eq(self, annotation: str, lhs: Scalar, rhs: Scalar):
        self.scalar_chip.assert_equal(self.ctx, lhs.value, rhs.value)

    # -- efficient sums via the main gate (loader.rs:183-263) -----------------
    def sum_with_coeff_and_const(self, values, constant: int) -> Scalar:
        return Scalar(
            self,
            self.scalar_chip.sum_with_coeff_and_const(
                self.ctx, [(c, v.value) for c, v in values], constant
            ),
        )

    def sum_products_with_coeff_and_const(self, values, constant: int) -> Scalar:
        return Scalar(
            self,
            self.scalar_chip.sum_products_with_coeff_and_const(
                self.ctx, [(c, a.value, b.value) for c, a, b in values], constant
            ),
        )

    # -- EC side (delegates to the ecc chip) ----------------------------------
    def ec_point_load_const(self, point) -> EcPoint:
        return EcPoint(self, self.ecc_chip.assign_constant(self.ctx, point))

    def ec_point_assert_eq(self, annotation: str, lhs: EcPoint, rhs: EcPoint):
        self.ecc_chip.assert_equal(self.ctx, lhs.value, rhs.value)

    def multi_scalar_multiplication(
        self, pairs, constant: Optional[tuple] = None
    ) -> EcPoint:
        chip_pairs = [(s.value, p.value) for s, p in pairs]
        return EcPoint(
            self, self.ecc_chip.variable_base_msm(self.ctx, chip_pairs, constant)
        )
