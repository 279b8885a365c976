"""JaxLoader: the staged device interpreter.

Running the loader-generic verifier with this backend under `jax.jit` traces
the entire verification — transcript keccak, field math, MSMs, pairing —
into one XLA computation: the JAX tracer plays the role the reference's
staged EvmLoader plays for Yul (loader/evm/loader.rs), with the TPU as the
target instead of the EVM.  All values carry an implicit leading batch
shape, so verifying B proofs is the same trace over (B, ...) arrays; since
verification asserts cannot raise at runtime under jit, failed checks
accumulate into a per-batch-element `ok` mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from snark_verifier_tpu.loader import EcPoint, Loader, Scalar
from snark_verifier_tpu.ops import curve as CRV
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops import msm as MSM
from snark_verifier_tpu.ops.curve import G1
from snark_verifier_tpu.util import bn254

FR, FQ = F.FR, F.FQ


@dataclass
class JaxPoint:
    """EcPoint payload: affine Montgomery coords and/or projective G1."""

    x: Optional[jax.Array] = None  # (..., 16) Montgomery Fq
    y: Optional[jax.Array] = None
    is_inf: Optional[jax.Array] = None  # bool (...,)
    proj: Optional[G1] = None

    def as_proj(self) -> G1:
        if self.proj is not None:
            return self.proj
        shape = self.x.shape[:-1]
        inf = (
            self.is_inf
            if self.is_inf is not None
            else jnp.zeros(shape, bool)
        )
        z = F.select(inf, F.zeros(shape), F.ones(shape, FQ))
        y = F.select(inf, F.ones(shape, FQ), self.y)
        return G1(F.select(inf, F.zeros(shape), self.x), y, z)

    def as_affine(self):
        if self.x is not None:
            return self
        norm = CRV.g1_normalize(self.proj)
        return JaxPoint(norm.x, norm.y, CRV.g1_is_identity(self.proj), self.proj)


class JaxLoader(Loader):
    def __init__(self, batch_shape=()):
        self.batch_shape = tuple(batch_shape)
        self.ok = jnp.ones(self.batch_shape, bool)

    # -- soft assertions -----------------------------------------------------
    def require(self, mask):
        """AND a boolean condition into the per-element validity mask."""
        self.ok = jnp.logical_and(self.ok, jnp.broadcast_to(mask, self.batch_shape))

    # -- scalars -------------------------------------------------------------
    def load_const(self, value: int) -> Scalar:
        return Scalar(self, jnp.asarray(FR.encode([value % bn254.R])[0]))

    def scalar_from_mont(self, arr) -> Scalar:
        return Scalar(self, arr)

    def add(self, a, b):
        return Scalar(self, F.add(a.value, b.value, FR))

    def sub(self, a, b):
        return Scalar(self, F.sub(a.value, b.value, FR))

    def mul(self, a, b):
        return Scalar(self, F.mont_mul(a.value, b.value, FR))

    def invert(self, a):
        return Scalar(self, F.inv(a.value, FR))

    def pow_const(self, a, exponent: int):
        if exponent == 1:
            return a
        return Scalar(self, F.pow_const(a.value, exponent, FR))

    def batch_invert(self, scalars):
        full = self.batch_shape + (16,)
        stacked = jnp.stack(
            [jnp.broadcast_to(s.value, full) for s in scalars], axis=0
        )
        inverted = F.batch_inv(stacked, FR, axis=0)
        return [Scalar(self, inverted[i]) for i in range(len(scalars))]

    def assert_eq(self, annotation, lhs, rhs):
        self.require(F.eq(lhs.value, rhs.value))

    # -- points --------------------------------------------------------------
    def ec_point_load_const(self, point) -> EcPoint:
        if point is None:
            return EcPoint(
                self,
                JaxPoint(
                    F.zeros(()), F.ones((), FQ), jnp.ones((), bool)
                ),
            )
        x, y = point
        return EcPoint(
            self,
            JaxPoint(
                jnp.asarray(FQ.encode([x])[0]),
                jnp.asarray(FQ.encode([y])[0]),
                jnp.zeros((), bool),
            ),
        )

    def ec_point_assert_eq(self, annotation, lhs, rhs):
        self.require(CRV.g1_eq(lhs.value.as_proj(), rhs.value.as_proj()))

    def multi_scalar_multiplication(self, pairs, constant=None) -> EcPoint:
        assert constant is None, "constant base folded by Msm.evaluate"
        full_s = self.batch_shape + (16,)
        scalars = jnp.stack(
            [
                jnp.broadcast_to(F.from_mont(s.value, FR), full_s)
                for s, _ in pairs
            ],
            axis=-2,
        )  # (..., n, 16) canonical
        projs = [p.value.as_proj() for _, p in pairs]
        full_pt = self.batch_shape + (16,)
        points = G1(
            jnp.stack([jnp.broadcast_to(g.x, full_pt) for g in projs], axis=-2),
            jnp.stack([jnp.broadcast_to(g.y, full_pt) for g in projs], axis=-2),
            jnp.stack([jnp.broadcast_to(g.z, full_pt) for g in projs], axis=-2),
        )
        out = MSM.msm_batched(points, scalars)
        return EcPoint(self, JaxPoint(proj=out))

    # -- accumulator limb decoding (pcs/kzg/accumulator.rs:36-83) ------------
    def fq_from_limb_scalars(self, limb_scalars, bits: int = 68):
        """Compose Fr limb scalars into one Fq value: sum_i limb_i * 2^(bits*i)
        mod p, entirely in-graph.  Limb values are taken mod p like the
        reference's `fe_from_limbs`, so out-of-range limbs cannot overflow."""
        acc = None
        for i, s in enumerate(limb_scalars):
            canon = F.from_mont(s.value, FR)  # canonical, < r < p
            fq = F.to_mont(canon, FQ)
            shift = jnp.asarray(FQ.encode([pow(2, bits * i, bn254.P)])[0])
            term = F.mont_mul(fq, shift, FQ)
            acc = term if acc is None else F.add(acc, term, FQ)
        return acc

    def ec_point_from_limbs(self, scalars, limbs: int = 4, bits: int = 68):
        """16 Fr limb scalars -> one affine G1 EcPoint (x, y from 2*limbs
        scalars each); folds the on-curve check into the `ok` mask."""
        assert len(scalars) == 2 * limbs
        x = self.fq_from_limb_scalars(scalars[:limbs], bits)
        y = self.fq_from_limb_scalars(scalars[limbs:], bits)
        x = jnp.broadcast_to(x, self.batch_shape + (16,))
        y = jnp.broadcast_to(y, self.batch_shape + (16,))
        pt = JaxPoint(x, y, jnp.zeros(self.batch_shape, bool))
        self.require(CRV.g1_is_on_curve(pt.as_proj()))
        return EcPoint(self, pt)

    # -- decider hooks --------------------------------------------------------
    def decide_ipa(self, accumulator, dk):
        """IPA decide: U == MSM(g, h_coeffs(xi)) via the large-N Pippenger
        kernel (pcs/ipa/decider.rs:47-55)."""
        from snark_verifier_tpu.ops import msm as MSM

        xi = [x.value for x in accumulator.xi]
        batch = self.batch_shape
        coeffs = F.ones(batch + (1,), FR)
        for x in reversed(xi):
            prod = F.mont_mul(coeffs, x[..., None, :], FR)
            coeffs = jnp.concatenate([coeffs, prod], axis=-2)
        scal = F.from_mont(coeffs, FR)  # (..., n, 16)
        g = CRV.g1_from_affine_ints(dk.g)
        if batch == ():
            expect = MSM.msm_serial(g, scal)
        else:
            expect = jax.vmap(lambda s: MSM.msm_serial(g, s))(
                scal.reshape((-1,) + scal.shape[-2:])
            )
            expect = CRV.G1(
                expect.x.reshape(batch + (16,)),
                expect.y.reshape(batch + (16,)),
                expect.z.reshape(batch + (16,)),
            )
        ok = CRV.g1_eq(expect, accumulator.u.value.as_proj())
        self.require(ok)
        return ok

    def decide_pairing(self, accumulator, dk):
        from snark_verifier_tpu.ops import pairing as PAIR

        lhs = accumulator.lhs.value.as_proj()
        rhs = accumulator.rhs.value.as_proj()
        ok = PAIR.kzg_pairing_check(lhs, rhs, dk.g2, dk.s_g2)
        self.require(ok)
        return ok
