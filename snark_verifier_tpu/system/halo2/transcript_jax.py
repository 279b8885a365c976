"""EVM (Keccak-256) transcript, JAX interpreter.

Same byte semantics as NativeEvmTranscript (and the reference's
transcript/evm.rs:159-268), but over traced arrays: the proof stream is a
(..., L) uint32 byte tensor, the cursor and all buffer lengths are static
(fixed by the protocol), and squeezes run the batched keccak kernel — so a
read of B proofs of the same protocol is ONE trace with (B, ...) shapes.

Failed validity checks (non-canonical scalars, off-curve points) cannot
raise under jit; they AND into the loader's per-element `ok` mask, exactly
the role of the EVM verifier's revert paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from snark_verifier_tpu.loader import EcPoint, Scalar
from snark_verifier_tpu.loader.jax_loader import JaxLoader, JaxPoint
from snark_verifier_tpu.ops import curve as CRV
from snark_verifier_tpu.ops import encode as ENC
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops import keccak as K
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.transcript import TranscriptRead

FR, FQ = F.FR, F.FQ


class JaxEvmTranscript(TranscriptRead):
    def __init__(self, proof_bytes, loader: JaxLoader):
        """proof_bytes: (batch..., L) uint32 array of byte values."""
        self._loader = loader
        self.stream = proof_bytes
        self.cursor = 0
        self.buf = []  # list of (batch..., k) traced byte arrays
        self.buf_len = 0

    def loader(self):
        return self._loader

    def _append(self, data):
        self.buf.append(data)
        self.buf_len += data.shape[-1]

    # -- transcript core ----------------------------------------------------
    def squeeze_challenge(self) -> Scalar:
        batch = self._loader.batch_shape
        parts = [jnp.broadcast_to(b, batch + (b.shape[-1],)) for b in self.buf]
        if self.buf_len == 0x20:
            parts.append(jnp.ones(batch + (1,), jnp.uint32))
        data = jnp.concatenate(parts, axis=-1) if parts else jnp.zeros(batch + (0,), jnp.uint32)
        digest = K.keccak256(data, data.shape[-1])
        self.buf = [digest]
        self.buf_len = 32
        value = ENC.reduce_u256(ENC.be_bytes_to_limbs(digest), FR)
        return Scalar(self._loader, F.to_mont(value, FR))

    def common_scalar(self, scalar: Scalar):
        canon = F.from_mont(scalar.value, FR)
        self._append(ENC.limbs_to_be_bytes(canon))

    def common_ec_point(self, ec_point: EcPoint):
        pt = ec_point.value.as_affine()
        x = F.from_mont(pt.x, FQ)
        y = F.from_mont(pt.y, FQ)
        # absorbing the identity is invalid (matches native raise)
        if pt.is_inf is not None:
            self._loader.require(jnp.logical_not(pt.is_inf))
        self._append(
            jnp.concatenate(
                [ENC.limbs_to_be_bytes(x), ENC.limbs_to_be_bytes(y)], axis=-1
            )
        )

    # -- read side ----------------------------------------------------------
    def _take(self, nbytes):
        data = self.stream[..., self.cursor : self.cursor + nbytes]
        assert data.shape[-1] == nbytes, "proof stream too short"
        self.cursor += nbytes
        return data

    def read_scalar(self) -> Scalar:
        data = self._take(32)
        self._append(data)
        limbs = ENC.be_bytes_to_limbs(data)
        self._loader.require(ENC.is_lt_modulus(limbs, FR))
        return Scalar(self._loader, F.to_mont(limbs, FR))

    def read_ec_point(self) -> EcPoint:
        data = self._take(64)
        self._append(data)
        xl = ENC.be_bytes_to_limbs(data[..., :32])
        yl = ENC.be_bytes_to_limbs(data[..., 32:])
        self._loader.require(ENC.is_lt_modulus(xl, FQ))
        self._loader.require(ENC.is_lt_modulus(yl, FQ))
        x = F.to_mont(xl, FQ)
        y = F.to_mont(yl, FQ)
        inf = jnp.zeros(x.shape[:-1], bool)
        pt = JaxPoint(x, y, inf)
        self._loader.require(CRV.g1_is_on_curve(pt.as_proj()))
        return EcPoint(self._loader, pt)


class JaxPoseidonTranscript(TranscriptRead):
    """Poseidon transcript, JAX interpreter.

    Same wire/absorption semantics as NativePoseidonTranscript: scalars are
    32-byte LE; points 32-byte compressed (y recovered in-graph by a sqrt
    exponentiation, validity folded into the loader's ok-mask); absorbed
    points contribute [x mod r, y mod r].
    """

    def __init__(self, proof_bytes, loader: JaxLoader, spec=None):
        from snark_verifier_tpu.ops.poseidon import JaxPoseidonSponge
        from snark_verifier_tpu.util.poseidon import default_spec

        self._loader = loader
        self.stream = proof_bytes
        self.cursor = 0
        self.sponge = JaxPoseidonSponge(spec or default_spec(), loader.batch_shape)

    def loader(self):
        return self._loader

    def _take(self, nbytes):
        data = self.stream[..., self.cursor : self.cursor + nbytes]
        assert data.shape[-1] == nbytes, "proof stream too short"
        self.cursor += nbytes
        return data

    def squeeze_challenge(self) -> Scalar:
        out = self.sponge.squeeze()
        full = self._loader.batch_shape + (out.shape[-1],)
        return Scalar(self._loader, jnp.broadcast_to(out, full))

    def common_scalar(self, scalar: Scalar):
        full = self._loader.batch_shape + (scalar.value.shape[-1],)
        self.sponge.update([jnp.broadcast_to(scalar.value, full)])

    def common_ec_point(self, ec_point: EcPoint):
        pt = ec_point.value.as_affine()
        if pt.is_inf is not None:
            self._loader.require(jnp.logical_not(pt.is_inf))
        # absorb x mod r, y mod r (fe_to_fe): convert Fq -> canonical ->
        # reduce mod r -> Fr Montgomery
        for coord in (pt.x, pt.y):
            canon = F.from_mont(coord, FQ)
            fr = ENC.reduce_u256(canon, FR)
            full = self._loader.batch_shape + (fr.shape[-1],)
            self.sponge.update(
                [jnp.broadcast_to(F.to_mont(fr, FR), full)]
            )

    def read_scalar(self) -> Scalar:
        data = self._take(32)
        limbs = ENC.le_bytes_to_limbs(data)
        self._loader.require(ENC.is_lt_modulus(limbs, FR))
        s = Scalar(self._loader, F.to_mont(limbs, FR))
        self.common_scalar(s)
        return s

    def read_ec_point(self) -> EcPoint:
        data = self._take(32)
        parity = (data[..., 31] >> 7) & 1
        x_bytes = jnp.concatenate(
            [data[..., :31], (data[..., 31:32] & 0x7F)], axis=-1
        )
        xl = ENC.le_bytes_to_limbs(x_bytes)
        self._loader.require(ENC.is_lt_modulus(xl, FQ))
        x = F.to_mont(xl, FQ)
        # y = sqrt(x^3 + 3); p = 3 mod 4 so sqrt = c^((p+1)/4)
        x3 = F.mont_mul(F.mont_mul(x, x, FQ), x, FQ)
        c = F.add(x3, F.constant(bn254.G1_B, FQ, x.shape[:-1]), FQ)
        y = F.pow_const(c, (bn254.P + 1) // 4, FQ)
        self._loader.require(F.eq(F.mont_mul(y, y, FQ), c))
        # match requested parity on the canonical representative
        y_canon = F.from_mont(y, FQ)
        y_neg = F.neg(y, FQ)
        pick_neg = (y_canon[..., 0] & 1) != parity
        y = F.select(pick_neg, y_neg, y)
        pt = JaxPoint(x, y, jnp.zeros(x.shape[:-1], bool))
        self.common_ec_point(EcPoint(self._loader, pt))
        return EcPoint(self._loader, pt)
