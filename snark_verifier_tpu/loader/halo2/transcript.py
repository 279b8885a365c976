"""In-circuit Poseidon transcript: Fiat-Shamir as circuit constraints.

Parity: PoseidonTranscript<C, Rc<Halo2Loader>, ..> in
system/halo2/transcript/halo2.rs — proof bytes are parsed on the host,
every scalar/point is WITNESSED into the circuit (points on-curve-checked),
and the sponge runs through loader ops so each squeezed challenge is a
constrained function of everything absorbed.  Byte format and absorption
order are identical to NativePoseidonTranscript
(system/halo2/transcript.py:208-260): scalars 32B LE; points 32B
compressed; coordinates absorbed reduced mod r (canonical-normalized in
circuit before reduction).
"""

from __future__ import annotations

import io

from snark_verifier_tpu.loader import EcPoint, Scalar
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.poseidon import LoaderPoseidonSponge
from snark_verifier_tpu.util.transcript import TranscriptRead


class TranscriptError(Exception):
    pass


class Halo2PoseidonTranscript(TranscriptRead):
    def __init__(self, stream: bytes | None = None, loader=None, spec=None):
        assert loader is not None
        self.stream = io.BytesIO(stream or b"")
        self._loader = loader
        self.sponge = LoaderPoseidonSponge(loader, spec)

    def loader(self):
        return self._loader

    def squeeze_challenge(self) -> Scalar:
        return self.sponge.squeeze()

    def common_scalar(self, scalar: Scalar):
        self.sponge.update([scalar])

    def common_ec_point(self, ec_point: EcPoint):
        chip = self._loader.ecc_chip
        xr, yr = chip.coords_reduced_native(self._loader.ctx, ec_point.value)
        self.sponge.update([Scalar(self._loader, xr), Scalar(self._loader, yr)])

    def read_scalar(self) -> Scalar:
        data = self.stream.read(32)
        if len(data) != 32:
            raise TranscriptError("unexpected end of proof stream")
        value = int.from_bytes(data, "little")
        if value >= bn254.R:
            raise TranscriptError("invalid scalar encoding in proof")
        scalar = self._loader.assign_scalar(value)
        self.common_scalar(scalar)
        return scalar

    def read_ec_point(self) -> EcPoint:
        from snark_verifier_tpu.system.halo2.transcript import decompress_g1

        data = self.stream.read(32)
        if len(data) != 32:
            raise TranscriptError("unexpected end of proof stream")
        point = self._loader.assign_ec_point(decompress_g1(data))
        self.common_ec_point(point)
        return point
