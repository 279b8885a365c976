"""EVM (Keccak-256) transcript, codegen interpreter.

Parity with the reference's EvmTranscript over Rc<EvmLoader>
(system/halo2/transcript/evm.rs:39-157): the transcript buffer is a
contiguous memory region; squeezes emit keccak256 over it (with the 0x01
domain byte when the buffer is one stale digest), reads emit calldataload
with validity checks, and the buffer pointer tracks the loader allocator.
"""

from __future__ import annotations

from snark_verifier_tpu.loader import EcPoint, Scalar
from snark_verifier_tpu.loader.evm import MEM_START, EvmLoader
from snark_verifier_tpu.util.transcript import TranscriptRead


class _MemoryChunk:
    def __init__(self, ptr: int):
        self.ptr = ptr
        self.len = 0

    @property
    def end(self) -> int:
        return self.ptr + self.len

    def reset(self, ptr: int):
        self.ptr = ptr
        self.len = 0

    def extend(self, size: int):
        self.len += size


class EvmGenTranscript(TranscriptRead):
    def __init__(self, loader: EvmLoader):
        ptr = loader.allocate(0x20)
        assert ptr == MEM_START, "transcript must be constructed first"
        self._loader = loader
        self.stream = 0  # calldata offset
        self.buf = _MemoryChunk(ptr)
        self.buf.extend(0x20)

    def loader(self):
        return self._loader

    def load_instances(self, num_instance):
        out = []
        for n in num_instance:
            col = []
            for _ in range(n):
                col.append(self._loader.calldataload_scalar(self.stream))
                self.stream += 0x20
            out.append(col)
        return out

    def squeeze_challenge(self) -> Scalar:
        loader = self._loader
        if self.buf.len == 0x20:
            assert loader.ptr == self.buf.end
            loader.mstore8(self.buf.end, 1)
            length = 0x21
        else:
            length = self.buf.len
        hash_ptr = loader.keccak256(self.buf.ptr, length)
        challenge_ptr = loader.allocate(0x20)
        dup_hash_ptr = loader.allocate(0x20)
        loader.emit(("mstore", challenge_ptr, ("modr", ("mload", hash_ptr))))
        loader.emit(("mstore", dup_hash_ptr, ("mload", hash_ptr)))
        self.buf.reset(dup_hash_ptr)
        self.buf.extend(0x20)
        return loader.scalar_from_mem(challenge_ptr)

    def common_scalar(self, scalar: Scalar):
        if scalar.value[0] == "const" and self.buf.ptr == MEM_START:
            # transcript initial state into the reserved first slot
            self._loader.emit(("mstore", MEM_START, ("const", scalar.value[1])))
        elif scalar.value[0] == "mem":
            assert scalar.value[1] == self.buf.end, "non-contiguous transcript"
            self.buf.extend(0x20)
        else:
            raise AssertionError("cannot absorb unmaterialized scalar")

    def common_ec_point(self, ec_point: EcPoint):
        assert ec_point.value[0] == "mem"
        assert ec_point.value[1] == self.buf.end, "non-contiguous transcript"
        self.buf.extend(0x40)

    def read_scalar(self) -> Scalar:
        scalar = self._loader.calldataload_scalar(self.stream)
        self.stream += 0x20
        self.common_scalar(scalar)
        return scalar

    def read_ec_point(self) -> EcPoint:
        pt = self._loader.calldataload_ec_point(self.stream)
        self.stream += 0x40
        self.common_ec_point(pt)
        return pt
