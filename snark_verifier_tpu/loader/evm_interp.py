"""In-process executor for EvmLoader IR.

Plays the role of revm in the reference's tests
(loader/evm/util/executor.rs:8-59): runs the generated verifier program
against calldata, with EVM precompile semantics provided by the python
oracle (ecAdd/ecMul/modexp/ecPairing, identity = (0, 0)), and returns the
gas-free accept/reject outcome.  A mutated-calldata run must revert —
the reference's negative test (test/kzg/evm.rs:58-62).
"""

from __future__ import annotations

from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256


class EvmRevert(Exception):
    pass


class EvmExecutor:
    def __init__(self, ir, calldata: bytes):
        self.ir = ir
        self.calldata = calldata
        self.memory = bytearray(0x100000)

    # -- memory ---------------------------------------------------------------
    def _mload(self, ptr: int) -> int:
        return int.from_bytes(self.memory[ptr : ptr + 32], "big")

    def _mstore(self, ptr: int, value: int):
        self.memory[ptr : ptr + 32] = (value % (1 << 256)).to_bytes(32, "big")

    def _cd_word(self, off: int) -> int:
        data = self.calldata[off : off + 32]
        data = data + bytes(32 - len(data))
        return int.from_bytes(data, "big")

    # -- expressions ----------------------------------------------------------
    def eval(self, expr) -> int:
        tag = expr[0]
        if tag == "const":
            return expr[1]
        if tag == "mload":
            return self._mload(expr[1])
        if tag == "calldataload":
            return self._cd_word(expr[1])
        if tag == "addmod":
            m = bn254.R if expr[3] == "r" else bn254.P
            return (self.eval(expr[1]) + self.eval(expr[2])) % m
        if tag == "mulmod":
            m = bn254.R if expr[3] == "r" else bn254.P
            return (self.eval(expr[1]) * self.eval(expr[2])) % m
        if tag == "modr":
            return self.eval(expr[1]) % bn254.R
        if tag == "add":  # raw EVM add, wraps mod 2^256
            return (self.eval(expr[1]) + self.eval(expr[2])) % (1 << 256)
        if tag == "shl":  # ("shl", shift_const, expr)
            return (self.eval(expr[2]) << expr[1]) % (1 << 256)
        raise ValueError(f"unknown expr {tag}")

    # -- EC helpers (precompile conventions: (0,0) = identity) ---------------
    @staticmethod
    def _to_pt(x, y):
        if (x, y) == (0, 0):
            return None
        if not bn254.g1_is_on_curve((x, y)):
            raise EvmRevert("ec operand not on curve")
        return (x, y)

    @staticmethod
    def _from_pt(pt):
        return (0, 0) if pt is None else pt

    # -- run ------------------------------------------------------------------
    def run(self) -> bool:
        for op in self.ir:
            tag = op[0]
            if tag == "mstore":
                self._mstore(op[1], self.eval(op[2]))
            elif tag == "mstore8":
                self.memory[op[1]] = op[2] & 0xFF
            elif tag == "keccak":
                _, out, src, length = op
                digest = keccak256(bytes(self.memory[src : src + length]))
                self._mstore(out, int.from_bytes(digest, "big"))
            elif tag == "cd_scalar":
                _, ptr, off = op
                v = self._cd_word(off)
                if v >= bn254.R:
                    raise EvmRevert("scalar out of range")
                self._mstore(ptr, v)
            elif tag == "cd_point":
                _, ptr, off = op
                x, y = self._cd_word(off), self._cd_word(off + 32)
                if x >= bn254.P or y >= bn254.P:
                    raise EvmRevert("coordinate out of range")
                if (y * y - x * x * x - bn254.G1_B) % bn254.P != 0:
                    raise EvmRevert("point not on curve")
                self._mstore(ptr, x)
                self._mstore(ptr + 32, y)
            elif tag == "validate_point":
                _, xp, yp = op
                x, y = self._mload(xp), self._mload(yp)
                if x >= bn254.P or y >= bn254.P:
                    raise EvmRevert("recomposed coordinate out of range")
                if (y * y - x * x * x - bn254.G1_B) % bn254.P != 0:
                    raise EvmRevert("recomposed point not on curve")
            elif tag == "modexp_inv":
                _, dst, expr, _scratch = op
                v = self.eval(expr)
                self._mstore(dst, pow(v, bn254.R - 2, bn254.R))
            elif tag == "ecadd":
                _, out, ax, ay, bx, by, _scratch = op
                a = self._to_pt(self._mload(ax), self._mload(ay))
                b = self._to_pt(self._mload(bx), self._mload(by))
                x, y = self._from_pt(bn254.g1_add(a, b))
                self._mstore(out, x)
                self._mstore(out + 32, y)
            elif tag == "ecmul":
                _, out, px, py, sexpr, _scratch = op
                p = self._to_pt(self._mload(px), self._mload(py))
                s = self.eval(sexpr)
                x, y = self._from_pt(bn254.g1_mul(p, s) if p else None)
                self._mstore(out, x)
                self._mstore(out + 32, y)
            elif tag == "require_eq":
                if self.eval(op[1]) != self.eval(op[2]):
                    raise EvmRevert(f"assertion failed: {op[3]}")
            elif tag == "pairing":
                base = op[1]
                lhs = self._to_pt(self._mload(base), self._mload(base + 0x20))
                g2 = (
                    (self._mload(base + 0x60), self._mload(base + 0x40)),
                    (self._mload(base + 0xA0), self._mload(base + 0x80)),
                )
                rhs = self._to_pt(self._mload(base + 0xC0), self._mload(base + 0xE0))
                g2b = (
                    (self._mload(base + 0x120), self._mload(base + 0x100)),
                    (self._mload(base + 0x160), self._mload(base + 0x140)),
                )
                if not bn254.pairing_check([(lhs, g2), (rhs, g2b)]):
                    raise EvmRevert("pairing check failed")
            else:
                raise ValueError(f"unknown op {tag}")
        return True
