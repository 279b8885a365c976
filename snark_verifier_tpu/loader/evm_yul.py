"""Execute the RENDERED Solidity/Yul verifier text, with gas metering.

The IR executor (loader/evm_interp.py) runs the loader's op list; this
module instead parses the artifact users would deploy — the Yul assembly
body emitted by loader/evm_render.py — and executes it word-for-word, so
text and IR cannot silently diverge (the role revm + solc play for the
reference, loader/evm/util.rs:105-130).  Returns gas used on accept,
raises EvmRevert on reject.

Supported Yul subset = exactly what render_contract emits: `let` bindings,
`mstore`/`mstore8`, `if <expr> { revert(0, 0) }`, `return(0, 0)`, the
`validate_ec_point` helper function, and expressions over
mload/calldataload/addmod/mulmod/mod/keccak256/eq/lt/and/iszero/
staticcall(gas(), 0x5..0x8, ...) with hex literals and identifiers.

Gas model (Shanghai): 21000 base + calldata (4/16 per zero/nonzero byte) +
per-op costs + memory expansion (3w + w^2/512) + precompile costs
(EIP-2565 modexp formula, ecAdd 150, ecMul 6000, pairing 45000+34000k).
The number is a MODEL: without solc there is no bytecode, so stack-machine
overhead (PUSH/DUP/SWAP, jumps) that a compiled contract would pay is not
counted — expect the model to undercount a real deployment by the stack
shuffling of solc's codegen.  tests/test_yul_differential.py pins every
rule here against hand-computed Yellow-Paper/EIP values."""

from __future__ import annotations

import re

from snark_verifier_tpu.loader.evm_interp import EvmRevert
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256

_TOKEN = re.compile(r"\s*(->|[A-Za-z_][A-Za-z0-9_]*|0x[0-9a-fA-F]+|\d+|:=|[(),{}])")

_OP_GAS = {
    "addmod": 8,
    "mulmod": 8,
    "mod": 5,
    "eq": 3,
    "lt": 3,
    "add": 3,
    "shl": 3,
    "and": 3,
    "iszero": 3,
    "calldataload": 3,
    "mload": 3,
    "mstore": 3,
    "mstore8": 3,
}


def _tokens(src: str):
    out = []
    for line in src.splitlines():
        line = line.split("//")[0]
        pos = 0
        while pos < len(line):
            m = _TOKEN.match(line, pos)
            if not m:
                if line[pos].isspace():
                    pos += 1
                    continue
                raise ValueError(f"yul tokenizer stuck at {line[pos:]!r}")
            out.append(m.group(1))
            pos = m.end()
    return out


class YulVerifier:
    """Parse once, execute per calldata."""

    def __init__(self, solidity_src: str):
        body = solidity_src.split("assembly {", 1)[1].rsplit("}", 3)[0]
        self.toks = _tokens(body)

    # -- execution ----------------------------------------------------------
    def run(self, calldata: bytes) -> int:
        ex = _Exec(self.toks, calldata)
        ex.execute()
        return ex.gas

    __call__ = run


class _Exec:
    def __init__(self, toks, calldata):
        self.toks = toks
        self.i = 0
        self.calldata = calldata
        self.memory = bytearray()
        self.vars = {}
        self.gas = 21000 + sum(4 if b == 0 else 16 for b in calldata)

    # -- token helpers ------------------------------------------------------
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, expect=None):
        t = self.toks[self.i]
        if expect is not None and t != expect:
            raise ValueError(f"yul parse: expected {expect!r}, got {t!r} @{self.i}")
        self.i += 1
        return t

    # -- memory with expansion metering -------------------------------------
    def _touch(self, end: int):
        if end > len(self.memory):
            new_w = (end + 31) // 32
            old_w = (len(self.memory) + 31) // 32
            cost = lambda w: 3 * w + w * w // 512
            self.gas += cost(new_w) - cost(old_w)
            self.memory.extend(bytes(new_w * 32 - len(self.memory)))

    def mload(self, p):
        self._touch(p + 32)
        return int.from_bytes(self.memory[p : p + 32], "big")

    def mstore(self, p, v):
        self._touch(p + 32)
        self.memory[p : p + 32] = (v % (1 << 256)).to_bytes(32, "big")

    def cdload(self, off):
        d = self.calldata[off : off + 32]
        return int.from_bytes(d + bytes(32 - len(d)), "big")

    # -- statements ---------------------------------------------------------
    def execute(self):
        while self.i < len(self.toks):
            t = self.take()
            if t == "let":
                name = self.take()
                self.take(":=")
                self.vars[name] = self.expr_after_name(self.take())
            elif t == "function":
                # skip the validate_ec_point definition (interpreted natively)
                depth = 0
                while True:
                    tt = self.take()
                    if tt == "{":
                        depth += 1
                    elif tt == "}":
                        depth -= 1
                        if depth == 0:
                            break
            elif t == "if":
                cond = self.expr_after_name(self.take())
                self.take("{")
                # only `revert(0, 0)` bodies are emitted
                self.take("revert")
                self.take("(")
                self.take("0")
                self.take(",")
                self.take("0")
                self.take(")")
                self.take("}")
                if cond:
                    raise EvmRevert("yul revert")
            elif t == "mstore":
                self.take("(")
                p = self.expr_after_name(self.take())
                self.take(",")
                v = self.expr_after_name(self.take())
                self.take(")")
                self.gas += 3
                self.mstore(p, v)
            elif t == "mstore8":
                self.take("(")
                p = self.expr_after_name(self.take())
                self.take(",")
                v = self.expr_after_name(self.take())
                self.take(")")
                self.gas += 3
                self._touch(p + 1)
                self.memory[p] = v & 0xFF
            elif t == "return":
                self.take("(")
                self.take("0")
                self.take(",")
                self.take("0")
                self.take(")")
                return
            else:
                raise ValueError(f"yul stmt: unexpected {t!r}")

    # -- expressions --------------------------------------------------------
    def expr_after_name(self, t) -> int:
        if t.startswith("0x"):
            return int(t, 16)
        if t.isdigit():
            return int(t)
        if self.peek() != "(":
            return self.vars[t]  # identifier (f_p / f_q / valid...)
        self.take("(")
        args = []
        if self.peek() != ")":
            while True:
                args.append(self.expr_after_name(self.take()))
                if self.peek() == ",":
                    self.take(",")
                else:
                    break
        self.take(")")
        return self.call(t, args)

    def call(self, fn, a) -> int:
        self.gas += _OP_GAS.get(fn, 0)
        if fn == "addmod":
            return (a[0] + a[1]) % a[2]
        if fn == "mulmod":
            return (a[0] * a[1]) % a[2]
        if fn == "mod":
            return a[0] % a[1]
        if fn == "eq":
            return int(a[0] == a[1])
        if fn == "lt":
            return int(a[0] < a[1])
        if fn == "and":
            return a[0] & a[1]
        if fn == "iszero":
            return int(a[0] == 0)
        if fn == "add":
            return (a[0] + a[1]) % (1 << 256)
        if fn == "shl":
            return (a[1] << a[0]) % (1 << 256)
        if fn == "mload":
            return self.mload(a[0])
        if fn == "calldataload":
            return self.cdload(a[0])
        if fn == "keccak256":
            ptr, length = a
            self._touch(ptr + length)
            self.gas += 30 + 6 * ((length + 31) // 32)
            return int.from_bytes(keccak256(bytes(self.memory[ptr : ptr + length])), "big")
        if fn == "gas":
            return 10**9
        if fn == "validate_ec_point":
            x, y = a
            on = x < bn254.P and y < bn254.P and (y * y - x * x * x - bn254.G1_B) % bn254.P == 0
            # template body: 2 lt + and + 4 mulmod + addmod + eq + and
            self.gas += 2 * 3 + 3 + 4 * 8 + 8 + 3 + 3
            return int(on)
        if fn == "staticcall":
            return self.staticcall(a)
        raise ValueError(f"yul call: unknown builtin {fn!r}")

    # -- precompiles --------------------------------------------------------
    @staticmethod
    def _to_pt(x, y):
        if (x, y) == (0, 0):
            return None
        if not bn254.g1_is_on_curve((x, y)):
            raise EvmRevert("ec operand not on curve")
        return (x, y)

    def staticcall(self, a) -> int:
        _gas, addr, inp, insz, out, outsz = a
        self.gas += 100
        self._touch(inp + insz)
        self._touch(out + outsz)
        mem = self.memory
        w = lambda k: int.from_bytes(mem[inp + 32 * k : inp + 32 * (k + 1)], "big")
        if addr == 0x5:  # modexp (32-byte base/exp/mod here)
            assert w(0) == 32 and w(1) == 32 and w(2) == 32
            # EIP-2565: max(200, mult_complexity * iteration_count / 3) with
            # mult_complexity = ceil(32/8)^2 = 16 and, for exponents <= 32
            # bytes, iteration_count = max(exp.bit_length() - 1, 0).  The
            # verifier's inversion exponent is ~254 bits -> 16*253/3 = 1349,
            # NOT the 200 floor.
            exp = w(4)
            iteration_count = max(exp.bit_length() - 1, 0)
            self.gas += max(200, 16 * iteration_count // 3)
            self.mstore(out, pow(w(3), exp, w(5)))
            return 1
        if addr == 0x6:  # ecAdd
            self.gas += 150
            p = self._to_pt(w(0), w(1))
            q = self._to_pt(w(2), w(3))
            r = bn254.g1_add(p, q) or (0, 0)
            self.mstore(out, r[0])
            self.mstore(out + 32, r[1])
            return 1
        if addr == 0x7:  # ecMul
            self.gas += 6000
            p = self._to_pt(w(0), w(1))
            r = (bn254.g1_mul(p, w(2)) if p else None) or (0, 0)
            self.mstore(out, r[0])
            self.mstore(out + 32, r[1])
            return 1
        if addr == 0x8:  # ecPairing
            k = insz // 192
            self.gas += 45000 + 34000 * k
            pairs = []
            for j in range(k):
                b = inp + 192 * j
                g1 = self._to_pt(
                    int.from_bytes(mem[b : b + 32], "big"),
                    int.from_bytes(mem[b + 32 : b + 64], "big"),
                )
                coords = [
                    int.from_bytes(mem[b + 64 + 32 * i : b + 96 + 32 * i], "big")
                    for i in range(4)
                ]
                g2 = ((coords[1], coords[0]), (coords[3], coords[2]))
                pairs.append((g1, g2))
            ok = bn254.pairing_check(pairs)
            self.mstore(out, int(ok))
            return 1
        raise ValueError(f"staticcall to unknown precompile {hex(addr)}")
