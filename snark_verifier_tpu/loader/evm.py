"""EvmLoader: staged interpreter emitting an EVM (Yul) verifier.

Parity with the reference's loader/evm/loader.rs: running the loader-generic
PLONK verifier with this backend *unrolls* the whole verification into
straight-line Yul — scalar ops become addmod/mulmod, EC ops become calls to
the ecAdd/ecMul/modexp/ecPairing precompiles (0x05-0x08), transcript
squeezes become keccak256 over the memory transcript buffer — wrapped into a
Halo2Verifier contract (loader/evm/code.rs).

Alongside the Yul text the loader records an IR (list of ops) so the
generated program can be *executed* in-process by loader/evm_interp.py (the
role revm plays for the reference, loader/evm/util/executor.rs) — no solc
needed to test that a generated verifier accepts/rejects calldata.

Codegen quality (parity with loader.rs:220-249, 827-899):
* scalar ops are DEFERRED as expression trees (depth-bounded) with
  value-numbering CSE — a scalar used once inlines into its consumer, a
  scalar used twice+ is materialized into one memory slot;
* batch inversion uses the loader-generic Montgomery trick (one modexp +
  3(n-1) mulmods, loader/__init__.py batch_invert).
"""

from __future__ import annotations

from typing import Optional

from snark_verifier_tpu.loader import EcPoint, Loader, Scalar
from snark_verifier_tpu.util import bn254

MEM_START = 0x80
MAX_EXPR_DEPTH = 8  # ops per rendered Yul expression before spilling to memory


class EvmLoader(Loader):
    def __init__(self):
        self.ptr = MEM_START
        self.ir = []  # executed + rendered
        self.num_instance = 0
        self.proof_cd_offset = 0  # calldata offset where the proof begins
        self._vn = {}  # value numbering: canonical expr key -> Scalar

    # -- memory / code helpers ----------------------------------------------
    def allocate(self, size: int) -> int:
        ptr = self.ptr
        self.ptr += size
        return ptr

    def emit(self, op):
        self.ir.append(op)

    # -- scalar ops (mod r) ---------------------------------------------------
    def load_const(self, value: int) -> Scalar:
        return Scalar(self, ("const", value % bn254.R))

    def _materialize(self, s: Scalar) -> int:
        """Ensure the scalar lives in memory; returns its pointer."""
        kind = s.value[0]
        if kind == "mem":
            return s.value[1]
        if kind == "expr":
            tree, box = s.value[1], s.value[2]
            if box["ptr"] is None:
                box["ptr"] = self.allocate(0x20)
                self.emit(("mstore", box["ptr"], tree))
            s.value = ("mem", box["ptr"])
            return box["ptr"]
        ptr = self.allocate(0x20)
        self.emit(("mstore", ptr, s.value))
        s.value = ("mem", ptr)
        return ptr

    def _expr_d(self, s: Scalar):
        """(expr tree, depth) of a scalar for inlining into a consumer.

        Deferral policy (role of the reference's lazy Sum/Product values,
        loader/evm/loader.rs:220-249): the first consumer inlines the tree;
        a second consumer materializes it into a slot so every later use is
        one mload."""
        v = s.value
        if v[0] == "mem":
            return ("mload", v[1]), 0
        if v[0] == "const":
            return v, 0
        tree, box = v[1], v[2]
        box["uses"] += 1
        if box["uses"] >= 2:
            ptr = self._materialize(s)
            return ("mload", ptr), 0
        return tree, box["depth"]

    def _expr(self, s: Scalar):
        return self._expr_d(s)[0]

    def _binop(self, op, a: Scalar, b: Scalar, modulus: str) -> Scalar:
        if a.value[0] == "const" and b.value[0] == "const":
            x, y = a.value[1], b.value[1]
            m = bn254.R if modulus == "r" else bn254.P
            v = {"addmod": x + y, "mulmod": x * y}[op] % m
            return Scalar(self, ("const", v))
        ea, da = self._expr_d(a)
        eb, db = self._expr_d(b)
        # canonical key for the commutative ops -> CSE across operand order
        key = (op, modulus) + tuple(sorted((repr(ea), repr(eb))))
        hit = self._vn.get(key)
        if hit is not None:
            return hit
        tree = (op, ea, eb, modulus)
        depth = 1 + max(da, db)
        if depth >= MAX_EXPR_DEPTH:
            ptr = self.allocate(0x20)
            self.emit(("mstore", ptr, tree))
            s = Scalar(self, ("mem", ptr))
        else:
            s = Scalar(self, ("expr", tree, {"uses": 0, "ptr": None, "depth": depth}))
        self._vn[key] = s
        return s

    def add(self, a, b):
        return self._binop("addmod", a, b, "r")

    def mul(self, a, b):
        return self._binop("mulmod", a, b, "r")

    def neg(self, a):
        if a.value[0] == "const":
            return Scalar(self, ("const", (-a.value[1]) % bn254.R))
        # -x = x * (r - 1) mod r (canonical output)
        return self._binop("mulmod", a, Scalar(self, ("const", bn254.R - 1)), "r")

    def sub(self, a, b):
        return self.add(a, self.neg(b))

    def invert(self, a):
        scratch = self.allocate(0xC0)  # modexp precompile input staging
        ptr = self.allocate(0x20)
        self.emit(("modexp_inv", ptr, self._expr(a), scratch))
        return Scalar(self, ("mem", ptr))

    def assert_eq(self, annotation, lhs, rhs):
        self.emit(("require_eq", self._expr(lhs), self._expr(rhs), annotation))

    # -- EC ops ---------------------------------------------------------------
    # EcPoint.value: ("mem", x_ptr, y_ptr) or ("const", (x, y)).  Constants
    # stay symbolic until used so the transcript's memory buffer remains
    # contiguous during the read phase (the reference's Value::Constant,
    # loader/evm/loader.rs:29-35).
    def ec_point_load_const(self, point) -> EcPoint:
        assert point is not None, "identity constants not representable"
        return EcPoint(self, ("const", (point[0], point[1])))

    def _point_ptrs(self, p: EcPoint):
        if p.value[0] == "mem":
            return p.value[1], p.value[2]
        x, y = p.value[1]
        xp = self.allocate(0x20)
        yp = self.allocate(0x20)
        self.emit(("mstore", xp, ("const", x)))
        self.emit(("mstore", yp, ("const", y)))
        p.value = ("mem", xp, yp)
        return xp, yp

    def ec_point_assert_eq(self, annotation, lhs, rhs):
        lx, ly = self._point_ptrs(lhs)
        rx, ry = self._point_ptrs(rhs)
        self.emit(("require_eq", ("mload", lx), ("mload", rx), annotation + ".x"))
        self.emit(("require_eq", ("mload", ly), ("mload", ry), annotation + ".y"))

    def ec_add(self, a: EcPoint, b: EcPoint) -> EcPoint:
        ax, ay = self._point_ptrs(a)
        bx, by = self._point_ptrs(b)
        scratch = self.allocate(0x80)  # ecAdd precompile input staging
        out = self.allocate(0x40)
        self.emit(("ecadd", out, ax, ay, bx, by, scratch))
        return EcPoint(self, ("mem", out, out + 0x20))

    def ec_mul(self, p: EcPoint, s: Scalar) -> EcPoint:
        px, py = self._point_ptrs(p)
        scratch = self.allocate(0x60)  # ecMul precompile input staging
        out = self.allocate(0x40)
        self.emit(("ecmul", out, px, py, self._expr(s), scratch))
        return EcPoint(self, ("mem", out, out + 0x20))

    def multi_scalar_multiplication(self, pairs, constant: Optional[tuple] = None) -> EcPoint:
        acc = None
        for s, p in pairs:
            term = p if (s.value[0] == "const" and s.value[1] == 1) else self.ec_mul(p, s)
            acc = term if acc is None else self.ec_add(acc, term)
        assert acc is not None
        self._point_ptrs(acc)
        return acc

    def pairing(self, lhs: EcPoint, g2: tuple, rhs: EcPoint, minus_s_g2: tuple):
        """Emit the final ecPairing check: e(lhs, g2) e(rhs, -s_g2) == 1.

        G2 coordinates are embedded as constants (decider.rs:126-143).
        """
        lx, ly = self._point_ptrs(lhs)
        rx, ry = self._point_ptrs(rhs)
        base = self.allocate(0x180)
        self.emit(("mstore", base + 0x00, ("mload", lx)))
        self.emit(("mstore", base + 0x20, ("mload", ly)))
        # EVM expects Fq2 as (c1, c0)
        for off, v in zip(
            range(0x40, 0xC0, 0x20),
            [g2[0][1], g2[0][0], g2[1][1], g2[1][0]],
        ):
            self.emit(("mstore", base + off, ("const", v)))
        self.emit(("mstore", base + 0xC0, ("mload", rx)))
        self.emit(("mstore", base + 0xE0, ("mload", ry)))
        for off, v in zip(
            range(0x100, 0x180, 0x20),
            [minus_s_g2[0][1], minus_s_g2[0][0], minus_s_g2[1][1], minus_s_g2[1][0]],
        ):
            self.emit(("mstore", base + off, ("const", v)))
        self.emit(("pairing", base))

    # -- calldata / transcript support ---------------------------------------
    def calldataload_scalar(self, offset: int) -> Scalar:
        ptr = self.allocate(0x20)
        self.emit(("cd_scalar", ptr, offset))  # validates < r
        return Scalar(self, ("mem", ptr))

    def calldataload_ec_point(self, offset: int) -> EcPoint:
        ptr = self.allocate(0x40)
        self.emit(("cd_point", ptr, offset))  # validates on-curve
        return EcPoint(self, ("mem", ptr, ptr + 0x20))

    def keccak256(self, ptr: int, length: int) -> int:
        out = self.allocate(0x20)
        self.emit(("keccak", out, ptr, length))
        return out

    def mstore8(self, ptr: int, byte: int):
        self.emit(("mstore8", ptr, byte))

    def scalar_from_mem(self, ptr: int) -> Scalar:
        return Scalar(self, ("mem", ptr))

    def dup_scalar(self, s: Scalar) -> Scalar:
        ptr = self.allocate(0x20)
        self.emit(("mstore", ptr, self._expr(s)))
        return Scalar(self, ("mem", ptr))

    def dup_ec_point(self, p: EcPoint) -> EcPoint:
        px, py = self._point_ptrs(p)
        ptr = self.allocate(0x40)
        self.emit(("mstore", ptr, ("mload", px)))
        self.emit(("mstore", ptr + 0x20, ("mload", py)))
        return EcPoint(self, ("mem", ptr, ptr + 0x20))

    def ec_point_from_limbs(self, scalars, limbs: int = 4, bits: int = 68) -> EcPoint:
        """Recompose an EC point from 2*limbs base-2^bits limb scalars
        (x limbs low-to-high, then y limbs) and validate it on-curve —
        the recursion-instance decode (loader/evm/loader.rs:176-214).

        The recomposition is raw EVM add/shl (wrapping mod 2^256, like the
        reference); validate_ec_point rejects any x, y >= p or off-curve
        combination a malicious prover could smuggle through the limbs."""
        assert len(scalars) == 2 * limbs
        ptr = self.allocate(0x40)

        def combine(ls):
            e = self._expr(ls[0])
            for i, s in enumerate(ls[1:], start=1):
                e = ("add", e, ("shl", bits * i, self._expr(s)))
            return e

        self.emit(("mstore", ptr, combine(scalars[:limbs])))
        self.emit(("mstore", ptr + 0x20, combine(scalars[limbs:])))
        self.emit(("validate_point", ptr, ptr + 0x20))
        return EcPoint(self, ("mem", ptr, ptr + 0x20))

    def fold_accumulators(self, accumulators):
        """Random-linear-combine accumulators into one with a keccak-derived
        challenge, so a single ecPairing decides them all
        (pcs/kzg/decider.rs:146-185).

        Points are duplicated into one contiguous region [lhs_i | rhs_i]*,
        the challenge is keccak256 over that region mod r, and the fold is
        two (len)-term MSMs by its powers."""
        from snark_verifier_tpu.pcs.kzg.accumulator import KzgAccumulator

        # materialize first so the dup region stays contiguous
        for acc in accumulators:
            self._point_ptrs(acc.lhs)
            self._point_ptrs(acc.rhs)
        dups = [
            (self.dup_ec_point(acc.lhs), self.dup_ec_point(acc.rhs))
            for acc in accumulators
        ]
        base = dups[0][0].value[1]
        hash_ptr = self.keccak256(base, len(accumulators) * 0x80)
        cptr = self.allocate(0x20)
        self.emit(("mstore", cptr, ("modr", ("mload", hash_ptr))))
        challenge = Scalar(self, ("mem", cptr))

        powers = [self.load_const(1)]
        for _ in range(len(accumulators) - 1):
            powers.append(self.mul(powers[-1], challenge))
        lhs = self.multi_scalar_multiplication(
            [(c, l) for c, (l, _) in zip(powers, dups)]
        )
        rhs = self.multi_scalar_multiplication(
            [(c, r) for c, (_, r) in zip(powers, dups)]
        )
        return KzgAccumulator(lhs, rhs)

    # -- decider hook (pcs/kzg/decider.py dispatch) ---------------------------
    def decide_pairing(self, accumulator, dk):
        self.pairing(
            accumulator.lhs, dk.g2, accumulator.rhs, bn254.g2_neg(dk.s_g2)
        )
        return True

    # -- rendering ------------------------------------------------------------
    def solidity_code(self) -> str:
        from snark_verifier_tpu.loader.evm_render import render_contract

        return render_contract(self)
