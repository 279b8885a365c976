"""Differential tests for the Yul interpreter (loader/evm_yul.py).

The interpreter is the stand-in for solc+revm (unavailable in this
environment), so a semantics or gas bug in it would self-certify the
generated contracts.  These tests execute hand-written micro-contracts
covering every opcode, precompile, and gas rule the interpreter models,
with the expected values computed IN THE TEST from the Yellow-Paper /
EIP-1108 / EIP-2565 / EIP-2929 rules — never from the interpreter itself.

What the model deliberately omits (and these tests do not check): compiled
stack-machine overhead (PUSH/DUP/SWAP/JUMP) that solc's codegen would add.
Reference role: loader/evm/util/executor.rs:8-59 (revm harness).
"""

from __future__ import annotations

import pytest

from snark_verifier_tpu.loader.evm_interp import EvmRevert
from snark_verifier_tpu.loader.evm_yul import YulVerifier
from snark_verifier_tpu.util import bn254

BASE = 21000  # Gtransaction


def wrap(body: str) -> str:
    """Micro-contract in the exact shell shape evm_render emits."""
    return (
        "contract T {\n    fallback() external {\n        assembly {\n"
        + body
        + "\n        }\n    }\n}\n"
    )


def run(body: str, calldata: bytes = b"") -> int:
    return YulVerifier(wrap(body)).run(calldata)


def calldata_gas(data: bytes) -> int:
    """YP Gtxdatazero=4 / Gtxdatanonzero=16 (EIP-2028)."""
    return sum(4 if b == 0 else 16 for b in data)


def mem_words_cost(words: int) -> int:
    """YP Cmem(a) = 3a + floor(a^2 / 512)."""
    return 3 * words + words * words // 512


# ---------------------------------------------------------------------------
# calldata + intrinsic gas
# ---------------------------------------------------------------------------


def test_intrinsic_and_calldata_gas():
    data = b"\x00\x01\x00\xff" + b"\x00" * 4
    assert run("return(0, 0)", data) == BASE + 6 * 4 + 2 * 16


# ---------------------------------------------------------------------------
# arithmetic / comparison opcodes (YP gas: addmod/mulmod 8, mod 5, others 3)
# ---------------------------------------------------------------------------


def test_arithmetic_ops_and_gas():
    gas = run(
        """
        let a := addmod(3, 4, 5)
        if iszero(eq(a, 2)) { revert(0, 0) }
        let b := mulmod(7, 9, 11)
        if iszero(eq(b, 8)) { revert(0, 0) }
        let c := mod(29, 12)
        if iszero(eq(c, 5)) { revert(0, 0) }
        let d := add(3, 4)
        if iszero(eq(d, 7)) { revert(0, 0) }
        let e := shl(4, 3)
        if iszero(eq(e, 48)) { revert(0, 0) }
        let f := and(12, 10)
        if iszero(eq(f, 8)) { revert(0, 0) }
        let g := lt(3, 4)
        if iszero(g) { revert(0, 0) }
        return(0, 0)
        """
    )
    # addmod 8 + mulmod 8 + mod 5 + add 3 + shl 3 + and 3 + lt 3
    # + 6 eq (3) + 7 iszero (3)
    assert gas == BASE + 8 + 8 + 5 + 3 + 3 + 3 + 3 + 6 * 3 + 7 * 3


def test_shl_and_add_wrap_mod_2_256():
    run(
        """
        let a := shl(255, 3)
        let want := 0x8000000000000000000000000000000000000000000000000000000000000000
        if iszero(eq(a, want)) { revert(0, 0) }
        let b := add(a, a)
        if iszero(iszero(b)) { revert(0, 0) }
        return(0, 0)
        """
    )


# ---------------------------------------------------------------------------
# memory: mstore/mload/mstore8 round trips + quadratic expansion metering
# ---------------------------------------------------------------------------


def test_memory_roundtrip_and_expansion_gas():
    gas = run(
        """
        mstore(0x0, 0xdeadbeef)
        let a := mload(0x0)
        if iszero(eq(a, 0xdeadbeef)) { revert(0, 0) }
        mstore(0x2000, 1)
        let b := mload(0x2000)
        if iszero(eq(b, 1)) { revert(0, 0) }
        return(0, 0)
        """
    )
    # mstore(0x0): expand 0 -> 1 word; mstore(0x2000): 1 -> 0x2020/32 = 257
    expansion = mem_words_cost(1) + (mem_words_cost(257) - mem_words_cost(1))
    # ops: 2 mstore (3 each; the model charges the op at statement level)
    #      + 2 mload 3 + 2 eq 3 + 2 iszero 3
    assert gas == BASE + expansion + 2 * 3 + 2 * 3 + 2 * 3 + 2 * 3


def test_mstore8_single_byte():
    run(
        """
        mstore(0x0, 0)
        mstore8(0x1f, 0x41)
        let a := mload(0x0)
        if iszero(eq(a, 0x41)) { revert(0, 0) }
        return(0, 0)
        """
    )


# ---------------------------------------------------------------------------
# keccak256 (YP: 30 + 6 per word + expansion)
# ---------------------------------------------------------------------------


def test_keccak256_value_and_gas():
    from snark_verifier_tpu.util.keccak import keccak256

    want = int.from_bytes(keccak256(b"\x00" * 64), "big")
    gas = run(
        f"""
        mstore(0x0, 0)
        mstore(0x20, 0)
        let h := keccak256(0x0, 0x40)
        if iszero(eq(h, {hex(want)})) {{ revert(0, 0) }}
        return(0, 0)
        """
    )
    assert gas == BASE + mem_words_cost(2) + 2 * 3 + (30 + 6 * 2) + 3 + 3


# ---------------------------------------------------------------------------
# control flow
# ---------------------------------------------------------------------------


def test_if_revert_fires():
    with pytest.raises(EvmRevert):
        run("if iszero(0) { revert(0, 0) }\nreturn(0, 0)")


def test_calldataload_beyond_end_zero_pads():
    run(
        """
        let a := calldataload(0x2)
        let want := 0xff00000000000000000000000000000000000000000000000000000000000000
        if iszero(eq(a, want)) { revert(0, 0) }
        return(0, 0)
        """,
        b"\x00\x00\xff",
    )


# ---------------------------------------------------------------------------
# validate_ec_point (template helper semantics)
# ---------------------------------------------------------------------------


def test_validate_ec_point():
    # generator accepted; y+1 rejected; x >= p rejected
    run(
        f"""
        let ok := validate_ec_point(1, 2)
        if iszero(ok) {{ revert(0, 0) }}
        let bad := validate_ec_point(1, 3)
        if bad {{ revert(0, 0) }}
        let oob := validate_ec_point({hex(bn254.P)}, 2)
        if oob {{ revert(0, 0) }}
        return(0, 0)
        """
    )


# ---------------------------------------------------------------------------
# precompiles (EIP-1108 prices; EIP-2929 warm account access = 100)
# ---------------------------------------------------------------------------

# publicly known BN254 small multiples of G = (1, 2)
_2G = (
    1368015179489954701390400359078579693043519447331113978918064868415326638035,
    9918110051302171585080402603319702774565515993150576347155970296011118125764,
)


def test_ecadd_precompile():
    gas = run(
        f"""
        mstore(0x0, 1)
        mstore(0x20, 2)
        mstore(0x40, 1)
        mstore(0x60, 2)
        let ok := staticcall(gas(), 0x6, 0x0, 0x80, 0x80, 0x40)
        if iszero(ok) {{ revert(0, 0) }}
        let x := mload(0x80)
        if iszero(eq(x, {hex(_2G[0])})) {{ revert(0, 0) }}
        let y := mload(0xa0)
        if iszero(eq(y, {hex(_2G[1])})) {{ revert(0, 0) }}
        return(0, 0)
        """
    )
    expansion = mem_words_cost(6)  # touched up to 0xc0
    assert gas == BASE + expansion + 4 * 3 + (100 + 150) + 2 * 3 + 3 * 3 + 2 * 3


def test_ecadd_identity_operand():
    # (0, 0) encodes the identity: G + 0 = G
    run(
        """
        mstore(0x0, 1)
        mstore(0x20, 2)
        mstore(0x40, 0)
        mstore(0x60, 0)
        let ok := staticcall(gas(), 0x6, 0x0, 0x80, 0x80, 0x40)
        if iszero(ok) { revert(0, 0) }
        let x := mload(0x80)
        if iszero(eq(x, 1)) { revert(0, 0) }
        let y := mload(0xa0)
        if iszero(eq(y, 2)) { revert(0, 0) }
        return(0, 0)
        """
    )


def test_ecadd_rejects_off_curve():
    with pytest.raises(EvmRevert):
        run(
            """
            mstore(0x0, 1)
            mstore(0x20, 3)
            mstore(0x40, 1)
            mstore(0x60, 2)
            let ok := staticcall(gas(), 0x6, 0x0, 0x80, 0x80, 0x40)
            return(0, 0)
            """
        )


def test_ecmul_precompile():
    k = 7
    want = bn254.g1_mul(bn254.G1_GEN, k)  # oracle-of-record
    gas = run(
        f"""
        mstore(0x0, 1)
        mstore(0x20, 2)
        mstore(0x40, {k})
        let ok := staticcall(gas(), 0x7, 0x0, 0x60, 0x60, 0x40)
        if iszero(ok) {{ revert(0, 0) }}
        let x := mload(0x60)
        if iszero(eq(x, {hex(want[0])})) {{ revert(0, 0) }}
        let y := mload(0x80)
        if iszero(eq(y, {hex(want[1])})) {{ revert(0, 0) }}
        return(0, 0)
        """
    )
    expansion = mem_words_cost(5)  # touched up to 0xa0
    assert gas == BASE + expansion + 3 * 3 + (100 + 6000) + 2 * 3 + 3 * 3 + 2 * 3


def test_modexp_precompile_gas_eip2565():
    # floor case: 3^5 mod 7 = 5; exp bit_length 3 -> 16*2//3 = 10 -> floor 200
    gas_floor = run(
        """
        mstore(0x0, 32)
        mstore(0x20, 32)
        mstore(0x40, 32)
        mstore(0x60, 3)
        mstore(0x80, 5)
        mstore(0xa0, 7)
        let ok := staticcall(gas(), 0x5, 0x0, 0xc0, 0xc0, 0x20)
        if iszero(ok) { revert(0, 0) }
        let r := mload(0xc0)
        if iszero(eq(r, 5)) { revert(0, 0) }
        return(0, 0)
        """
    )
    expansion = mem_words_cost(7)
    # post-call ops: iszero(ok) + mload + eq + iszero = 4 x 3
    assert gas_floor == BASE + expansion + 6 * 3 + (100 + 200) + 4 * 3

    # verifier-realistic case: exponent p-2 (Fermat inversion), 254 bits
    # -> iteration_count = 253, mult_complexity = ceil(32/8)^2 = 16,
    # gas = max(200, floor(16 * 253 / 3)) = 1349
    p = bn254.P
    want = pow(3, p - 2, p)
    gas_inv = run(
        f"""
        mstore(0x0, 32)
        mstore(0x20, 32)
        mstore(0x40, 32)
        mstore(0x60, 3)
        mstore(0x80, {hex(p - 2)})
        mstore(0xa0, {hex(p)})
        let ok := staticcall(gas(), 0x5, 0x0, 0xc0, 0xc0, 0x20)
        if iszero(ok) {{ revert(0, 0) }}
        let r := mload(0xc0)
        if iszero(eq(r, {hex(want)})) {{ revert(0, 0) }}
        return(0, 0)
        """
    )
    assert gas_inv == BASE + expansion + 6 * 3 + (100 + 16 * 253 // 3) + 4 * 3


def _g2_words(g2):
    """EIP-197 memory order: x_c1, x_c0, y_c1, y_c0."""
    (x0, x1), (y0, y1) = g2
    return [x1, x0, y1, y0]


def test_ecpairing_precompile():
    # e(G, G2) * e(-G, G2) == 1
    neg_g = (1, bn254.P - 2)
    words = [1, 2] + _g2_words(bn254.G2_GEN) + [neg_g[0], neg_g[1]] + _g2_words(
        bn254.G2_GEN
    )
    stores = "\n".join(
        f"mstore({hex(i * 32)}, {hex(w)})" for i, w in enumerate(words)
    )
    gas = run(
        f"""
        {stores}
        let ok := staticcall(gas(), 0x8, 0x0, 0x180, 0x180, 0x20)
        if iszero(ok) {{ revert(0, 0) }}
        let r := mload(0x180)
        if iszero(r) {{ revert(0, 0) }}
        return(0, 0)
        """
    )
    expansion = mem_words_cost(13)  # 12 input words + 1 output word
    assert gas == BASE + expansion + 12 * 3 + (100 + 45000 + 34000 * 2) + 3 + 2 * 3

    # and a NON-pairing (e(G, G2) * e(G, G2) != 1) must return 0
    words_bad = [1, 2] + _g2_words(bn254.G2_GEN) + [1, 2] + _g2_words(bn254.G2_GEN)
    stores_bad = "\n".join(
        f"mstore({hex(i * 32)}, {hex(w)})" for i, w in enumerate(words_bad)
    )
    with pytest.raises(EvmRevert):
        run(
            f"""
            {stores_bad}
            let ok := staticcall(gas(), 0x8, 0x0, 0x180, 0x180, 0x20)
            if iszero(ok) {{ revert(0, 0) }}
            let r := mload(0x180)
            if iszero(r) {{ revert(0, 0) }}
            return(0, 0)
            """
        )
