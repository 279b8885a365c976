"""EvmLoader: generated EVM verifier accepts valid proofs, rejects mutations
(the reference's test/kzg/evm.rs flow, executed in-process)."""

import pytest

from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.sdk import gen_proof
from snark_verifier_tpu.sdk.evm import EvmRevert, evm_verify, gen_evm_verifier
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)
    return srs, protocol, pk


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_generated_verifier_accepts(setup, scheme):
    """evm_verify runs BOTH the rendered Yul text and the IR (differential)
    and returns modeled gas on accept (interpreter gas schedule; no real
    EVM in this environment — see loader/evm_yul.py)."""
    srs, protocol, pk = setup
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = gen_evm_verifier(protocol, As, srs.decider_key())
    proof = gen_proof(pk, [[4242]], scheme)
    gas = evm_verify(verifier, [[4242]], proof)
    # sanity bracket: a handful of ecMuls + one pairing but far below 10M
    assert 150_000 < gas < 2_000_000, gas


def test_generated_verifier_rejects_mutation(setup):
    srs, protocol, pk = setup
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key())
    proof = bytearray(gen_proof(pk, [[4242]], "gwc"))
    proof[133] ^= 1  # single-byte calldata mutation must revert
    with pytest.raises(EvmRevert):
        evm_verify(verifier, [[4242]], bytes(proof))


def test_generated_verifier_rejects_wrong_instance(setup):
    srs, protocol, pk = setup
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key())
    proof = gen_proof(pk, [[4242]], "gwc")
    with pytest.raises(EvmRevert):
        evm_verify(verifier, [[4243]], proof)


def test_solidity_output_structure(setup):
    srs, protocol, pk = setup
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key())
    sol = verifier.solidity
    assert "contract Halo2Verifier" in sol
    assert "validate_ec_point" in sol
    assert "staticcall(gas(), 0x8" in sol  # pairing
    assert "staticcall(gas(), 0x7" in sol  # ecMul
    assert "keccak256" in sol
    assert sol.count("\n") > 100
