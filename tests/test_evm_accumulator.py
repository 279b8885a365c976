"""EVM recursion-instance path: the generated contract recomposes the old
accumulator from 68-bit instance limbs (loader/evm/loader.rs:176-214), folds
it with the fresh accumulator under a keccak challenge, and decides both
with ONE ecPairing (pcs/kzg/decider.rs:146-185) — the flow of the
reference's evm-verifier-with-accumulator example."""

import pytest

from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.sdk.evm import EvmRevert, evm_verify, gen_evm_verifier
from snark_verifier_tpu.system.halo2.circuits import build_mock_accumulator_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 5


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk, limbs = build_mock_accumulator_plonk(K, srs)
    return srs, protocol, pk, limbs


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_evm_verifier_decides_old_and_fresh(setup, scheme):
    srs, protocol, pk, limbs = setup
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = gen_evm_verifier(protocol, As, srs.decider_key())
    proof = create_proof(pk, [limbs], scheme)
    gas = evm_verify(verifier, [limbs], proof)
    assert 150_000 < gas < 2_500_000, gas
    # exactly ONE pairing despite two accumulators (the RLC fold)
    assert verifier.solidity.count("staticcall(gas(), 0x8") == 1
    # limb recomposition is in the artifact
    assert "shl(68," in verifier.solidity


def test_evm_verifier_rejects_corrupt_limb(setup):
    """A flipped limb decodes to an off-curve point -> validate_ec_point
    reverts (both the IR executor and the rendered Yul)."""
    srs, protocol, pk, limbs = setup
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key())
    bad = list(limbs)
    bad[5] ^= 1
    proof = create_proof(pk, [bad], "gwc")
    with pytest.raises(EvmRevert):
        evm_verify(verifier, [bad], proof)


def test_evm_verifier_rejects_wrong_old_accumulator(setup):
    """Limbs of a VALID curve pair that is not a valid accumulator must fail
    the folded pairing, not the on-curve validation."""
    from snark_verifier_tpu.pcs.kzg.accumulator import fe_to_limbs
    from snark_verifier_tpu.util import bn254

    srs, protocol, pk, limbs = setup
    wrong = bn254.g1_mul(bn254.G1_GEN, 7)  # on-curve, wrong pair vs (tau*G, G)
    bad = []
    for coord in (wrong[0], wrong[1], srs.g[0][0], srs.g[0][1]):
        bad.extend(fe_to_limbs(coord))
    proof = create_proof(pk, [bad], "gwc")
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key())
    with pytest.raises(EvmRevert):
        evm_verify(verifier, [bad], proof)
