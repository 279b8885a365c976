"""Example: EVM verifier for a protocol carrying an old accumulator in its
instance limbs (the reference's
snark-verifier/examples/evm-verifier-with-accumulator.rs flow).

The generated contract recomposes the old accumulator's (lhs, rhs) from
16 x 68-bit instance limbs with add/shl + validate_ec_point
(loader/evm/loader.rs:176-214), folds it with the freshly-verified
accumulator under a keccak-derived challenge, and decides BOTH with a
single ecPairing call (pcs/kzg/decider.rs:146-185).

Run: python examples/evm_verifier_with_accumulator.py [out.sol]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.sdk.evm import evm_verify, gen_evm_verifier
from snark_verifier_tpu.system.halo2.circuits import build_mock_accumulator_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 5


def main():
    srs = gen_srs(K)
    protocol, pk, limbs = build_mock_accumulator_plonk(K, srs)
    print(f"protocol with accumulator_indices={protocol.accumulator_indices}")

    path = sys.argv[1] if len(sys.argv) > 1 else None
    print("staging the verifier (incl. limb decode + RLC fold) into Yul...")
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key(), path)
    npair = verifier.solidity.count("staticcall(gas(), 0x8")
    print(f"  {verifier.solidity.count(chr(10))} lines of Solidity, "
          f"{npair} ecPairing call (old + fresh accumulator folded)"
          + (f", written to {path}" if path else ""))

    print("proving + running the contract on calldata...")
    proof = create_proof(pk, [limbs], "gwc")
    gas = evm_verify(verifier, [limbs], proof)
    print(f"  accepted valid proof with old accumulator, {gas} gas")

    bad = list(limbs)
    bad[5] ^= 1  # corrupt one limb -> off-curve recomposition
    bad_proof = create_proof(pk, [bad], "gwc")
    try:
        evm_verify(verifier, [bad], bad_proof)
        raise SystemExit("corrupt accumulator limb was not rejected!")
    except Exception as e:
        print(f"  rejected corrupt accumulator limb ({e})")
    print("done")


if __name__ == "__main__":
    main()
