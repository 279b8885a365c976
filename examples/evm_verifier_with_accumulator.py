"""Example: EVM verifier for the REAL aggregated snark.

The k=21 aggregation circuit proven by examples/aggregation_e2e.py (with
the Keccak transcript) is verified ON-CHAIN: the generated contract
recomposes the folded inner accumulator's (lhs, rhs) from the 16 x 68-bit
instance limbs with add/shl + validate_ec_point
(loader/evm/loader.rs:176-214), folds it with the freshly-verified
accumulator under a keccak-derived challenge, and decides BOTH with a
single ecPairing call (pcs/kzg/decider.rs:146-185) — the reference's
evm-verifier-with-accumulator flow (test/kzg/evm.rs:125-140,
sdk evm.rs:112-178) with a real outer snark, not a mock.

Run examples/aggregation_e2e.py first (writes the fixture), then:
    python examples/evm_verifier_with_accumulator.py [out.sol]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey
from snark_verifier_tpu.sdk.evm import evm_verify, gen_evm_verifier
from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden",
    "aggregation_outer_1snark.json",
)


def load_fixture():
    with open(FIXTURE) as f:
        obj = json.load(f)
    protocol = protocol_from_json(obj["protocol"])
    instances = [[int(v, 16) for v in obj["instances"]]]
    proof_evm = bytes.fromhex(obj["proof_evm"])
    dk = KzgDecidingKey(
        svk=tuple(int(c, 16) for c in obj["dk"]["svk"]),
        g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["g2"]),
        s_g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["s_g2"]),
    )
    return protocol, instances, proof_evm, dk


def main():
    protocol, instances, proof_evm, dk = load_fixture()
    print(f"aggregated snark: k={protocol.domain.k}, "
          f"accumulator_indices={protocol.accumulator_indices}")

    path = sys.argv[1] if len(sys.argv) > 1 else None
    print("staging the verifier (incl. limb decode + RLC fold) into Yul...")
    verifier = gen_evm_verifier(protocol, KzgGwc, dk, path)
    npair = verifier.solidity.count("staticcall(gas(), 0x8")
    print(f"  {verifier.solidity.count(chr(10))} lines of Solidity, "
          f"{npair} ecPairing call (old + fresh accumulator folded)"
          + (f", written to {path}" if path else ""))

    print("running the contract on the real aggregated proof...")
    gas = evm_verify(verifier, instances, proof_evm)
    print(f"  ACCEPTED the aggregated snark on-chain, {gas} gas")

    bad = bytearray(proof_evm)
    bad[31] ^= 1
    try:
        evm_verify(verifier, instances, bytes(bad))
        raise SystemExit("mutated proof was not rejected!")
    except Exception as e:
        print(f"  rejected 1-byte-mutated proof ({type(e).__name__})")

    bad_limbs = [list(instances[0])]
    bad_limbs[0][5] ^= 1
    try:
        evm_verify(verifier, bad_limbs, proof_evm)
        raise SystemExit("corrupt accumulator limb was not rejected!")
    except Exception as e:
        print(f"  rejected corrupt accumulator limb ({type(e).__name__})")
    print("done")


if __name__ == "__main__":
    main()
