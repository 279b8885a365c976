"""Example: generate an EVM verifier contract and run it in-process
(the reference's snark-verifier/examples/evm-verifier.rs flow).

Run: python examples/evm_verifier.py [out.sol]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.sdk import gen_proof
from snark_verifier_tpu.sdk.evm import evm_verify, gen_evm_verifier
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 4


def main():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)

    path = sys.argv[1] if len(sys.argv) > 1 else None
    print("staging the verifier into Yul...")
    verifier = gen_evm_verifier(protocol, KzgGwc, srs.decider_key(), path)
    print(f"  {verifier.solidity.count(chr(10))} lines of Solidity"
          + (f" written to {path}" if path else ""))

    print("proving + running the contract on calldata...")
    instances = [[4242]]
    proof = gen_proof(pk, instances, "gwc")
    gas = evm_verify(verifier, instances, proof)
    print(f"  accepted valid proof, {gas} gas")

    bad = bytearray(proof)
    bad[133] ^= 1
    try:
        evm_verify(verifier, instances, bytes(bad))
        raise SystemExit("mutated proof was not rejected!")
    except Exception as e:
        print(f"  rejected mutated proof ({e})")
    print("done")


if __name__ == "__main__":
    main()
