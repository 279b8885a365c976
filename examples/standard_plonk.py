"""Example: the SDK flow of the reference's standard_plonk example
(snark-verifier-sdk/examples/standard_plonk.rs), TPU-first.

1. build the StandardPlonk protocol + proving key,
2. prove 3 app snarks (Poseidon transcript, SHPLONK),
3. aggregate their accumulators natively (the AggregationCircuit pre-pass),
4. decide the folded accumulator (pairing check),
5. batch-verify the same snarks on the device backend.

Run: python examples/standard_plonk.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from snark_verifier_tpu.parallel.batch import build_verifier, pack_instances, pack_proofs
from snark_verifier_tpu.pcs.kzg import KzgShplonk
from snark_verifier_tpu.pcs.kzg.decider import decide
from snark_verifier_tpu.sdk import gen_snark
from snark_verifier_tpu.sdk.aggregation import aggregate_native
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 4


def main():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)

    print("proving 3 snarks (SHPLONK, poseidon transcript)...")
    snarks = [
        gen_snark(pk, [[100 + i]], "shplonk", transcript_kind="poseidon")
        for i in range(3)
    ]

    print("aggregating accumulators (native pre-pass)...")
    result = aggregate_native(KzgShplonk, srs.g[0], snarks)
    print(f"  folded accumulator limbs (public instances): {len(result.instances)}")

    print("deciding folded accumulator (pairing)...")
    assert decide(srs.decider_key(), result.accumulator) is True
    print("  pairing check passed")

    print("batched device verification of the same snarks...")
    evm_snarks = [
        gen_snark(pk, [[100 + i]], "shplonk") for i in range(3)
    ]  # keccak transcript for the device/EVM path
    fn = jax.jit(build_verifier(protocol, KzgShplonk, srs.g[0]))
    out = fn(
        pack_proofs([s.proof for s in evm_snarks]),
        pack_instances([s.instances for s in evm_snarks]),
    )
    print(f"  ok mask: {np.asarray(out['ok']).tolist()}")
    assert bool(np.asarray(out["ok"]).all())
    print("done")


if __name__ == "__main__":
    main()
