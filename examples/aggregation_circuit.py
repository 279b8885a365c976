"""Example: the in-circuit AggregationCircuit pass (Halo2Loader).

The reference's flagship recursion flow (snark-verifier-sdk
halo2/aggregation.rs): verify app snarks INSIDE a circuit, so the outer
proof's public instances are the folded accumulator's 4x68-bit limbs and a
single pairing check at the end decides every aggregated proof.

1. prove two StandardPlonk snarks (Poseidon transcript),
2. native pre-pass: succinct-verify + fold (aggregate_native),
3. in-circuit pass: the SAME verification run interpreted by the
   Halo2Loader — every challenge, field op, and MSM becomes a circuit
   constraint (~3.7M rows for two snarks with the CRT integer gadget —
   the reference aggregates 3 snarks in ~4.2M rows at k=22),
   checked by the StreamingChecker (MockProver analogue),
4. the exposed instance limbs must match the native pre-pass byte-for-byte,
5. decide the folded accumulator.

Run: python examples/aggregation_circuit.py   (~2 min, CPU-only)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.pcs.kzg.decider import decide
from snark_verifier_tpu.sdk import gen_snark
from snark_verifier_tpu.sdk.aggregation import aggregate_in_circuit, aggregate_native
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 4

srs = gen_srs(K)
protocol, pk = build_standard_plonk(K, srs)

snarks = [
    gen_snark(pk, [[v]], "gwc", cache_name=None, transcript_kind="poseidon")
    for v in (111, 222)
]
print(f"proved {len(snarks)} app snarks (k={K})")

native = aggregate_native(KzgGwc, srs.g[0], snarks)
print("native pre-pass folded accumulator; instance limbs:",
      [hex(v)[:8] for v in native.instances[:4]], "...")

t0 = time.time()
builder, exposed = aggregate_in_circuit(
    KzgGwc, srs.g[0], snarks, as_proof=native.as_proof
)
failures = builder.check_witness()
print(f"in-circuit pass: {builder.n_rows:,} rows synthesized+checked "
      f"in {time.time()-t0:.1f}s; constraint failures: {len(failures)}")
print("row metering:",
      {k: f"{v:,}" for k, v in sorted(builder.row_costs.items())})
assert not failures
assert exposed == native.instances, "in-circuit limbs != native pre-pass"
print("exposed instances byte-identical to the native pre-pass")

dk = srs.decider_key()
assert decide(dk, native.accumulator)
print("folded accumulator decided (pairing check): OK")
print("done")
