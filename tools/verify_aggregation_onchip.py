"""Re-verify the recursion flagship ON-CHIP and stamp the golden fixture.

Loads tests/golden/aggregation_outer_1snark.json (written by
examples/aggregation_e2e.py after the k=20 aggregation circuit is proven),
then on the real TPU:

  1. runs the DEVICE succinct verifier (parallel.batch.build_verifier) over
     the outer proof (padded to a small batch),
  2. decides both the fresh accumulator and the old accumulator decoded
     from the outer instances with the device pairing kernel,
  3. negative probe: a 1-byte proof mutation must flip ok to False,

and records `verified_on` / `verify_decide_s` back into the fixture, which
bench.py surfaces as aggregation_* keys in the driver benchmark output.

Reference parity: the outer-snark verify+decide of
snark-verifier-sdk/examples/standard_plonk.rs:158-184 executed on the
device backend instead of the native one.

Run: python tools/verify_aggregation_onchip.py  (~3-6 min, mostly compile)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu_bench")

    from snark_verifier_tpu.ops import pairing as PAIR
    from snark_verifier_tpu.ops.curve import g1_from_affine_ints
    from snark_verifier_tpu.parallel.batch import (
        build_verifier,
        decode_accumulator,
        pack_instances,
        pack_proofs,
    )
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey
    from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "aggregation_outer_1snark.json",
    )
    with open(path) as f:
        fx = json.load(f)

    protocol = protocol_from_json(fx["protocol"])
    proof = bytes.fromhex(fx["proof"])
    instances = [int(v, 16) for v in fx["instances"]]
    dk = KzgDecidingKey(
        svk=tuple(int(c, 16) for c in fx["dk"]["svk"]),
        g2=tuple(tuple(int(c, 16) for c in pair) for pair in fx["dk"]["g2"]),
        s_g2=tuple(tuple(int(c, 16) for c in pair) for pair in fx["dk"]["s_g2"]),
    )

    B = 8  # pad the single outer proof to a small batch
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    fn = jax.jit(build_verifier(protocol, KzgGwc, dk.svk,
                                transcript_kind="poseidon"))
    proof_arr = pack_proofs([proof] * B)
    inst_arr = pack_instances([[instances]] * B)

    t0 = time.time()
    out = jax.tree_util.tree_map(np.asarray, fn(proof_arr, inst_arr))
    compile_s = time.time() - t0
    assert bool(out["ok"].all()), "outer snark rejected by the device verifier"

    t0 = time.time()
    out = jax.tree_util.tree_map(np.asarray, fn(proof_arr, inst_arr))
    verify_s = time.time() - t0

    # decide BOTH accumulators (fresh + decoded-from-instances) on-chip
    t0 = time.time()
    n_acc = out["lhs_x"].shape[0] if out["lhs_x"].ndim == 3 else 1
    for a in range(n_acc):
        (lhs, rhs) = decode_accumulator(
            {k: (v[a] if v.ndim == 3 else v) for k, v in out.items()
             if k != "ok"},
            index=0,
        )
        ok = np.asarray(
            PAIR.kzg_pairing_check(
                g1_from_affine_ints([lhs]), g1_from_affine_ints([rhs]),
                dk.g2, dk.s_g2,
            )
        )
        assert bool(ok.all()), f"accumulator {a} decide failed on-chip"
    decide_s = time.time() - t0
    print(f"verify {verify_s:.3f}s (compile {compile_s:.1f}s), "
          f"decide x{n_acc} {decide_s:.3f}s", flush=True)

    # negative probe: 1-byte mutation must be rejected
    bad = bytearray(proof)
    bad[7] ^= 1
    bad_arr = pack_proofs([bytes(bad)] * B)
    out_bad = jax.tree_util.tree_map(np.asarray, fn(bad_arr, inst_arr))
    assert not bool(out_bad["ok"].any()), "mutated proof must be rejected"
    print("negative probe: mutated outer proof rejected on-chip", flush=True)

    fx["verified_on"] = str(dev)
    fx["verify_decide_s"] = round(verify_s + decide_s, 3)
    fx["onchip_verify_s"] = round(verify_s, 3)
    fx["onchip_decide_s"] = round(decide_s, 3)
    with open(path, "w") as f:
        json.dump(fx, f)
    print(f"fixture stamped: verified_on={fx['verified_on']} "
          f"verify_decide_s={fx['verify_decide_s']}", flush=True)


if __name__ == "__main__":
    main()
