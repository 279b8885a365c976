"""Benchmark: batched Halo2 PLONK+KZG verification throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "proofs/s", "vs_baseline": N}

vs_baseline is measured throughput relative to the repo north star
(BASELINE.json: >= 1000 proofs/s on a v5e-8, i.e. 125 proofs/s/chip); this
bench runs on however many chips are visible (usually one).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Use the default platform (TPU under axon; CPU elsewhere).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu_bench")

from snark_verifier_tpu.parallel.batch import (  # noqa: E402
    build_verifier,
    pack_instances,
    pack_proofs,
)
from snark_verifier_tpu.pcs.kzg import KzgGwc  # noqa: E402
from snark_verifier_tpu.sdk import gen_proof  # noqa: E402
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk  # noqa: E402
from snark_verifier_tpu.system.halo2.srs import gen_srs  # noqa: E402

K = int(os.environ.get("BENCH_K", "4"))
# default batch 3640: 3640 proofs x 18 MSM terms = 65520 lanes, filling the
# Pallas kernels' 65536-lane tier almost exactly (1820 fills the 32768 tier)
BATCH = int(os.environ.get("BENCH_BATCH", "3640"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
N_UNIQUE = 4


def main():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)

    instances = [[[10_000 + i]] for i in range(N_UNIQUE)]
    proofs = [
        gen_proof(pk, ins, "gwc", cache_name=f"bench_k{K}_{i}")
        for i, ins in enumerate(instances)
    ]
    reps = BATCH // N_UNIQUE
    proof_arr = jnp.tile(pack_proofs(proofs), (reps, 1))
    inst_arr = jnp.tile(pack_instances(instances), (reps, 1, 1))

    fn = jax.jit(build_verifier(protocol, KzgGwc, srs.g[0]))

    t0 = time.time()
    out = fn(proof_arr, inst_arr)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    assert bool(np.asarray(out["ok"]).all()), "bench proofs failed verification"

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        out = fn(proof_arr, inst_arr)
        jax.block_until_ready(out)
        times.append(time.time() - t0)

    best = min(times)
    throughput = BATCH / best
    per_chip_target = 1000.0 / 8.0  # north-star v5e-8 target, per chip
    result = {
        "metric": "halo2_kzg_gwc_succinct_verify_throughput",
        "value": round(throughput, 2),
        "unit": "proofs/s",
        "vs_baseline": round(throughput / per_chip_target, 4),
    }
    print(json.dumps(result))

    if os.environ.get("BENCH_MSM") == "1":
        _msm_bench()
    print(
        json.dumps(
            {
                "detail": {
                    "batch": BATCH,
                    "k": K,
                    "iters": ITERS,
                    "best_s": round(best, 4),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


def _msm_bench():
    """Optional large-MSM throughput (BASELINE config 3 scale), to stderr."""
    import random

    from snark_verifier_tpu.ops import curve as C
    from snark_verifier_tpu.ops import msm as M
    from snark_verifier_tpu.ops.limbs import ints_to_limbs
    from snark_verifier_tpu.util import bn254 as bn

    n = 1 << int(os.environ.get("BENCH_MSM_LOGN", "14"))
    rng = random.Random(0)
    base = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(64)]
    pts = C.g1_from_affine_ints(base * (n // 64))
    scal = jnp.asarray(
        np.tile(ints_to_limbs([rng.randrange(bn.R) for _ in range(64)]), (n // 64, 1))
    )
    out = M.msm_serial(pts, scal, 8)
    np.asarray(out.x)
    t0 = time.time()
    out = M.msm_serial(pts, scal, 8)
    np.asarray(out.x)
    dt = time.time() - t0
    print(
        json.dumps(
            {"detail": {"msm_points": n, "msm_s": round(dt, 3), "points_per_s": round(n / dt)}}
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
