"""TPU iteration harness: fused-MSM batch verify, timed honestly."""
import json, os, sys, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu_bench")
import jax.numpy as jnp
from snark_verifier_tpu.parallel.batch import build_verifier, pack_proofs, pack_instances
from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.sdk import gen_proof
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = int(os.environ.get("BENCH_K", "4"))
B = int(os.environ.get("BENCH_BATCH", "1820"))
srs = gen_srs(K)
protocol, pk = build_standard_plonk(K, srs)
ins = [[[10_000 + i]] for i in range(4)]
proofs = [gen_proof(pk, i, "gwc", cache_name=f"bench_k{K}_{j}") for j, i in enumerate(ins)]
pa = jnp.tile(pack_proofs(proofs), (B // 4, 1))
ia = jnp.tile(pack_instances(ins), (B // 4, 1, 1))
fn = jax.jit(build_verifier(protocol, KzgGwc, srs.g[0]))
t0 = time.time()
out = {k: np.asarray(v) for k, v in fn(pa, ia).items()}
print("compile+first run:", round(time.time() - t0, 1), "s", flush=True)
assert out["ok"].all(), f"verify failed: {out['ok'].sum()}/{B}"
for _ in range(3):
    t0 = time.time()
    out = {k: np.asarray(v) for k, v in fn(pa, ia).items()}
    dt = time.time() - t0
    print(json.dumps({"batch": B, "s": round(dt, 4), "proofs_per_s": round(B / dt, 1),
                      "fused": os.environ.get("SVTPU_MSM_FUSED", "auto")}), flush=True)
