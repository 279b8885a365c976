"""Component timing on TPU: MSM alone (fused vs XLA) and verify-minus-MSM."""
import os, time, json
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu_bench")
import jax.numpy as jnp
from snark_verifier_tpu.ops import curve as C, msm as M
from snark_verifier_tpu.ops.msm_pallas import msm_batched_fused
from snark_verifier_tpu.ops.limbs import ints_to_limbs
from snark_verifier_tpu.util import bn254 as bn

B, n = int(os.environ.get("PB", "1820")), 18
import random
rng = random.Random(0)
base = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(n)]
pts1 = C.g1_from_affine_ints(base)
pts = C.G1(jnp.broadcast_to(pts1.x, (B, n, 16)), jnp.broadcast_to(pts1.y, (B, n, 16)), jnp.broadcast_to(pts1.z, (B, n, 16)))
scal = jnp.asarray(np.broadcast_to(ints_to_limbs([rng.randrange(bn.R) for _ in range(n)]), (B, n, 16)).copy())

def timeit(name, f, *a):
    out = f(*a); np.asarray(out.x)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*a); np.asarray(out.x); ts.append(time.time() - t0)
    print(json.dumps({"name": name, "best_s": round(min(ts), 4)}), flush=True)

timeit("msm_fused_B1820_n18", msm_batched_fused, pts, scal)
timeit("msm_xla_B1820_n18", M._msm_batched_xla, pts, scal)
