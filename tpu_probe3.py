"""LANES sweep for the fused whole-MSM kernel (grid-step overhead probe)."""
import json, os, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu_bench")
import jax.numpy as jnp
from snark_verifier_tpu.ops import field_pallas as FP

LANES = int(os.environ.get("PL", "512"))
FP.LANES = LANES

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops.msm_pallas import msm_batched_fused
from snark_verifier_tpu.ops.limbs import ints_to_limbs
from snark_verifier_tpu.util import bn254 as bn

B, n = int(os.environ.get("PB", "1820")), 18
import random
rng = random.Random(0)
scalars = None
base = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(n)]
pts1 = C.g1_from_affine_ints(base)
pts = C.G1(jnp.broadcast_to(pts1.x, (B, n, 16)), jnp.broadcast_to(pts1.y, (B, n, 16)), jnp.broadcast_to(pts1.z, (B, n, 16)))
scalars = [rng.randrange(bn.R) for _ in range(n)]
scal = jnp.asarray(np.broadcast_to(ints_to_limbs(scalars), (B, n, 16)).copy())

out = msm_batched_fused(pts, scal)
np.asarray(out.x)
# correctness spot check vs oracle (row 0; all rows identical by construction)
got = C.g1_to_affine_ints(C.G1(out.x[:1], out.y[:1], out.z[:1]))[0]
want = None
for p, s in zip(base, scalars):
    want = bn.g1_add(want, bn.g1_mul(p, s))
assert got == want, "fused MSM mismatch vs oracle"
ts = []
for _ in range(3):
    t0 = time.time(); out = msm_batched_fused(pts, scal); np.asarray(out.x); ts.append(time.time() - t0)
print(json.dumps({"lanes": LANES, "B": B, "best_s": round(min(ts), 4)}), flush=True)
