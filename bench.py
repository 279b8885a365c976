"""Benchmark: batched Halo2 PLONK+KZG verification throughput on TPU.

Covers the BASELINE.md configs:
  1. GWC succinct batch verify (primary metric, k=BENCH_K standard-plonk)
  2. SHPLONK succinct batch verify
  3. batch decide (random-fold + one pairing) and a 2^20-point Pippenger MSM
  4. KZG accumulation of 4 proofs (native fold) + device decide

Process model (round 5): the parent runs EACH config in its own child
process (`python bench.py --child NAME`) so one config's abort/timeout —
e.g. the round-4 fatal `Check failed: limits[i] <= dim(i)` TPU crash that
zeroed BENCH_r04 — cannot destroy the other configs' measurements.  Child
detail goes to stderr; the child's LAST stdout line is a JSON fragment the
parent merges.  The parent's LAST stdout line is the primary metric:
  {"metric": ..., "value": N, "unit": "proofs/s", "vs_baseline": N,
   "configs": {...}, "partial": bool, "skipped_configs": [...]}

Timing forces a host copy (np.asarray) of every output leaf because
`block_until_ready` does NOT block through the axon TPU tunnel (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

K = int(os.environ.get("BENCH_K", "8"))
# default batch 1820: 1820 proofs x 18 MSM terms = 32760 lanes, filling the
# Pallas kernels' 32768-lane tier almost exactly (3640 fills the 65536 tier)
BATCH = int(os.environ.get("BENCH_BATCH", "1820"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
CONFIGS = os.environ.get("BENCH_CONFIGS", "1,2,3,4").split(",")
N_UNIQUE = 4
PER_CHIP_TARGET = 1000.0 / 8.0  # north-star v5e-8 target, per chip
# Internal wall budget: the driver kills the bench with SIGTERM after an
# unknown timeout (r3 died at ~2 configs / ~25 min); skip remaining configs
# once the budget is spent and ALWAYS emit the final metric line.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1080"))
_START = time.time()


def _detail(d):
    print(json.dumps({"detail": d}), file=sys.stderr)
    sys.stderr.flush()


def _budget_left():
    return BUDGET_S - (time.time() - _START)


# ---------------------------------------------------------------------------
# Parent: orchestrate config children, merge, always emit the final line.
# ---------------------------------------------------------------------------

_RESULT = {
    "primary": None,
    "configs": {},
    "partial": False,
    "skipped": [],
    "failed": [],
}
_CHILD = [None]


def _emit_result():
    configs = dict(_RESULT["configs"])
    configs["bench_wall_s"] = round(time.time() - _START, 1)
    primary = _RESULT["primary"]
    result = {
        "metric": "halo2_kzg_gwc_succinct_verify_throughput",
        "value": round(primary, 2) if primary else 0.0,
        "unit": "proofs/s",
        "vs_baseline": round(primary / PER_CHIP_TARGET, 4) if primary else 0.0,
        "configs": configs,
        "partial": bool(
            _RESULT["partial"] or _RESULT["skipped"] or _RESULT["failed"]
        ),
        "skipped_configs": _RESULT["skipped"],
        "failed_configs": _RESULT["failed"],
    }
    sys.stderr.flush()
    print(json.dumps(result))
    sys.stdout.flush()


def _on_term(signum, frame):
    _detail({"killed": signal.Signals(signum).name,
             "elapsed_s": round(time.time() - _START, 1)})
    _RESULT["partial"] = True
    child = _CHILD[0]
    if child is not None and child.poll() is None:
        child.terminate()
    _emit_result()
    os._exit(0)


def _run_child(name: str, timeout_s: float) -> bool:
    """Spawn `bench.py --child name`; merge its final-stdout-line JSON.
    Returns True on success."""
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", name],
        stdout=subprocess.PIPE,
        text=True,
    )
    _CHILD[0] = proc
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
        _RESULT["failed"].append({"config": name, "error": "timeout",
                                  "elapsed_s": round(time.time() - t0, 1)})
        _detail({"config": name, "error": "timeout"})
        return False
    finally:
        _CHILD[0] = None
    last = out.strip().splitlines()[-1] if out.strip() else ""
    if proc.returncode != 0:
        _RESULT["failed"].append({"config": name, "rc": proc.returncode,
                                  "elapsed_s": round(time.time() - t0, 1)})
        _detail({"config": name, "error": f"rc={proc.returncode}"})
        # a crashed child may still have printed partial fragments
    try:
        frag = json.loads(last) if last else {}
    except json.JSONDecodeError:
        frag = {}
    _RESULT["configs"].update(frag.get("configs", {}))
    if frag.get("primary"):
        _RESULT["primary"] = frag["primary"]
    return proc.returncode == 0


def parent():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # (name, min-budget-to-start).  2 runs last: it re-compiles a
    # ~config-1-sized graph for the least new information.
    plan = [("1", 0.0)]
    if "3" in CONFIGS:
        plan += [("3", 120.0), ("msm", 60.0)]
    if "4" in CONFIGS:
        plan.append(("4", 90.0))
    if "2" in CONFIGS:
        plan.append(("2", 60.0))
    if os.environ.get("BENCH_KERNELS", "1") == "1":
        # on by default since round 5: ~2 min warm, and the driver's run
        # should carry the SoL table (BENCH_KERNELS=0 disables)
        plan.append(("kernels", 90.0))

    for name, need in plan:
        left = _budget_left()
        if left <= need:
            _RESULT["skipped"].append(name)
            _detail({"config": name, "skipped": "budget",
                     "left_s": round(left, 1)})
            continue
        _run_child(name, timeout_s=max(left, 30.0))

    # flagship recursion metrics recorded by examples/aggregation_e2e.py
    # (the k=20 aggregation circuit proven by the threaded native prover)
    fx = os.path.join(os.path.dirname(__file__), "tests", "golden",
                      "aggregation_outer_1snark.json")
    if os.path.exists(fx):
        with open(fx) as f:
            agg = json.load(f)
        for key in ("prove_s", "rows", "outer_k", "verified_on",
                    "verify_decide_s"):
            if agg.get(key) is not None:
                _RESULT["configs"][f"aggregation_{key}"] = agg[key]

    _emit_result()


# ---------------------------------------------------------------------------
# Children: one config per process.
# ---------------------------------------------------------------------------


def _child_emit(configs, primary=None):
    sys.stderr.flush()
    print(json.dumps({"configs": configs, "primary": primary}))
    sys.stdout.flush()


def _sync(out):
    """Force device->host copies; the only reliable timing barrier here."""
    import jax
    import numpy as np

    return jax.tree_util.tree_map(np.asarray, out)


def _bench_fn(fn, *args, iters=ITERS):
    """Returns (best_seconds, first_output, compile_seconds)."""
    t0 = time.time()
    out = _sync(fn(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = _sync(fn(*args))
        times.append(time.time() - t0)
    return min(times), out, compile_s


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu_bench")
    return jax


def _proof_batch(pk, scheme):
    import jax.numpy as jnp

    from snark_verifier_tpu.parallel.batch import pack_instances, pack_proofs
    from snark_verifier_tpu.sdk import gen_proof

    instances = [[[10_000 + i]] for i in range(N_UNIQUE)]
    proofs = [
        gen_proof(pk, ins, scheme, cache_name=f"bench_k{K}_{i}")
        for i, ins in enumerate(instances)
    ]
    reps = BATCH // N_UNIQUE
    proof_arr = jnp.tile(pack_proofs(proofs), (reps, 1))
    inst_arr = jnp.tile(pack_instances(instances), (reps, 1, 1))
    return proof_arr, inst_arr


def _build_protocol():
    from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
    from snark_verifier_tpu.system.halo2.srs import gen_srs

    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)
    return srs, protocol, pk


def child_succinct(scheme: str):
    jax = _setup_jax()

    from snark_verifier_tpu.parallel.batch import build_verifier
    from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk

    srs, protocol, pk = _build_protocol()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    proof_arr, inst_arr = _proof_batch(pk, scheme)
    fn = jax.jit(build_verifier(protocol, As, srs.g[0]))
    best, out, compile_s = _bench_fn(fn, proof_arr, inst_arr)
    assert bool(out["ok"].all()), f"{scheme} proofs failed verification"
    rate = BATCH / best
    cfg_no = 1 if scheme == "gwc" else 2
    _detail({"config": cfg_no, "batch": BATCH, "k": K,
             "best_s": round(best, 4), "compile_s": round(compile_s, 1),
             "device": str(jax.devices()[0])})
    configs = {f"{scheme}_succinct_proofs_per_s": round(rate, 2),
               f"{scheme}_compile_s": round(compile_s, 1)}
    _child_emit(configs, primary=rate if scheme == "gwc" else None)


def _synthetic_accumulators(n: int):
    """n valid KZG accumulator pairs (lhs = tau*rhs) as canonical affine
    limb arrays — decoupled from config 1 so the decide bench stands alone.
    Validity: e(r*tau*G, g2) == e(r*G, tau*g2)."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from snark_verifier_tpu.ops.limbs import ints_to_limbs
    from snark_verifier_tpu.system.halo2.srs import gen_srs
    from snark_verifier_tpu.util import bn254 as bn

    srs = gen_srs(K)
    rng = random.Random(5)
    uniq = 64
    rs = [rng.randrange(1, bn.R) for _ in range(uniq)]
    lhs = [bn.g1_mul(srs.g[1], r) for r in rs]
    rhs = [bn.g1_mul(srs.g[0], r) for r in rs]
    reps = -(-n // uniq)  # ceil: n need not divide uniq (trim below)

    def pack(points, coord):
        arr = ints_to_limbs([p[coord] for p in points])
        return jnp.asarray(np.tile(arr, (reps, 1))[:n])

    dk = srs.decider_key()
    return (pack(lhs, 0), pack(lhs, 1), pack(rhs, 0), pack(rhs, 1)), dk


def child_decide():
    _setup_jax()
    import random

    import jax.numpy as jnp
    import numpy as np

    from snark_verifier_tpu.ops.limbs import ints_to_limbs
    from snark_verifier_tpu.parallel.batch import build_batch_decider
    from snark_verifier_tpu.util import bn254 as bn

    (lx, ly, rx, ry), dk = _synthetic_accumulators(BATCH)
    decider = build_batch_decider(dk)
    rng = random.Random(0)
    fold = jnp.asarray(
        np.stack([ints_to_limbs([rng.randrange(bn.R)])[0] for _ in range(BATCH)])
    )
    best, ok, compile_s = _bench_fn(decider, lx, ly, rx, ry, fold, iters=1)
    assert bool(np.asarray(ok)), "config-3 batch decide failed"
    _detail({"config": 3, "decide_best_s": round(best, 4),
             "compile_s": round(compile_s, 1)})
    _child_emit({"batch_decide_s": round(best, 4),
                 "decide_compile_s": round(compile_s, 1)})


def child_msm():
    """Large-MSM throughput (BASELINE config 3 scale: 2^20 points)."""
    _setup_jax()
    import random

    import jax.numpy as jnp
    import numpy as np

    from snark_verifier_tpu.ops import curve as C
    from snark_verifier_tpu.ops import msm as M
    from snark_verifier_tpu.ops.limbs import ints_to_limbs
    from snark_verifier_tpu.util import bn254 as bn

    logn = int(os.environ.get("BENCH_MSM_LOGN", "20"))
    n = 1 << logn
    rng = random.Random(0)
    base = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(64)]
    pts = C.g1_from_affine_ints(base * (n // 64))
    scal = jnp.asarray(
        np.tile(ints_to_limbs([rng.randrange(bn.R) for _ in range(64)]), (n // 64, 1))
    )
    # logn >= 18: the (nwin, n) working set would blow HBM — window-chunked.
    w = int(os.environ.get("BENCH_MSM_WINDOW", "11"))
    signed = os.environ.get("BENCH_MSM_SIGNED", "1") == "1"
    nwin = -(-256 // w)
    chunk = int(os.environ.get("BENCH_MSM_CHUNK", "0")) or min(4, nwin)
    while nwin % chunk:
        chunk -= 1
    msm = (
        (lambda p, s, w: M.msm_serial(p, s, w, signed))
        if logn < 18
        else (lambda p, s, w: M.msm_serial_chunked(p, s, w, win_chunk=chunk,
                                                   signed=signed))
    )
    out = msm(pts, scal, w)
    np.asarray(out.x)
    t0 = time.time()
    out = msm(pts, scal, w)
    np.asarray(out.x)
    dt = time.time() - t0
    _detail({"msm_points": n, "msm_s": round(dt, 3),
             "points_per_s": round(n / dt)})
    _child_emit({f"msm_2e{logn}_points_per_s": round(n / dt)})


def child_aggregation():
    _setup_jax()
    import numpy as np

    from snark_verifier_tpu.ops import pairing as PAIR
    from snark_verifier_tpu.ops.curve import g1_from_affine_ints
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.sdk import gen_snark
    from snark_verifier_tpu.sdk.aggregation import aggregate_native

    srs, protocol, pk = _build_protocol()
    snarks = [
        gen_snark(pk, [[20_000 + i]], "gwc", cache_name=f"bench_agg_k{K}_{i}",
                  transcript_kind="poseidon")
        for i in range(4)
    ]
    t0 = time.time()
    agg = aggregate_native(KzgGwc, srs.g[0], snarks)
    fold_s = time.time() - t0
    dk = srs.decider_key()
    lhs = g1_from_affine_ints([agg.accumulator.lhs.value])
    rhs = g1_from_affine_ints([agg.accumulator.rhs.value])
    ok4 = _sync(PAIR.kzg_pairing_check(lhs, rhs, dk.g2, dk.s_g2))
    t0 = time.time()
    ok4 = _sync(PAIR.kzg_pairing_check(lhs, rhs, dk.g2, dk.s_g2))
    decide4_s = time.time() - t0
    assert bool(np.asarray(ok4).all()), "config-4 aggregation decide failed"
    _detail({"config": 4, "fold_s": round(fold_s, 4),
             "decide_s": round(decide4_s, 4)})
    _child_emit({"aggregate_4_fold_s": round(fold_s, 4),
                 "aggregate_decide_s": round(decide4_s, 4)})


def child_kernels():
    """Per-kernel throughput vs speed-of-light (BASELINE.md demands the
    table; the SoL denominators are derived in PERF.md from v5e VPU/MXU
    datasheet rates and per-element op counts)."""
    jax = _setup_jax()
    import random

    import jax.numpy as jnp
    import numpy as np

    from snark_verifier_tpu.ops import curve as C
    from snark_verifier_tpu.ops import field as F
    from snark_verifier_tpu.ops.limbs import ints_to_limbs
    from snark_verifier_tpu.util import bn254 as bn

    configs = {}
    rng = random.Random(0)
    # 32768 = the Pallas kernels' base lane tier; report the tier the
    # MSM/verifier paths actually fill.
    B = int(os.environ.get("BENCH_KERNEL_BATCH", "32768"))
    CHAIN = int(os.environ.get("BENCH_KERNEL_CHAIN", "32"))

    def timeit_chain(step, init, reps=3):
        """Time CHAIN data-dependent iterations inside ONE jit, returning a
        tiny slice — isolates device throughput from the tunnel transfer."""

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (step(c), None), c, None,
                                length=CHAIN)
            return jax.tree_util.tree_map(lambda x: x.reshape(-1)[:1], c)

        _sync(run(init))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            _sync(run(init))
            best = min(best, time.time() - t0)
        return best

    a = jnp.asarray(np.asarray(ints_to_limbs([rng.randrange(bn.P) for _ in range(256)])))
    a = jnp.tile(a, (B // 256, 1))
    b = jnp.roll(a, 1, axis=0)

    dt = timeit_chain(lambda c: (F.mont_mul(c[0], c[1], F.FQ), c[0]), (a, b))
    configs["sol_mont_mul_ops_per_s"] = round(B * CHAIN / dt)

    base = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(256)]
    p = C.g1_from_affine_ints(base * (B // 256))
    q = C.G1(jnp.roll(p.x, 1, 0), jnp.roll(p.y, 1, 0), jnp.roll(p.z, 1, 0))

    from snark_verifier_tpu.ops.curve import _g1_add_xla

    dt = timeit_chain(lambda c: (_g1_add_xla(c[0], c[1]), c[0]), (p, q))
    configs["sol_g1_add_ops_per_s"] = round(B * CHAIN / dt)

    from snark_verifier_tpu import config as cfg

    if cfg.use_pallas():
        from snark_verifier_tpu.ops import curve_pallas as CP

        dt = timeit_chain(lambda c: (CP.g1_add_pallas(c[0], c[1]), c[0]), (p, q))
        configs["sol_g1_add_pallas_ops_per_s"] = round(B * CHAIN / dt)

        mask = jnp.asarray(np.arange(B) % 3 != 0)
        dt = timeit_chain(
            lambda c: (CP.g1_add_select_pallas(mask, c[0], c[1]), c[0]), (p, q)
        )
        configs["sol_g1_add_select_pallas_ops_per_s"] = round(B * CHAIN / dt)

    from snark_verifier_tpu.ops import poseidon as POS
    from snark_verifier_tpu.util.poseidon import default_spec

    spec = default_spec()
    state = jnp.asarray(
        np.asarray(ints_to_limbs([rng.randrange(bn.R) for _ in range(5 * 1024)])).reshape(
            1024, 5, 16
        )
    )
    state = jnp.tile(state, (max(1, B // 16384), 1, 1))
    nperm = state.shape[0]
    dt = timeit_chain(lambda s: POS.permutation(spec, s, []), state)
    configs["sol_poseidon_perm_per_s"] = round(nperm * CHAIN / dt)

    from snark_verifier_tpu.ops import keccak as KEC

    lanes = jnp.asarray(
        np.random.RandomState(0)
        .randint(0, 1 << 31, size=(nperm, 25, 2))
        .astype(np.uint32)
    )
    dt = timeit_chain(KEC.keccak_f, lanes)
    configs["sol_keccak_f_per_s"] = round(nperm * CHAIN / dt)

    _detail({k: v for k, v in configs.items() if k.startswith("sol_")})
    _child_emit(configs)


_CHILDREN = {
    "1": lambda: child_succinct("gwc"),
    "2": lambda: child_succinct("shplonk"),
    "3": child_decide,
    "msm": child_msm,
    "4": child_aggregation,
    "kernels": child_kernels,
}


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _CHILDREN[sys.argv[2]]()
    else:
        parent()
