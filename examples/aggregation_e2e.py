"""Flagship example: the CLOSED recursion loop.

Inner snarks -> in-circuit aggregation (the succinct verifier synthesized
as a real circuit by the Halo2Loader over a recording CircuitBuilder) ->
the OUTER snark proven by the threaded native host prover at k>=21 ->
outer proof verified AND decided on the native backend, with the folded
inner accumulator decoded from the outer instances (accumulator_indices).

Reference parity: snark-verifier-sdk/examples/standard_plonk.rs:158-184 +
snark-verifier/src/system/halo2/test/kzg/halo2.rs:179-243 (the reference
proves its AggregationCircuit at k=22 and verifies the outer snark; the
"unfinished pairing" is deferred into the outer instances and checked by
decide — SURVEY.md §3.3).

Run: python examples/aggregation_e2e.py [--snarks N]  (~10-15 min at k=21)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from snark_verifier_tpu.loader.halo2.builder import CircuitBuilder
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.sdk import gen_proof, gen_snark
from snark_verifier_tpu.sdk.aggregation import aggregate_in_circuit, aggregate_native
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativePoseidonTranscript
from snark_verifier_tpu.verifier.plonk import PlonkVerifier

INNER_K = 8
OUTER_SRS_K = 21


def main(n_snarks: int = 1):
    t_all = time.time()

    # ---- inner snarks (app circuits) ----------------------------------------
    srs_inner = gen_srs(INNER_K)
    _, pk_inner = build_standard_plonk(INNER_K, srs_inner)
    snarks = [
        gen_snark(pk_inner, [[1000 + i]], "gwc", cache_name=None,
                  transcript_kind="poseidon")
        for i in range(n_snarks)
    ]
    print(f"[1] {n_snarks} inner snark(s) proven (k={INNER_K}, GWC, Poseidon FS)")

    # ---- native pre-pass -----------------------------------------------------
    svk = srs_inner.g[0]
    native = aggregate_native(KzgGwc, svk, snarks)
    print(f"[2] native pre-pass: folded accumulator limbs = "
          f"{[hex(v)[:10] for v in native.instances[:2]]}...")

    # ---- in-circuit pass (recording builder) ---------------------------------
    t0 = time.time()
    builder = CircuitBuilder(range_bits=17)
    builder, exposed = aggregate_in_circuit(
        KzgGwc, svk, snarks, as_proof=native.as_proof, builder=builder
    )
    assert exposed == native.instances, "in-circuit limbs != native pre-pass"
    print(f"[3] in-circuit verifier synthesized: {len(builder.rows)} rows, "
          f"k={builder.k()} ({time.time()-t0:.1f}s)")

    # ---- compile the aggregation circuit -------------------------------------
    t0 = time.time()
    srs_outer = gen_srs(max(OUTER_SRS_K, builder.k()))
    protocol_outer, pk_outer = builder.build(
        srs_outer,
        name=f"aggregation-{n_snarks}snark",
        accumulator_indices=[[(0, i) for i in range(16)]],
    )
    print(f"[4] outer circuit compiled: k={protocol_outer.domain.k}, "
          f"{len(protocol_outer.preprocessed)} preprocessed commitments "
          f"({time.time()-t0:.1f}s)")

    # ---- prove the outer snark ------------------------------------------------
    t0 = time.time()
    outer_proof = gen_proof(
        pk_outer, [exposed], "gwc",
        cache_name=f"agg_e2e_{n_snarks}x{INNER_K}_k{protocol_outer.domain.k}",
        transcript_kind="poseidon",
    )
    prove_s = time.time() - t0
    print(f"[5] OUTER PROOF generated: {len(outer_proof)} bytes ({prove_s:.1f}s)")

    # the same circuit proven with the Keccak transcript — the proof an EVM
    # contract verifies on-chain (examples/evm_verifier_with_accumulator.py)
    t0 = time.time()
    outer_proof_evm = gen_proof(
        pk_outer, [exposed], "gwc",
        cache_name=f"agg_e2e_{n_snarks}x{INNER_K}_k{protocol_outer.domain.k}_evm",
        transcript_kind="evm",
    )
    print(f"[5b] EVM-transcript outer proof: {len(outer_proof_evm)} bytes "
          f"({time.time()-t0:.1f}s)")

    # ---- verify + decide the outer snark --------------------------------------
    t0 = time.time()
    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs_outer.decider_key()
    loaded = protocol_outer.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in [exposed]]
    transcript = NativePoseidonTranscript(outer_proof, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    assert len(proof.old_accumulators) == 1, "outer instances carry the accumulator"
    ok = verifier.verify(dk, loaded, ins, proof)
    assert ok is True, "outer snark rejected"
    print(f"[6] outer snark VERIFIED + DECIDED natively "
          f"(fresh + decoded old accumulator, 2 pairing checks, "
          f"{time.time()-t0:.1f}s)")

    # ---- negative probe --------------------------------------------------------
    bad = bytearray(outer_proof)
    bad[7] ^= 1
    try:
        t = NativePoseidonTranscript(bytes(bad), loader)
        p2 = verifier.read_proof(dk, loaded, ins, t)
        ok2 = verifier.verify(dk, loaded, ins, p2)
    except Exception:
        ok2 = False
    assert ok2 is not True, "mutated outer proof must not verify"
    print("[7] 1-byte-mutated outer proof rejected")

    # ---- persist the closed-loop fixture (tests/test_aggregation_e2e.py
    # verifies the outer snark in the default suite without re-proving) ------
    import json

    from snark_verifier_tpu.verifier.plonk.serialization import protocol_to_json

    fixture = {
        "n_snarks": n_snarks,
        "inner_k": INNER_K,
        "outer_k": protocol_outer.domain.k,
        "protocol": protocol_to_json(protocol_outer),
        "instances": [hex(v) for v in exposed],
        "proof": outer_proof.hex(),
        "proof_evm": outer_proof_evm.hex(),
        "dk": {
            "svk": [hex(c) for c in dk.svk],
            "g2": [[hex(c) for c in pair] for pair in dk.g2],
            "s_g2": [[hex(c) for c in pair] for pair in dk.s_g2],
        },
        "prove_s": round(prove_s, 1),
        "rows": len(builder.rows),
    }
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        f"aggregation_outer_{n_snarks}snark.json",
    )
    with open(out_path, "w") as f:
        json.dump(fixture, f)
    print(f"[8] fixture written: {os.path.normpath(out_path)}")
    print(f"DONE in {time.time()-t_all:.1f}s (outer prove: {prove_s:.1f}s)")
    return prove_s


def two_level():
    """Aggregate the aggregator (test/kzg/halo2.rs:372-385 parity): the
    proven outer snark (from the level-1 fixture) is verified INSIDE a new
    aggregation circuit — its old accumulator decoded from its instances
    in-circuit (ec_point_from_limbs) — and that level-2 circuit is proven
    and decided in turn."""
    import json

    from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey, decide
    from snark_verifier_tpu.sdk.halo2 import Snark
    from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

    t_all = time.time()
    fx_path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "aggregation_outer_1snark.json",
    )
    with open(fx_path) as f:
        obj = json.load(f)
    outer = Snark(
        protocol_from_json(obj["protocol"]),
        [[int(v, 16) for v in obj["instances"]]],
        bytes.fromhex(obj["proof"]),
    )
    dk = KzgDecidingKey(
        svk=tuple(int(c, 16) for c in obj["dk"]["svk"]),
        g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["g2"]),
        s_g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["s_g2"]),
    )
    print(f"[L2-1] level-1 outer snark loaded ({len(outer.proof)} bytes)")

    native = aggregate_native(KzgGwc, dk.svk, [outer])
    assert len(native.snark_accumulators) == 2  # fresh + decoded old
    assert decide(dk, native.accumulator) is True
    print("[L2-2] native pre-pass: fresh + decoded-old folded, decided")

    t0 = time.time()
    builder = CircuitBuilder(range_bits=17)
    builder, exposed = aggregate_in_circuit(
        KzgGwc, dk.svk, [outer], as_proof=native.as_proof, builder=builder
    )
    assert exposed == native.instances
    print(f"[L2-3] level-2 verifier synthesized: {len(builder.rows)} rows, "
          f"k={builder.k()} ({time.time()-t0:.1f}s)")

    srs_outer = gen_srs(max(OUTER_SRS_K, builder.k()))
    t0 = time.time()
    protocol2, pk2 = builder.build(
        srs_outer, name="aggregation-two-level",
        accumulator_indices=[[(0, i) for i in range(16)]],
    )
    print(f"[L2-4] compiled k={protocol2.domain.k} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    proof2 = gen_proof(pk2, [exposed], "gwc",
                       cache_name=f"agg_e2e_two_level_k{protocol2.domain.k}",
                       transcript_kind="poseidon")
    prove_s = time.time() - t0
    print(f"[L2-5] LEVEL-2 PROOF generated: {len(proof2)} bytes ({prove_s:.1f}s)")

    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk2 = srs_outer.decider_key()
    loaded = protocol2.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in [exposed]]
    transcript = NativePoseidonTranscript(proof2, loader)
    p2 = verifier.read_proof(dk2, loaded, ins, transcript)
    assert len(p2.old_accumulators) == 1
    assert verifier.verify(dk2, loaded, ins, p2) is True
    print(f"[L2-6] level-2 snark VERIFIED + DECIDED "
          f"(two recursion levels closed, {time.time()-t_all:.1f}s total)")
    return prove_s


if __name__ == "__main__":
    n = 1
    if "--snarks" in sys.argv:
        n = int(sys.argv[sys.argv.index("--snarks") + 1])
    if "--two-level" in sys.argv:
        two_level()
    else:
        main(n)
