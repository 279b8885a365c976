"""Cost model and protocol JSON round-trip."""

import json

from snark_verifier_tpu.cost import estimate_gas, succinct_verifier_cost, verifier_cost
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.verifier.plonk.serialization import (
    protocol_from_json,
    protocol_to_json,
)


def _protocol():
    srs = gen_srs(4)
    protocol, _ = build_standard_plonk(4, srs)
    return protocol


def test_cost_model():
    protocol = _protocol()
    c_gwc = verifier_cost(KzgGwc, protocol)
    # standard-plonk: 4 witness commitments + 3 quotient chunks, 13 evals,
    # GWC adds one commitment per shift set (2 sets: 1, omega)
    assert c_gwc.num_instance == 1
    assert c_gwc.num_commitment == 4 + 3 + 2
    assert c_gwc.num_evaluation == 13
    assert c_gwc.num_pairing == 2
    c_sh = succinct_verifier_cost(KzgShplonk, protocol)
    assert c_sh.num_commitment == 4 + 3 + 2  # SHPLONK: +2 commitments
    assert c_sh.num_pairing == 0
    assert estimate_gas(c_gwc) > 21000


def test_gas_estimate_tracks_measured_gas():
    """The analytic gas formula (loader/evm/util.rs:94-102) must model OUR
    codegen too: the Yul executor's measured gas stays within 25% of the
    estimate (measured ratio ~1.08 for GWC, ~1.06 for SHPLONK at k=4)."""
    from snark_verifier_tpu.sdk import gen_proof
    from snark_verifier_tpu.sdk.evm import evm_verify, gen_evm_verifier

    srs = gen_srs(4)
    protocol, pk = build_standard_plonk(4, srs)
    for As, scheme in [(KzgGwc, "gwc"), (KzgShplonk, "shplonk")]:
        verifier = gen_evm_verifier(protocol, As, srs.decider_key())
        proof = gen_proof(pk, [[4242]], scheme)
        gas = evm_verify(verifier, [[4242]], proof)
        est = estimate_gas(verifier_cost(As, protocol))
        assert 0.75 < gas / est < 1.25, (scheme, gas, est)


def test_protocol_json_roundtrip():
    protocol = _protocol()
    obj = protocol_to_json(protocol)
    # must be plain-JSON serializable
    text = json.dumps(obj)
    back = protocol_from_json(json.loads(text))
    assert back.domain == protocol.domain
    assert back.preprocessed == protocol.preprocessed
    assert back.num_instance == protocol.num_instance
    assert back.num_witness == protocol.num_witness
    assert back.num_challenge == protocol.num_challenge
    assert back.evaluations == protocol.evaluations
    assert back.queries == protocol.queries
    assert back.quotient.num_chunk == protocol.quotient.num_chunk
    assert back.quotient.numerator == protocol.quotient.numerator
    assert back.transcript_initial_state == protocol.transcript_initial_state
    assert back.accumulator_indices == protocol.accumulator_indices


def test_imported_protocol_verifies():
    """A JSON-round-tripped protocol drives the verifier identically."""
    from snark_verifier_tpu.loader.native import NativeLoader
    from snark_verifier_tpu.sdk import gen_proof
    from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
    from snark_verifier_tpu.verifier.plonk import PlonkVerifier

    srs = gen_srs(4)
    protocol, pk = build_standard_plonk(4, srs)
    proof = gen_proof(pk, [[77]], "gwc")
    imported = protocol_from_json(protocol_to_json(protocol))

    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = imported.loaded(loader)
    ins = [[loader.load_const(77)]]
    transcript = NativeEvmTranscript(proof, loader)
    p = verifier.read_proof(dk, loaded, ins, transcript)
    assert verifier.verify(dk, loaded, ins, p) is True


def test_golden_reference_serde_layout():
    """Parse the hand-derived golden fixture written in EXACTLY the layout
    serde emits for the reference's PlonkProtocol (protocol.rs:19-71 with
    derive_serde: externally-tagged enums, newtype Rotation as bare int,
    32-byte LE field arrays, {"x","y"} points) — pinning the import side of
    the compatibility hinge to the reference's wire format."""
    import json
    import os

    from snark_verifier_tpu.util import bn254
    from snark_verifier_tpu.verifier.plonk.protocol import (
        CommonIdentity,
        CommonLagrange,
        DistributePowers,
        Negated,
        Product,
        Scaled,
        Sum,
    )
    from snark_verifier_tpu.verifier.plonk.serialization import (
        protocol_from_json,
        protocol_to_json,
    )

    path = os.path.join(os.path.dirname(__file__), "golden", "protocol_k2.json")
    with open(path) as f:
        doc = json.load(f)
    p = protocol_from_json(doc)

    assert (p.domain.k, p.domain.n) == (2, 4)
    assert p.domain.gen == pow(bn254.FR_ROOT_OF_UNITY, 1 << 26, bn254.R)
    assert p.domain.n_inv == pow(4, -1, bn254.R)
    assert p.preprocessed[0] == bn254.g1_mul(bn254.G1_GEN, 5)
    assert [q.rotation.value for q in p.evaluations] == [0, -1]
    num = p.quotient.numerator
    assert isinstance(num, DistributePowers) and num.base.index == 2
    gate = num.exprs[0]
    assert isinstance(gate, Sum) and isinstance(gate.lhs, Product)
    assert isinstance(gate.rhs, Negated) and isinstance(gate.rhs.inner, Scaled)
    assert isinstance(gate.rhs.inner.inner, CommonLagrange)
    assert isinstance(num.exprs[1].lhs, CommonIdentity)
    assert num.exprs[1].rhs.value == 42
    assert p.transcript_initial_state == 123456789
    assert p.instance_committing_key.bases == [bn254.G1_GEN]
    assert p.instance_committing_key.constant is None
    assert p.accumulator_indices == [[(0, i) for i in range(16)]]

    # round trip: our serializer reproduces the reference layout byte-for-byte
    assert protocol_to_json(p) == doc


def test_pk_serialization_roundtrip():
    """system/halo2/keys.py: pk -> JSON -> pk produces byte-identical proofs
    across plain / zk / lookup proving keys (SDK key-management parity,
    snark-verifier-sdk/src/lib.rs:127-224)."""
    import json
    import random

    from snark_verifier_tpu.system.halo2.circuits import (
        build_lookup_plonk,
        build_standard_plonk,
    )
    from snark_verifier_tpu.system.halo2.keys import pk_from_json, pk_to_json
    from snark_verifier_tpu.system.halo2.prover import create_proof
    from snark_verifier_tpu.system.halo2.srs import gen_srs

    srs = gen_srs(4)
    cases = [
        (build_standard_plonk, {}),
        (build_standard_plonk, {"zk": True}),
        (build_lookup_plonk, {}),
    ]
    for build, kwargs in cases:
        protocol, pk = build(4, srs, **kwargs)
        obj = json.loads(json.dumps(pk_to_json(pk)))
        pk2 = pk_from_json(obj, srs, pk.synthesize)
        rng1 = random.Random(7) if kwargs.get("zk") else None
        rng2 = random.Random(7) if kwargs.get("zk") else None
        assert create_proof(pk, [[99]], "gwc", rng=rng1) == create_proof(
            pk2, [[99]], "gwc", rng=rng2
        )


def test_metrics_registry():
    """util/metrics: counters/timers emitted as JSON lines (aux metrics,
    SURVEY §5)."""
    import io
    import json

    from snark_verifier_tpu.util import metrics

    metrics.reset()
    metrics.count("unit.test", 2)
    with metrics.timer("unit.timer"):
        pass
    buf = io.StringIO()
    metrics.dump(buf)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert {"metric": "unit.test", "count": 2} in lines
    assert any(l["metric"] == "unit.timer" and l["n"] == 1 for l in lines)
    metrics.reset()


def test_golden_lookup_zk_serde_layout():
    """The serde-layout fixture extended past the plain-gate case (VERDICT
    r2): a zk lookup protocol — multiple witness phases, theta/beta/gamma
    challenges, permuted-column and grand-product queries with negative
    rotations, l_last/l_blind lagranges — round-trips through the serde
    wire layout byte-for-byte and re-verifies a fresh proof."""
    import json
    import os

    from snark_verifier_tpu.loader.native import NativeLoader
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.system.halo2.circuits import build_lookup_plonk
    from snark_verifier_tpu.system.halo2.prover import create_proof
    from snark_verifier_tpu.system.halo2.srs import gen_srs
    from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
    from snark_verifier_tpu.verifier.plonk import PlonkVerifier
    from snark_verifier_tpu.verifier.plonk.serialization import (
        protocol_from_json,
        protocol_to_json,
    )

    path = os.path.join(
        os.path.dirname(__file__), "golden", "protocol_lookup_zk_k4.json"
    )
    with open(path) as f:
        doc = json.load(f)
    p = protocol_from_json(doc)

    # multi-phase layout: 3 witness phases, 4 challenges over 3 phases
    assert p.num_witness == [3, 2, 3]
    assert p.num_challenge == [1, 2, 1]
    # lookup queries include the permuted-input prev-rotation
    assert any(q.rotation.value == -1 for q in p.queries)
    # zk: l_last/l_blind negative lagranges in the quotient
    lag = p.quotient.numerator.used_lagrange()
    assert min(lag) < 0 and 0 in lag
    assert protocol_to_json(p) == doc

    # the imported protocol must accept a freshly generated proof
    import random

    srs = gen_srs(4)
    _, pk = build_lookup_plonk(4, srs, zk=True)
    proof = create_proof(pk, [[77]], "gwc", rng=random.Random(3))
    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = p.loaded(loader)
    ins = [[loader.load_const(77)]]
    transcript = NativeEvmTranscript(proof, loader)
    pr = verifier.read_proof(dk, loaded, ins, transcript)
    assert verifier.verify(dk, loaded, ins, pr) is True
