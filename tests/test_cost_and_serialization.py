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
