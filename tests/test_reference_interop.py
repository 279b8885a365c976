"""Bit-exact interop against reference-generated fixtures.

The fixtures are produced by `tools/dump_reference_vectors/dump_vectors.rs`
run inside an upstream snark-verifier checkout (see that directory's README
for the one-command recipe) and dropped into `tests/golden/reference/`.
While they are absent — no Rust toolchain or network exists in this build
environment — every test here xfails with a pointer to the dump tool, so
the gap to proven interop stays mechanical, not open-ended.

Coverage once fixtures exist:
* PSE poseidon-crate constant parity: our Grain generation
  (util/poseidon.py) + sparse-form derivation (util/poseidon_opt.py) must
  reproduce the crate's MDS / pre-sparse MDS / sparse matrices / optimized
  round constants bit-for-bit, and our sponge must squeeze byte-equal
  values (reference hasher: snark-verifier/src/util/hash/poseidon.rs).
* PlonkProtocol serde import: protocol_from_json on a real compile() dump
  (system/halo2.rs:95-182).
* Whole-verifier parity: reference-produced StandardPlonk k=9 proofs
  (GWC & SHPLONK x keccak & poseidon transcripts, deterministic ChaCha20
  seeding as in system/halo2/test.rs:191) must verify and yield the
  byte-identical succinct accumulator.
"""

from __future__ import annotations

import json
import os

import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "golden", "reference")

_MISSING = pytest.mark.xfail(
    reason="reference fixtures not present — generate with "
    "tools/dump_reference_vectors (see its README), copy the JSON into "
    "tests/golden/reference/",
    run=False,
)


def _load(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.xfail(f"fixture {name} absent (run tools/dump_reference_vectors)")
    with open(path) as f:
        return json.load(f)


def _fe(hexstr: str) -> int:
    return int(hexstr, 16)


def _needs(name):
    return pytest.mark.skipif(False, reason="")  # decorator placeholder


# ---------------------------------------------------------------------------
# Poseidon constants
# ---------------------------------------------------------------------------


def test_poseidon_mds_parity():
    doc = _load("poseidon_t5.json")
    from snark_verifier_tpu.util.poseidon import default_spec

    spec = default_spec()
    got = [[int(v) for v in row] for row in spec.mds]
    want = [[_fe(v) for v in row] for row in doc["mds"]]
    assert got == want, "Grain-generated MDS differs from the PSE crate"


def test_poseidon_optimized_constants_parity():
    doc = _load("poseidon_t5.json")
    from snark_verifier_tpu.util.poseidon import default_spec
    from snark_verifier_tpu.util.poseidon_opt import optimize_spec

    opt = optimize_spec(default_spec())

    def rows(x):
        return [[_fe(v) for v in row] for row in x]

    assert rows(doc["pre_sparse_mds"]) == [
        [int(v) for v in row] for row in opt.pre_sparse_mds
    ]
    assert len(doc["sparse"]) == len(opt.sparse)
    for ref, (row, col_hat) in zip(doc["sparse"], opt.sparse):
        assert [_fe(v) for v in ref["row"]] == [int(v) for v in row]
        assert [_fe(v) for v in ref["col_hat"]] == [int(v) for v in col_hat]
    assert rows(doc["constants_start"]) == [
        [int(v) for v in row] for row in opt.constants_start
    ]
    assert [_fe(v) for v in doc["constants_partial"]] == [
        int(v) for v in opt.constants_partial
    ]
    assert rows(doc["constants_end"]) == [
        [int(v) for v in row] for row in opt.constants_end
    ]


def test_poseidon_sponge_vectors():
    doc = _load("poseidon_t5.json")
    from snark_verifier_tpu.util.poseidon import PoseidonSponge, default_spec

    for vec in doc["sponge_vectors"]:
        sponge = PoseidonSponge(default_spec())
        sponge.update([_fe(v) for v in vec["inputs"]])
        assert sponge.squeeze() == _fe(vec["squeeze"])
        if "then_inputs" in vec:
            sponge.update([_fe(v) for v in vec["then_inputs"]])
            assert sponge.squeeze() == _fe(vec["then_squeeze"])


# ---------------------------------------------------------------------------
# Protocol serde import
# ---------------------------------------------------------------------------


def test_protocol_import():
    doc = _load("protocol_standard_plonk_k9.json")
    from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

    protocol = protocol_from_json(doc)
    assert protocol.domain.k == 9
    assert protocol.num_instance == [1]
    assert len(protocol.preprocessed) > 0
    # round-trip through our encoder must be lossless
    from snark_verifier_tpu.verifier.plonk.serialization import protocol_to_json

    again = protocol_from_json(protocol_to_json(protocol))
    assert again == protocol


# ---------------------------------------------------------------------------
# Whole-verifier accumulator parity on reference proofs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
@pytest.mark.parametrize("transcript_kind", ["keccak", "poseidon"])
def test_reference_proof_accumulator(scheme, transcript_kind):
    proof_doc = _load(f"proof_k9_{scheme}_{transcript_kind}.json")
    protocol_doc = _load("protocol_standard_plonk_k9.json")
    srs_doc = _load("srs_k9.json")

    from snark_verifier_tpu.loader.native import NativeLoader
    from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
    from snark_verifier_tpu.system.halo2.transcript import (
        NativeEvmTranscript,
        NativePoseidonTranscript,
    )
    from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier
    from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

    protocol = protocol_from_json(protocol_doc)
    svk = (_fe(srs_doc["g0"]["x"]), _fe(srs_doc["g0"]["y"]))
    proof_bytes = bytes.fromhex(proof_doc["proof_hex"])
    instances = [[_fe(v) for v in col] for col in proof_doc["instances"]]

    loader = NativeLoader()
    loaded = protocol.loaded(loader)
    loaded_instances = [[loader.load_const(v) for v in col] for col in instances]
    transcript = (
        NativeEvmTranscript(proof_bytes, loader)
        if transcript_kind == "keccak"
        else NativePoseidonTranscript(proof_bytes, loader)
    )
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkSuccinctVerifier(As)
    proof = verifier.read_proof(svk, loaded, loaded_instances, transcript)
    accumulators = verifier.verify(svk, loaded, loaded_instances, proof)
    assert len(accumulators) == 1

    acc = accumulators[0]
    want = proof_doc["accumulator"]
    assert acc.lhs.value == (_fe(want["lhs"]["x"]), _fe(want["lhs"]["y"]))
    assert acc.rhs.value == (_fe(want["rhs"]["x"]), _fe(want["rhs"]["y"]))

    # and the decider accepts with the dumped g2/s_g2
    def g2(obj):
        return ((_fe(obj["x"][0]), _fe(obj["x"][1])), (_fe(obj["y"][0]), _fe(obj["y"][1])))

    from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey

    dk = KzgDecidingKey(svk=svk, g2=g2(srs_doc["g2"]), s_g2=g2(srs_doc["s_g2"]))
    assert As.decide_all(dk, accumulators) is True
