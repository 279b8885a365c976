"""End-to-end: host prover -> native-loader verifier (GWC + SHPLONK).

This is the python-int analogue of the reference's
`halo2_create_snark! + halo2_native_verify!` flow
(system/halo2/test.rs:145-219).
"""

import pytest

from snark_verifier_tpu.errors import AssertionFailure, TranscriptError, Error
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.verifier.plonk import PlonkVerifier

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)
    return srs, protocol, pk


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_prove_and_verify(setup, scheme):
    srs, protocol, pk = setup
    instances = [[12345]]
    proof_bytes = create_proof(pk, instances, scheme)

    loader = NativeLoader()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()

    loaded = protocol.loaded(loader)
    loaded_instances = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, loaded_instances, transcript)
    assert verifier.verify(dk, loaded, loaded_instances, proof) is True


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_reject_wrong_instance(setup, scheme):
    srs, protocol, pk = setup
    proof_bytes = create_proof(pk, [[777]], scheme)

    loader = NativeLoader()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    bad_instances = [[loader.load_const(778)]]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, bad_instances, transcript)
    with pytest.raises(AssertionFailure):
        verifier.verify(dk, loaded, bad_instances, proof)


def test_reject_mutated_proof(setup):
    """The reference's 1-byte-mutation negative test (test/kzg/evm.rs:58-62)."""
    srs, protocol, pk = setup
    proof_bytes = bytearray(create_proof(pk, [[1]], "gwc"))
    proof_bytes[37] ^= 1

    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    instances = [[loader.load_const(1)]]
    with pytest.raises(Error):
        transcript = NativeEvmTranscript(bytes(proof_bytes), loader)
        proof = verifier.read_proof(dk, loaded, instances, transcript)
        verifier.verify(dk, loaded, instances, proof)


def test_circuit_ext_interface():
    """sdk/circuit.py CircuitExt (lib.rs:108-125 parity): standard, lookup,
    and loader-built circuits prove + verify through gen_snark_for."""
    from snark_verifier_tpu.loader.halo2 import Halo2Loader
    from snark_verifier_tpu.loader.native import NativeLoader
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.sdk.circuit import (
        BuilderCircuit,
        LookupPlonkCircuit,
        StandardPlonkCircuit,
        gen_snark_for,
    )
    from snark_verifier_tpu.system.halo2.srs import gen_srs
    from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
    from snark_verifier_tpu.verifier.plonk import PlonkVerifier

    srs = gen_srs(5)

    def check(snark):
        nat = NativeLoader()
        verifier = PlonkVerifier(KzgGwc)
        dk = srs.decider_key()
        loaded = snark.protocol.loaded(nat)
        ins = [[nat.load_const(v) for v in col] for col in snark.instances]
        proof = verifier.read_proof(
            dk, loaded, ins, NativeEvmTranscript(snark.proof, nat)
        )
        assert verifier.verify(dk, loaded, ins, proof) is True

    check(gen_snark_for(StandardPlonkCircuit(777), 4, srs, cache_name=None))
    check(gen_snark_for(LookupPlonkCircuit(55, (1, 2, 3, 4)), 4, srs, cache_name=None))
    loader = Halo2Loader()
    a, b = loader.assign_scalar(6), loader.assign_scalar(7)
    loader.expose_scalar(a * b)
    check(gen_snark_for(BuilderCircuit(loader.builder, "mul-circuit"), 4, srs, cache_name=None))
