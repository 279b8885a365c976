"""Lookup argument end-to-end: host prover -> native + JAX verifiers.

Covers the reference's lookup coverage (MainGateWithRange circuits through
halo2_kzg_* macros, system/halo2/test/circuit/maingate.rs:15-113 +
lookup constraint synthesis system/halo2.rs:662-727): a range-square lookup
proves and verifies bit-identically on both backends under both multiopens,
and an out-of-range witness is rejected.
"""

import dataclasses

import jax
import pytest

from snark_verifier_tpu.errors import AssertionFailure
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.parallel.batch import (
    build_verifier,
    decode_accumulator,
    pack_instances,
    pack_proofs,
)
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.circuits import build_lookup_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier, PlonkVerifier

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_lookup_plonk(K, srs)
    return srs, protocol, pk


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_lookup_prove_and_verify_native(setup, scheme):
    srs, protocol, pk = setup
    instances = [[4242]]
    proof_bytes = create_proof(pk, instances, scheme)

    loader = NativeLoader()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    assert verifier.verify(dk, loaded, ins, proof) is True


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_lookup_jax_matches_native(setup, scheme):
    srs, protocol, pk = setup
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    svk = srs.g[0]
    instances_list = [[[7]], [[31337]]]
    proofs = [create_proof(pk, ins, scheme) for ins in instances_list]

    fn = jax.jit(build_verifier(protocol, As, svk))
    out = fn(pack_proofs(proofs), pack_instances(instances_list))

    verifier = PlonkSuccinctVerifier(As)
    for i, ins in enumerate(instances_list):
        loader = NativeLoader()
        loaded = protocol.loaded(loader)
        lins = [[loader.load_const(v) for v in col] for col in ins]
        transcript = NativeEvmTranscript(proofs[i], loader)
        proof = verifier.read_proof(svk, loaded, lins, transcript)
        accs = verifier.verify(svk, loaded, lins, proof)
        assert bool(out["ok"][i])
        lhs_j, rhs_j = decode_accumulator(out, i)
        assert lhs_j == accs[0].lhs.value
        assert rhs_j == accs[0].rhs.value


def test_lookup_rejects_out_of_range_witness(setup):
    """An out-of-range value (16 with a 4-bit table) must not verify."""
    srs, protocol, pk = setup
    good_synth = pk.synthesize
    bad_pk = dataclasses.replace(
        pk, synthesize=lambda ins: good_synth(ins, range_values=(3, 7, 0, 16))
    )
    proof_bytes = create_proof(bad_pk, [[1]], "gwc", allow_unsatisfied=True)

    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(1)]]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    with pytest.raises(AssertionFailure):
        verifier.verify(dk, loaded, ins, proof)


def test_lookup_prover_strict_raises(setup):
    srs, protocol, pk = setup
    good_synth = pk.synthesize
    bad_pk = dataclasses.replace(
        pk, synthesize=lambda ins: good_synth(ins, range_values=(3, 7, 0, 16))
    )
    with pytest.raises(ValueError, match="not in table"):
        create_proof(bad_pk, [[1]], "gwc")
