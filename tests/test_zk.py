"""zk (blinded) protocol: prove + verify across backends.

Parity: Config::set_zk(true) compiles (system/halo2.rs:520-546, 596-660) —
l_last/l_blind/l_active-masked permutation, blinded advice/z tails, and a
random witness polynomial queried last.  The verifier machinery is
expression-generic, so zk shapes exercise negative-index Lagranges and the
extra witness query end-to-end.
"""

import random

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
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier, PlonkVerifier

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs, zk=True)
    return srs, protocol, pk


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_zk_prove_verify_and_randomization(setup, scheme):
    srs, protocol, pk = setup
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    p1 = create_proof(pk, [[555]], scheme, rng=random.Random(1))
    p2 = create_proof(pk, [[555]], scheme, rng=random.Random(2))
    assert p1 != p2  # blinding makes same-statement proofs distinct
    dk = srs.decider_key()
    for pb in (p1, p2):
        nat = NativeLoader()
        verifier = PlonkVerifier(As)
        loaded = protocol.loaded(nat)
        ins = [[nat.load_const(555)]]
        proof = verifier.read_proof(dk, loaded, ins, NativeEvmTranscript(pb, nat))
        assert verifier.verify(dk, loaded, ins, proof) is True


def test_zk_jax_matches_native(setup):
    srs, protocol, pk = setup
    svk = srs.g[0]
    instances_list = [[[7]], [[919]]]
    proofs = [
        create_proof(pk, ins, "gwc", rng=random.Random(i))
        for i, ins in enumerate(instances_list)
    ]
    fn = jax.jit(build_verifier(protocol, KzgGwc, svk))
    out = fn(pack_proofs(proofs), pack_instances(instances_list))
    verifier = PlonkSuccinctVerifier(KzgGwc)
    for i, ins in enumerate(instances_list):
        nat = NativeLoader()
        loaded = protocol.loaded(nat)
        lins = [[nat.load_const(v) for v in col] for col in ins]
        proof = verifier.read_proof(
            svk, loaded, lins, NativeEvmTranscript(proofs[i], nat)
        )
        accs = verifier.verify(svk, loaded, lins, proof)
        assert bool(out["ok"][i])
        lhs_j, rhs_j = decode_accumulator(out, i)
        assert lhs_j == accs[0].lhs.value
        assert rhs_j == accs[0].rhs.value


def test_zk_rejects_unsatisfied_witness(setup):
    srs, protocol, pk = setup
    import dataclasses

    good_synth = pk.synthesize

    def bad_synth(instances):
        vals = good_synth(instances)
        first = next(iter(vals))
        col = list(vals[first])
        col[0] = (col[0] + 1) % (2**64)
        vals[first] = col
        return vals

    bad_pk = dataclasses.replace(pk, synthesize=bad_synth)
    proof_bytes = create_proof(
        bad_pk, [[1]], "gwc", allow_unsatisfied=True, rng=random.Random(0)
    )
    nat = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(nat)
    ins = [[nat.load_const(1)]]
    proof = verifier.read_proof(dk, loaded, ins, NativeEvmTranscript(proof_bytes, nat))
    with pytest.raises(AssertionFailure):
        verifier.verify(dk, loaded, ins, proof)


def test_zk_lookup_prove_verify_and_reject():
    """zk + lookup combined (halo2.rs:700-727 zk branch): blinded permuted
    columns/grand products verify under both multiopens; an out-of-range
    witness is rejected."""
    import dataclasses

    from snark_verifier_tpu.system.halo2.circuits import build_lookup_plonk

    srs = gen_srs(5)
    protocol, pk = build_lookup_plonk(5, srs, zk=True)
    dk = srs.decider_key()
    for scheme, As in [("gwc", KzgGwc), ("shplonk", KzgShplonk)]:
        p1 = create_proof(pk, [[4242]], scheme, rng=random.Random(1))
        p2 = create_proof(pk, [[4242]], scheme, rng=random.Random(2))
        assert p1 != p2
        nat = NativeLoader()
        verifier = PlonkVerifier(As)
        loaded = protocol.loaded(nat)
        ins = [[nat.load_const(4242)]]
        proof = verifier.read_proof(dk, loaded, ins, NativeEvmTranscript(p1, nat))
        assert verifier.verify(dk, loaded, ins, proof) is True

    good = pk.synthesize
    bad_pk = dataclasses.replace(
        pk, synthesize=lambda ins: good(ins, range_values=(3, 7, 0, 16))
    )
    pb = create_proof(bad_pk, [[1]], "gwc", allow_unsatisfied=True, rng=random.Random(0))
    nat = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    loaded = protocol.loaded(nat)
    ins = [[nat.load_const(1)]]
    proof = verifier.read_proof(dk, loaded, ins, NativeEvmTranscript(pb, nat))
    with pytest.raises(AssertionFailure):
        verifier.verify(dk, loaded, ins, proof)
