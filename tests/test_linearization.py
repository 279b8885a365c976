"""GWC19 linearization strategies (proof.rs:260-303).

Neither the reference nor halo2 v0.3 ships a protocol that USES these
strategies (halo2 commits the full quotient, linearization=None), so — like
the reference — they cannot be validated against real linearized artifacts.
Coverage here:

* WithoutConstant: end-to-end — a standard-plonk protocol flipped to the
  strategy (linearization query appended, prover opens the reconstructed —
  empty, hence zero — linearization polynomial) proves and verifies on the
  native backend, and rejects a wrong instance.
* MinusVanishingTimesQuotient: assembly parity — the verifier builds
  exactly the commitment/eval pair proof.rs:285-295 dictates:
  commitments[Q] = (numerator - (z^n - 1) * quotient).bases and
  evaluations[Q] = its constant.
"""

import dataclasses

import pytest

from snark_verifier_tpu.errors import Error
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier, PlonkVerifier
from snark_verifier_tpu.verifier.plonk.protocol import Query

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)
    return srs, protocol, pk


def _quotient_poly_index(protocol):
    return (
        len(protocol.preprocessed)
        + len(protocol.num_instance)
        + sum(protocol.num_witness)
    )


def _without_constant(protocol):
    q = _quotient_poly_index(protocol)
    return dataclasses.replace(
        protocol,
        linearization="without-constant",
        queries=list(protocol.queries) + [Query.new(q + 1)],
        evaluations=list(protocol.evaluations) + [Query.new(q + 1)],
    )


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_without_constant_end_to_end(setup, scheme):
    srs, protocol, pk = setup
    lin_protocol = _without_constant(protocol)
    lin_pk = dataclasses.replace(pk, protocol=lin_protocol)
    proof_bytes = create_proof(lin_pk, [[777]], scheme)

    loader = NativeLoader()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()
    loaded = lin_protocol.loaded(loader)
    ins = [[loader.load_const(777)]]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    assert verifier.verify(dk, loaded, ins, proof) is True


def test_without_constant_rejects_wrong_instance(setup):
    srs, protocol, pk = setup
    lin_protocol = _without_constant(protocol)
    lin_pk = dataclasses.replace(pk, protocol=lin_protocol)
    proof_bytes = create_proof(lin_pk, [[777]], "gwc")

    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = lin_protocol.loaded(loader)
    ins = [[loader.load_const(778)]]
    with pytest.raises(Error):
        transcript = NativeEvmTranscript(proof_bytes, loader)
        proof = verifier.read_proof(dk, loaded, ins, transcript)
        verifier.verify(dk, loaded, ins, proof)


def test_minus_vanishing_assembly(setup):
    """The strategy's commitment/eval assembly matches proof.rs:285-295."""
    srs, protocol, pk = setup
    proof_bytes = create_proof(pk, [[777]], "gwc")
    mv_protocol = dataclasses.replace(protocol, linearization="minus-vanishing")
    q_idx = _quotient_poly_index(protocol)

    def assemble(proto):
        loader = NativeLoader()
        verifier = PlonkSuccinctVerifier(KzgGwc)
        loaded = proto.loaded(loader)
        ins = [[loader.load_const(777)]]
        transcript = NativeEvmTranscript(proof_bytes, loader)
        proof = verifier.read_proof(srs.g[0], loaded, ins, transcript)
        from snark_verifier_tpu.verifier.plonk.proof import (
            CommonPolynomialEvaluation,
        )

        cpe = CommonPolynomialEvaluation(proto.domain, proto.langranges(), proof.z)
        evals = proof.evaluations_map(proto, ins, cpe)
        commitments = proof.commitments(proto, cpe, evals)
        return proof, cpe, evals, commitments

    proof_n, cpe_n, evals_n, comm_n = assemble(protocol)
    proof_m, cpe_m, evals_m, comm_m = assemble(mv_protocol)

    qq = Query.new(q_idx)
    # eval relation: None path divides by (z^n - 1); MV keeps the constant
    zn_minus_one = cpe_n.zn_minus_one.value
    assert (
        evals_m[qq].value
        == evals_n[qq].value * zn_minus_one % bn254.R
    )
    # commitment relation: MV's entry is numerator.bases - (z^n-1) * quotient;
    # with every poly evaluated, the bases part is exactly -(z^n-1)*[h]
    pt_none = comm_n[q_idx].evaluate(None).value  # [h_comb]
    pt_mv = comm_m[q_idx].evaluate(None).value
    expect = bn254.g1_mul(pt_none, (-zn_minus_one) % bn254.R)
    assert pt_mv == expect
