"""num_proof > 1: one protocol describing t proofs in a single transcript.

Parity with the reference's multi-proof protocol compilation
(system/halo2.rs:72-76,325-345: per-proof instance/advice/z polys
proof-major within phases, shared fixed/sigma queries and challenges, all
proofs' constraints under one DistributePowers(alpha)), exercised by
test/kzg/native.rs:20-38 with StandardPlonk num_proof=2.  Verified on the
native backend and bit-exact on the JAX backend.
"""

import jax
import pytest

from snark_verifier_tpu.loader.native import NativeLoader
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
    protocol, pk = build_standard_plonk(K, srs, num_proof=2)
    return srs, protocol, pk


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_num_proof_2_native_verify_and_decide(setup, scheme):
    srs, protocol, pk = setup
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    instances = [[41], [43]]

    proof_bytes = create_proof(pk, instances, scheme)

    loader = NativeLoader()
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    assert verifier.verify(dk, loaded, ins, proof) is True

    # a proof over swapped instances must fail (the transcript binds both)
    swapped = [[43], [41]]
    ins2 = [[loader.load_const(v) for v in col] for col in swapped]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof2 = verifier.read_proof(dk, loaded, ins2, transcript)
    with pytest.raises(Exception):
        assert verifier.verify(dk, loaded, ins2, proof2) is not True


def test_num_proof_2_layout_shapes(setup):
    srs, protocol, pk = setup
    # reference num_witness/num_instance shapes (system/halo2.rs:280-292)
    assert protocol.num_instance == [1, 1]
    assert protocol.num_witness == [6, 0, 2]
    assert protocol.num_challenge == [1, 2, 1]
    # per-proof z polys with per-proof permutation column sets, shared sigmas
    assert len(pk.z_polys) == 2
    perms = [pk.perm_for_z(z) for z in pk.z_polys]
    assert perms[0].columns != perms[1].columns
    assert perms[0].sigma_polys == perms[1].sigma_polys


def test_num_proof_2_jax_bitexact(setup):
    srs, protocol, pk = setup
    from snark_verifier_tpu.parallel.batch import (
        build_verifier,
        decode_accumulator,
        pack_instances,
        pack_proofs,
    )

    svk = srs.g[0]
    instances = [[77], [78]]
    proof_bytes = create_proof(pk, instances, "gwc")

    loader = NativeLoader()
    verifier = PlonkSuccinctVerifier(KzgGwc)
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(svk, loaded, ins, transcript)
    accs = verifier.verify(svk, loaded, ins, proof)

    fn = jax.jit(build_verifier(protocol, KzgGwc, svk))
    out = fn(pack_proofs([proof_bytes]), pack_instances([instances]))
    lhs_j, rhs_j = decode_accumulator(out, 0)
    assert (lhs_j, rhs_j) == (accs[0].lhs.value, accs[0].rhs.value)
