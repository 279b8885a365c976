"""Recursion instance path: old accumulators decoded from instance limbs.

Mirrors the reference's mock-accumulator coverage
(system/halo2/test/kzg.rs:30-46 + kzg/native.rs:40-68): a protocol with
accumulator_indices decodes (lhs, rhs) from 16 x 68-bit instance limbs
(pcs/kzg/accumulator.rs:36-83), the verifier returns BOTH accumulators, and
decide_all passes on the valid pair / fails on a corrupted one.  The JAX
backend decodes the limbs in-graph and must agree bit-exactly with native.
"""

import jax
import numpy as np
import pytest

from snark_verifier_tpu.errors import Error
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.ops.limbs import limbs_to_int
from snark_verifier_tpu.parallel.batch import (
    build_verifier,
    pack_instances,
    pack_proofs,
)
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.circuits import build_mock_accumulator_plonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier, PlonkVerifier

K = 5


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk, limbs = build_mock_accumulator_plonk(K, srs)
    return srs, protocol, pk, limbs


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_native_decides_old_and_fresh(setup, scheme):
    srs, protocol, pk, limbs = setup
    proof_bytes = create_proof(pk, [limbs], scheme)

    loader = NativeLoader()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in limbs]]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    assert len(proof.old_accumulators) == 1
    # the decoded old accumulator is exactly (tau*G, G)
    old = proof.old_accumulators[0]
    assert old.lhs.value == srs.g[1]
    assert old.rhs.value == srs.g[0]
    assert verifier.verify(dk, loaded, ins, proof) is True


def test_native_rejects_corrupt_old_accumulator(setup):
    srs, protocol, pk, limbs = setup
    bad = list(limbs)
    bad[0] = (bad[0] + 1) % (1 << 68)  # still on no curve point / wrong pair
    proof_bytes = create_proof(pk, [bad], "gwc")

    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in bad]]
    with pytest.raises(Error):
        transcript = NativeEvmTranscript(proof_bytes, loader)
        proof = verifier.read_proof(dk, loaded, ins, transcript)
        verifier.verify(dk, loaded, ins, proof)


def test_jax_decodes_limbs_in_graph(setup):
    srs, protocol, pk, limbs = setup
    svk = srs.g[0]
    proof_bytes = create_proof(pk, [limbs], "gwc")

    fn = jax.jit(build_verifier(protocol, KzgGwc, svk))
    out = fn(pack_proofs([proof_bytes] * 2), pack_instances([[limbs]] * 2))
    assert bool(np.asarray(out["ok"]).all())

    # two accumulators: coord arrays are (2, B, 16); acc 1 is the old one
    assert out["lhs_x"].shape[0] == 2

    def coord(key, acc, b=0):
        return limbs_to_int(np.asarray(out[key])[acc, b])

    assert (coord("lhs_x", 1), coord("lhs_y", 1)) == srs.g[1]
    assert (coord("rhs_x", 1), coord("rhs_y", 1)) == srs.g[0]

    # fresh accumulator agrees bit-exactly with the native interpreter
    loader = NativeLoader()
    verifier = PlonkSuccinctVerifier(KzgGwc)
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in limbs]]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(svk, loaded, ins, transcript)
    accs = verifier.verify(svk, loaded, ins, proof)
    assert (coord("lhs_x", 0), coord("lhs_y", 0)) == accs[0].lhs.value
    assert (coord("rhs_x", 0), coord("rhs_y", 0)) == accs[0].rhs.value


def test_jax_flags_off_curve_limbs(setup):
    """Corrupt limb -> decoded point off curve -> ok mask False (no raise)."""
    srs, protocol, pk, limbs = setup
    svk = srs.g[0]
    bad = list(limbs)
    bad[5] = (bad[5] ^ 1) % (1 << 68)
    proof_bytes = create_proof(pk, [bad], "gwc")

    fn = jax.jit(build_verifier(protocol, KzgGwc, svk))
    out = fn(pack_proofs([proof_bytes]), pack_instances([[bad]]))
    assert not bool(np.asarray(out["ok"])[0])
