"""Rotation-heavy circuit (next/prev queries) through the full pipeline."""

import jax
import numpy as np
import pytest

from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.parallel.batch import build_verifier, pack_proofs
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.circuits import build_fibonacci
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.verifier.plonk import PlonkVerifier

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_fibonacci(K, srs)
    return srs, protocol, pk


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_fibonacci_native(setup, scheme):
    srs, protocol, pk = setup
    proof = create_proof(pk, [], scheme)
    loader = NativeLoader()
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    verifier = PlonkVerifier(As)
    dk = srs.decider_key()
    loaded = protocol.loaded(loader)
    transcript = NativeEvmTranscript(proof, loader)
    p = verifier.read_proof(dk, loaded, [], transcript)
    assert verifier.verify(dk, loaded, [], p) is True


def test_fibonacci_jax(setup):
    import jax.numpy as jnp

    srs, protocol, pk = setup
    proof = create_proof(pk, [], "gwc")
    fn = jax.jit(build_verifier(protocol, KzgGwc, srs.g[0]))
    out = fn(
        pack_proofs([proof, proof]),
        jnp.zeros((2, 0, 16), jnp.uint32),
    )
    assert bool(np.asarray(out["ok"]).all())
