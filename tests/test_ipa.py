"""IPA PCS: prover round-trip, accumulation fold, and the JAX succinct
verifier + Pippenger decider (reference tests pcs/ipa.rs:434-466 and
pcs/ipa/accumulation.rs:239-291, keccak transcript instead of Blake2b)."""

import random

import jax
import numpy as np
import pytest

from snark_verifier_tpu.errors import AssertionFailure
from snark_verifier_tpu.loader import EcPoint
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.ipa import Ipa, IpaAs, IpaProvingKey
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.util import bn254 as bn
from snark_verifier_tpu.util.msm_symbolic import Msm

K = 4
rng = random.Random(5)


def _make_proof(pk, zk):
    p = [rng.randrange(bn.R) for _ in range(pk.domain.n)]
    omega = rng.randrange(bn.R) if zk else None
    c = pk.commit(p, omega)
    z = rng.randrange(bn.R)
    v = sum(coef * pow(z, i, bn.R) for i, coef in enumerate(p)) % bn.R
    transcript = NativeEvmTranscript()
    Ipa.create_proof(pk, p, z, omega, transcript, rng)
    return c, z, v, transcript.finalize()


@pytest.mark.parametrize("zk", [False, True], ids=["plain", "zk"])
def test_ipa_round_trip(zk):
    pk = IpaProvingKey.rand(K, zk, seed=7)
    c, z, v, proof_bytes = _make_proof(pk, zk)

    loader = NativeLoader()
    svk = pk.svk()
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = Ipa.read_proof(svk, transcript)
    acc = Ipa.succinct_verify(
        svk,
        Msm.base(EcPoint(loader, c)),
        loader.load_const(z),
        loader.load_const(v),
        proof,
    )
    assert IpaAs.decide(pk.dk(), acc) is True

    # wrong evaluation must fail the succinct check
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = Ipa.read_proof(svk, transcript)
    with pytest.raises(AssertionFailure):
        Ipa.succinct_verify(
            svk,
            Msm.base(EcPoint(loader, c)),
            loader.load_const(z),
            loader.load_const(v + 1),
            proof,
        )


def test_ipa_accumulation():
    zk = True
    pk = IpaProvingKey.rand(K, zk, seed=8)
    loader = NativeLoader()
    svk = pk.svk()

    accumulators = []
    for _ in range(3):
        c, z, v, proof_bytes = _make_proof(pk, zk)
        transcript = NativeEvmTranscript(proof_bytes, loader)
        proof = Ipa.read_proof(svk, transcript)
        accumulators.append(
            Ipa.succinct_verify(
                svk,
                Msm.base(EcPoint(loader, c)),
                loader.load_const(z),
                loader.load_const(v),
                proof,
            )
        )

    transcript = NativeEvmTranscript()
    IpaAs.create_proof(pk, accumulators, transcript, rng)
    as_proof_bytes = transcript.finalize()

    transcript = NativeEvmTranscript(as_proof_bytes, loader)
    as_proof = IpaAs.as_read_proof(svk, accumulators, transcript)
    folded = IpaAs.as_verify(svk, accumulators, as_proof)
    assert IpaAs.decide(pk.dk(), folded) is True


def test_ipa_jax_succinct_and_decide():
    from snark_verifier_tpu.loader.jax_loader import JaxLoader
    from snark_verifier_tpu.parallel.batch import pack_proofs
    from snark_verifier_tpu.system.halo2.transcript_jax import JaxEvmTranscript

    zk = False
    pk = IpaProvingKey.rand(K, zk, seed=9)
    svk = pk.svk()
    dk = pk.dk()
    c, z, v, proof_bytes = _make_proof(pk, zk)

    # native reference accumulator
    nl = NativeLoader()
    t = NativeEvmTranscript(proof_bytes, nl)
    nproof = Ipa.read_proof(svk, t)
    nacc = Ipa.succinct_verify(
        svk, Msm.base(EcPoint(nl, c)), nl.load_const(z), nl.load_const(v), nproof
    )

    def run(proof_arr, z_arr, v_arr):
        loader = JaxLoader(proof_arr.shape[:-1])
        transcript = JaxEvmTranscript(proof_arr, loader)
        proof = Ipa.read_proof(svk, transcript)
        from snark_verifier_tpu.loader import Scalar
        from snark_verifier_tpu.ops import field as F

        zs = Scalar(loader, F.to_mont(z_arr, F.FR))
        vs = Scalar(loader, F.to_mont(v_arr, F.FR))
        acc = Ipa.succinct_verify(
            svk, Msm.base(loader.ec_point_load_const(c)), zs, vs, proof
        )
        loader.decide_ipa(acc, dk)
        u = acc.u.value.as_affine()
        return {
            "ok": loader.ok,
            "ux": F.from_mont(u.x, F.FQ),
            "uy": F.from_mont(u.y, F.FQ),
        }

    from snark_verifier_tpu.ops.limbs import ints_to_limbs, limbs_to_int
    import jax.numpy as jnp

    proof_arr = pack_proofs([proof_bytes, proof_bytes])
    z_arr = jnp.asarray(ints_to_limbs([z, z]))
    v_arr = jnp.asarray(ints_to_limbs([v, v]))
    out = jax.jit(run)(proof_arr, z_arr, v_arr)
    assert bool(np.asarray(out["ok"]).all())
    ux = limbs_to_int(np.asarray(out["ux"])[0])
    uy = limbs_to_int(np.asarray(out["uy"])[0])
    assert (ux, uy) == nacc.u.value


def test_ipa_round_trip_pallas():
    """Reference-parity instantiation on pasta/pallas with the Blake2b
    transcript (pcs/ipa.rs + system/halo2/test/ipa/native.rs:54-59)."""
    from snark_verifier_tpu.system.halo2.transcript import NativeBlake2bTranscript
    from snark_verifier_tpu.util.curves import pallas

    r = pallas.R
    pk = IpaProvingKey.rand(K, zk=True, seed=11, curve=pallas)
    p = [rng.randrange(r) for _ in range(pk.domain.n)]
    omega = rng.randrange(r)
    c = pk.commit(p, omega)
    z = rng.randrange(r)
    v = sum(coef * pow(z, i, r) for i, coef in enumerate(p)) % r

    lw = NativeLoader(pallas)
    tw = NativeBlake2bTranscript(loader=lw)
    Ipa.create_proof(pk, p, z, omega, tw, rng)
    proof_bytes = tw.finalize()

    loader = NativeLoader(pallas)
    svk = pk.svk()
    transcript = NativeBlake2bTranscript(proof_bytes, loader)
    proof = Ipa.read_proof(svk, transcript)
    acc = Ipa.succinct_verify(
        svk,
        Msm.base(EcPoint(loader, c)),
        loader.load_const(z),
        loader.load_const(v),
        proof,
    )
    assert IpaAs.decide(pk.dk(), acc) is True

    transcript = NativeBlake2bTranscript(proof_bytes, loader)
    proof = Ipa.read_proof(svk, transcript)
    with pytest.raises(AssertionFailure):
        Ipa.succinct_verify(
            svk,
            Msm.base(EcPoint(loader, c)),
            loader.load_const(z),
            loader.load_const((v + 1) % r),
            proof,
        )


def test_ipa_single_strategy():
    """system/halo2/strategy.py IpaSingleStrategy: verify-and-decide one
    proof, returning the synthetic g commitment (strategy.rs:24-57)."""
    from snark_verifier_tpu.system.halo2.strategy import IpaSingleStrategy

    pk = IpaProvingKey.rand(K, False, seed=9)
    c, z, v, proof_bytes = _make_proof(pk, False)
    loader = NativeLoader()
    svk = pk.svk()
    strategy = IpaSingleStrategy(pk.dk())

    def verify():
        transcript = NativeEvmTranscript(proof_bytes, loader)
        proof = Ipa.read_proof(svk, transcript)
        return Ipa.succinct_verify(
            svk, Msm.base(EcPoint(loader, c)), loader.load_const(z),
            loader.load_const(v), proof,
        )

    g = strategy.process(verify)
    assert bn.g1_is_on_curve(g)

    def verify_wrong():
        transcript = NativeEvmTranscript(proof_bytes, loader)
        proof = Ipa.read_proof(svk, transcript)
        return Ipa.succinct_verify(
            svk, Msm.base(EcPoint(loader, c)), loader.load_const(z),
            loader.load_const((v + 1) % bn.R), proof,
        )

    with pytest.raises(AssertionFailure):
        strategy.process(verify_wrong)
