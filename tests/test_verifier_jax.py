"""JAX (device) verifier vs native verifier: bit-exact accumulators.

The strongest cross-implementation vector: the same proof bytes must produce
identical KZG accumulators through the python-int interpreter and through
the jitted limb-kernel interpreter (SURVEY §4's multi-backend agreement
pattern, generalized to the TPU backend).
"""

import jax
import pytest

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
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)
    return srs, protocol, pk


def native_accumulator(protocol, As, svk, proof_bytes, instances):
    loader = NativeLoader()
    verifier = PlonkSuccinctVerifier(As)
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativeEvmTranscript(proof_bytes, loader)
    proof = verifier.read_proof(svk, loaded, ins, transcript)
    accs = verifier.verify(svk, loaded, ins, proof)
    return accs[0].lhs.value, accs[0].rhs.value


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_jax_matches_native_bitexact(setup, scheme):
    srs, protocol, pk = setup
    As = KzgGwc if scheme == "gwc" else KzgShplonk
    svk = srs.g[0]

    instances_list = [[[12345]], [[999]]]
    proofs = [create_proof(pk, ins, scheme) for ins in instances_list]

    fn = jax.jit(build_verifier(protocol, As, svk))
    out = fn(pack_proofs(proofs), pack_instances(instances_list))

    for i, ins in enumerate(instances_list):
        lhs_n, rhs_n = native_accumulator(protocol, As, svk, proofs[i], ins)
        lhs_j, rhs_j = decode_accumulator(out, i)
        assert bool(out["ok"][i])
        assert lhs_j == lhs_n
        assert rhs_j == rhs_n


def test_jax_flags_bad_proof(setup):
    srs, protocol, pk = setup
    svk = srs.g[0]
    good = create_proof(pk, [[5]], "gwc")
    bad = bytearray(good)
    bad[100] ^= 0x40  # corrupt a commitment byte

    fn = jax.jit(build_verifier(protocol, KzgGwc, svk))
    out = fn(pack_proofs([good, bytes(bad)]), pack_instances([[[5]], [[5]]]))
    # good proof's accumulator intact; bad one's point off-curve -> ok=False
    assert bool(out["ok"][0])
    assert not bool(out["ok"][1])
