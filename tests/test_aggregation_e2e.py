"""The closed recursion loop, verified in the default suite.

examples/aggregation_e2e.py proves the real k=21 aggregation circuit (the
in-circuit succinct verifier of an inner snark) with the threaded native
prover and persists the outer snark as a golden fixture; these tests verify
+ DECIDE that outer snark on the native and JAX backends and reject
mutations — the reference's flagship recursion flow
(test/kzg/halo2.rs:179-243, sdk examples/standard_plonk.rs:158-184) with
proving pulled out-of-loop for suite runtime (regenerate with
`python examples/aggregation_e2e.py`; SVTPU_SLOW=1 re-proves in-loop).
"""

import json
import os

import pytest

from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey
from snark_verifier_tpu.system.halo2.transcript import NativePoseidonTranscript
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier, PlonkVerifier
from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

FIXTURE = os.path.join(
    os.path.dirname(__file__), "golden", "aggregation_outer_1snark.json"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="run examples/aggregation_e2e.py to generate the fixture",
)


@pytest.fixture(scope="module")
def fixture():
    with open(FIXTURE) as f:
        obj = json.load(f)
    protocol = protocol_from_json(obj["protocol"])
    instances = [[int(v, 16) for v in obj["instances"]]]
    proof = bytes.fromhex(obj["proof"])
    dk = KzgDecidingKey(
        svk=tuple(int(c, 16) for c in obj["dk"]["svk"]),
        g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["g2"]),
        s_g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["s_g2"]),
    )
    return protocol, instances, proof, dk


def test_outer_snark_verifies_and_decides(fixture):
    protocol, instances, proof_bytes, dk = fixture
    # the at-scale circuit: k=20 since the 5-wire gate + dual range lookups
    # (round 3) shrank the verifier below 2^20 rows (r2 needed k=21)
    assert protocol.domain.k >= 20
    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativePoseidonTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    # the outer instances carry the folded INNER accumulator
    assert len(proof.old_accumulators) == 1
    assert verifier.verify(dk, loaded, ins, proof) is True


def test_outer_snark_mutation_rejected(fixture):
    protocol, instances, proof_bytes, dk = fixture
    loader = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    bad = bytearray(proof_bytes)
    bad[7] ^= 1
    with pytest.raises(Exception):
        transcript = NativePoseidonTranscript(bytes(bad), loader)
        proof = verifier.read_proof(dk, loaded, ins, transcript)
        assert verifier.verify(dk, loaded, ins, proof) is not True
    # corrupt an accumulator limb: decode-and-decide must also fail
    bad_ins = [list(instances[0])]
    bad_ins[0][3] ^= 1
    ins2 = [[loader.load_const(v) for v in col] for col in bad_ins]
    with pytest.raises(Exception):
        transcript = NativePoseidonTranscript(proof_bytes, loader)
        proof = verifier.read_proof(dk, loaded, ins2, transcript)
        assert verifier.verify(dk, loaded, ins2, proof) is not True


def test_outer_snark_jax_succinct_bitexact(fixture):
    """The JAX backend succinct-verifies the at-scale outer snark and its
    accumulators (fresh + decoded old) match the native backend bit-exactly."""
    import jax

    from snark_verifier_tpu.parallel.batch import (
        build_verifier,
        pack_instances,
        pack_proofs,
    )

    protocol, instances, proof_bytes, dk = fixture
    loader = NativeLoader()
    verifier = PlonkSuccinctVerifier(KzgGwc)
    loaded = protocol.loaded(loader)
    ins = [[loader.load_const(v) for v in col] for col in instances]
    transcript = NativePoseidonTranscript(proof_bytes, loader)
    proof = verifier.read_proof(dk.svk, loaded, ins, transcript)
    accs = verifier.verify(dk.svk, loaded, ins, proof)
    assert len(accs) == 2  # fresh + decoded old

    fn = jax.jit(
        build_verifier(protocol, KzgGwc, dk.svk, transcript_kind="poseidon")
    )
    out = fn(pack_proofs([proof_bytes]), pack_instances([instances]))
    # with A=2 accumulators the coordinate outputs are (A, B, 16)
    import numpy as np

    from snark_verifier_tpu.ops.limbs import limbs_to_int

    for i, acc in enumerate(accs):
        lhs_j = tuple(
            limbs_to_int(np.asarray(out[k])[i][0]) for k in ("lhs_x", "lhs_y")
        )
        rhs_j = tuple(
            limbs_to_int(np.asarray(out[k])[i][0]) for k in ("rhs_x", "rhs_y")
        )
        assert (lhs_j, rhs_j) == (acc.lhs.value, acc.rhs.value)


@pytest.mark.skipif(
    not os.environ.get("SVTPU_SLOW"), reason="~10 min full re-prove; SVTPU_SLOW=1"
)
def test_regenerate_and_close_loop():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.aggregation_e2e import main

    prove_s = main(1)
    assert prove_s > 0


def test_outer_snark_evm_verified(fixture):
    """The REAL aggregated snark verified on-chain (test/kzg/evm.rs:125-140
    parity, no mock): contract recomposes the folded inner accumulator from
    the instance limbs, folds with the fresh accumulator, one ecPairing."""
    import json

    with open(FIXTURE) as f:
        obj = json.load(f)
    if "proof_evm" not in obj:
        pytest.skip("fixture lacks the EVM-transcript proof; regenerate")
    proof_evm = bytes.fromhex(obj["proof_evm"])
    protocol, instances, _, dk = fixture

    from snark_verifier_tpu.sdk.evm import evm_verify, gen_evm_verifier

    verifier = gen_evm_verifier(protocol, KzgGwc, dk)
    assert verifier.solidity.count("staticcall(gas(), 0x8") == 1  # ONE pairing
    gas = evm_verify(verifier, instances, proof_evm)
    assert gas > 21000

    bad = bytearray(proof_evm)
    bad[31] ^= 1
    with pytest.raises(Exception):
        evm_verify(verifier, instances, bytes(bad))

    bad_limbs = [list(instances[0])]
    bad_limbs[0][5] ^= 1
    with pytest.raises(Exception):
        evm_verify(verifier, bad_limbs, proof_evm)
