"""Aggregation: native accumulator fold + decide (the reference's
evm-verifier-with-accumulator flow, native pre-pass)."""

import pytest

from snark_verifier_tpu.pcs.kzg import KzgAsVerifyingKey, KzgGwc, KzgShplonk
from snark_verifier_tpu.pcs.kzg.accumulator import LimbsEncoding
from snark_verifier_tpu.pcs.kzg.decider import decide
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.sdk import gen_snark
from snark_verifier_tpu.sdk.aggregation import aggregate_native, verify_aggregation
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs


@pytest.mark.parametrize("As", [KzgGwc, KzgShplonk], ids=["gwc", "shplonk"])
def test_aggregate_fold_and_decide(As):
    srs = gen_srs(4)
    protocol, pk = build_standard_plonk(4, srs)
    scheme = "gwc" if As is KzgGwc else "shplonk"
    snarks = [
        gen_snark(pk, [[100 + i]], scheme, transcript_kind="poseidon")
        for i in range(3)
    ]

    result = aggregate_native(As, srs.g[0], snarks)
    assert len(result.snark_accumulators) == 3
    assert len(result.instances) == 16  # 4 limbs x 4 coordinates

    # folded accumulator passes the pairing check
    assert decide(srs.decider_key(), result.accumulator) is True

    # verifier-side fold over the AS proof reproduces the same accumulator
    folded = verify_aggregation(
        As, KzgAsVerifyingKey(False), result.snark_accumulators, result.as_proof
    )
    assert folded.lhs.value == result.accumulator.lhs.value
    assert folded.rhs.value == result.accumulator.rhs.value


def test_limbs_encoding_roundtrip():
    srs = gen_srs(4)
    protocol, pk = build_standard_plonk(4, srs)
    snarks = [gen_snark(pk, [[7]], "gwc", transcript_kind="poseidon")]
    result = aggregate_native(KzgGwc, srs.g[0], snarks)

    loader = NativeLoader()
    scalars = [loader.load_const(v) for v in result.instances]
    decoded = LimbsEncoding.from_repr(scalars)
    assert decoded.lhs.value == result.accumulator.lhs.value
    assert decoded.rhs.value == result.accumulator.rhs.value
