"""Two-level recursion: aggregate an aggregator.

The outer snark produced by examples/aggregation_e2e.py (a proven k=21
aggregation circuit whose instances carry the folded inner accumulator as
4x68-bit limbs) is itself fed back through the aggregation path: its
succinct verification yields TWO accumulators (the fresh one plus the old
one decoded from its instances via LimbsEncoding), which are folded by the
accumulation scheme and decided — mirroring the reference's
two_snark_with_accumulator (test/kzg/halo2.rs:372-385, the `#[ignore]`
32GB test).  The in-circuit pass re-runs the same verification under the
Halo2Loader and must expose byte-identical limbs.
"""

import json
import os

import pytest

from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey, decide
from snark_verifier_tpu.sdk.aggregation import aggregate_in_circuit, aggregate_native
from snark_verifier_tpu.sdk.halo2 import Snark
from snark_verifier_tpu.verifier.plonk.serialization import protocol_from_json

FIXTURE = os.path.join(
    os.path.dirname(__file__), "golden", "aggregation_outer_1snark.json"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="run examples/aggregation_e2e.py to generate the fixture",
)


@pytest.fixture(scope="module")
def outer_snark():
    with open(FIXTURE) as f:
        obj = json.load(f)
    protocol = protocol_from_json(obj["protocol"])
    snark = Snark(
        protocol,
        [[int(v, 16) for v in obj["instances"]]],
        bytes.fromhex(obj["proof"]),
    )
    dk = KzgDecidingKey(
        svk=tuple(int(c, 16) for c in obj["dk"]["svk"]),
        g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["g2"]),
        s_g2=tuple(tuple(int(c, 16) for c in pair) for pair in obj["dk"]["s_g2"]),
    )
    return snark, dk


def test_two_level_native_fold_and_decide(outer_snark):
    snark, dk = outer_snark
    result = aggregate_native(KzgGwc, dk.svk, [snark])
    # level-2 aggregation sees BOTH the fresh accumulator of the outer proof
    # and the decoded old (level-1 folded) accumulator, then folds them
    assert len(result.snark_accumulators) == 2
    # non-zk KzgAs proofs carry no bytes (accumulation.rs:148-197: the fold
    # challenge is squeezed from absorbed accumulators only)
    assert result.as_proof == b""
    assert decide(dk, result.accumulator) is True
    # each pre-fold accumulator also decides (halo2.rs:379-385 semantics)
    for acc in result.snark_accumulators:
        assert decide(dk, acc) is True
    assert len(result.instances) == 16


def test_two_level_in_circuit_limbs_match_native(outer_snark):
    snark, dk = outer_snark
    native = aggregate_native(KzgGwc, dk.svk, [snark])
    builder, exposed = aggregate_in_circuit(
        KzgGwc, dk.svk, [snark], as_proof=native.as_proof
    )
    assert builder.check_witness() == []
    assert exposed == native.instances


def test_two_level_fold_rejects_mutated_accumulator(outer_snark):
    snark, dk = outer_snark
    result = aggregate_native(KzgGwc, dk.svk, [snark])
    bad = result.accumulator
    from snark_verifier_tpu.loader import EcPoint

    lhs = bad.lhs
    x, y = lhs.value
    bad.lhs = EcPoint(lhs.loader, (x, (y + 1) % (2**256)))
    with pytest.raises(Exception):
        assert decide(dk, bad) is not True
