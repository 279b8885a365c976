"""In-circuit aggregation: the full verifier as circuit constraints.

Parity: snark-verifier-sdk AggregationCircuit (halo2/aggregation.rs:249-402)
— the succinct verifier + accumulation fold interpreted by the Halo2Loader.
The synthesized verifier runs to ~1.8M rows per snark (CRT integer gadget;
reference aggregation circuits are k=21..23, the same scale), so
satisfiability is checked by the StreamingChecker (MockProver analogue)
rather than proven by the pure-python host prover; proving-path coverage for
loader-built circuits lives in test_halo2_loader.py / test_ecc_chip.py at
small k.
"""

import os

import pytest

from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.sdk import gen_snark
from snark_verifier_tpu.sdk.aggregation import aggregate_in_circuit, aggregate_native
from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk
from snark_verifier_tpu.system.halo2.srs import gen_srs

K = 4


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    protocol, pk = build_standard_plonk(K, srs)
    return srs, pk


def test_in_circuit_verify_single_snark(setup):
    """One snark succinct-verified entirely in-circuit; every constraint
    satisfied and the exposed accumulator limbs byte-equal the native
    pre-pass."""
    srs, pk = setup
    snark = gen_snark(pk, [[777]], "gwc", cache_name=None, transcript_kind="poseidon")
    native = aggregate_native(KzgGwc, srs.g[0], [snark])

    builder, exposed = aggregate_in_circuit(KzgGwc, srs.g[0], [snark])
    assert builder.check_witness() == []
    assert exposed == native.instances
    assert builder.n_rows > 500_000  # it really is the whole verifier


def test_in_circuit_preprocessed_as_witness(setup):
    """The recursion variant (protocol.rs:158-188): preprocessed commitments
    + transcript init state enter the circuit as WITNESSES; the verifier
    still closes, limbs still byte-equal the native pre-pass, and the
    cost-metering hooks report per-snark row counts."""
    srs, pk = setup
    snark = gen_snark(pk, [[888]], "gwc", cache_name=None, transcript_kind="poseidon")
    native = aggregate_native(KzgGwc, srs.g[0], [snark])

    builder, exposed = aggregate_in_circuit(
        KzgGwc, srs.g[0], [snark], preprocessed_as_witness=True
    )
    assert builder.check_witness() == []
    assert exposed == native.instances
    # row metering (loader.rs:272-295 role): per-identifier row costs
    assert builder.row_costs["snark-0"] > 500_000
    assert builder.row_costs["snark-0"] <= builder.n_rows


@pytest.mark.skipif(
    not os.environ.get("SVTPU_SLOW"), reason="~2x single-snark cost; SVTPU_SLOW=1"
)
def test_in_circuit_fold_two_snarks(setup):
    """Two snarks verified + their accumulators folded in-circuit through
    the accumulation-scheme verifier (KzgAs::verify)."""
    srs, pk = setup
    snarks = [
        gen_snark(pk, [[v]], "gwc", cache_name=None, transcript_kind="poseidon")
        for v in (111, 222)
    ]
    native = aggregate_native(KzgGwc, srs.g[0], snarks)
    builder, exposed = aggregate_in_circuit(
        KzgGwc, srs.g[0], snarks, as_proof=native.as_proof
    )
    assert builder.check_witness() == []
    assert exposed == native.instances
