"""Proof aggregation: the native pre-pass of the reference's
AggregationCircuit (snark-verifier-sdk/src/halo2/aggregation.rs:51-247).

`aggregate_native` verifies each snark succinctly (Poseidon transcript),
folds the resulting KZG accumulators with the accumulation scheme, and
returns the folded accumulator together with its 4x68-bit limb encoding —
the public-instance format of an aggregation circuit
(accumulator_indices = (0, 0..16), aggregation.rs:387-402).

`aggregate_in_circuit` is the in-circuit pass (aggregation.rs:249-402):
the same succinct-verify + fold, interpreted by the Halo2Loader, so every
challenge, scalar identity, and MSM becomes a circuit constraint and the
folded accumulator's 4x68-bit limbs are the circuit's public instances —
byte-identical to the native pre-pass limbs.
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.kzg import KzgAsProvingKey
from snark_verifier_tpu.pcs.kzg.accumulator import (
    KzgAccumulator,
    accumulator_to_limbs,
)
from snark_verifier_tpu.system.halo2.transcript import NativePoseidonTranscript
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier


@dataclass
class AggregationResult:
    accumulator: KzgAccumulator
    as_proof: bytes  # accumulation-scheme proof (empty if single snark)
    instances: list  # 16 Fr ints: the accumulator limbs
    snark_accumulators: list


def aggregate_native(As, svk, snarks, as_pk: KzgAsProvingKey | None = None, rng=None):
    """Fold the accumulators of `snarks` (aggregation.rs:195-247).

    As: KzgGwc | KzgShplonk; svk: the SRS G1 generator; snarks: [sdk.Snark]
    proved with the Poseidon transcript.
    """
    from snark_verifier_tpu.util import metrics

    loader = NativeLoader()
    verifier = PlonkSuccinctVerifier(As)

    metrics.count("aggregation.native_pre_pass")
    accumulators = []
    for snark in snarks:
        loaded = snark.protocol.loaded(loader)
        instances = [[loader.load_const(v) for v in col] for col in snark.instances]
        transcript = NativePoseidonTranscript(snark.proof, loader)
        proof = verifier.read_proof(svk, loaded, instances, transcript)
        accumulators.extend(verifier.verify(svk, loaded, instances, proof))

    as_pk = as_pk or KzgAsProvingKey()
    if len(accumulators) == 1:
        accumulator, as_proof = accumulators[0], b""
    else:
        transcript = NativePoseidonTranscript()
        accumulator = As.create_proof(as_pk, accumulators, transcript, rng)
        as_proof = transcript.finalize()

    return AggregationResult(
        accumulator=accumulator,
        as_proof=as_proof,
        instances=accumulator_to_limbs(accumulator),
        snark_accumulators=accumulators,
    )


def verify_aggregation(As, vk, accumulators, as_proof: bytes) -> KzgAccumulator:
    """Verifier side of the fold (KzgAs::verify through a read transcript)."""
    transcript = NativePoseidonTranscript(as_proof)
    proof = As.as_read_proof(vk, accumulators, transcript)
    return As.as_verify(vk, accumulators, proof)


def aggregate_in_circuit(As, svk, snarks, as_proof: bytes = b"", builder=None,
                         preprocessed_as_witness: bool = False):
    """In-circuit aggregation pass (aggregation.rs:249-402): run the
    succinct verifier + accumulation-scheme verifier under the Halo2Loader,
    exposing the folded accumulator's 16 limb scalars as public instances.

    `builder` defaults to a StreamingChecker (check-only; the synthesized
    verifier runs to millions of rows).  Pass a recording CircuitBuilder to
    actually compile/prove small instances.  `preprocessed_as_witness` lifts
    each snark's preprocessed commitments + transcript init state as circuit
    WITNESSES instead of constants (protocol.rs:158-188) — the recursion
    variant where the verifying key is not fixed at circuit definition.
    Returns (builder, instances) where instances are the exposed limb ints
    (must equal the native pre-pass `AggregationResult.instances`)."""
    from snark_verifier_tpu.loader import Scalar
    from snark_verifier_tpu.loader.halo2 import Halo2Loader
    from snark_verifier_tpu.loader.halo2.builder import StreamingChecker
    from snark_verifier_tpu.loader.halo2.ecc_chip import EccChip
    from snark_verifier_tpu.loader.halo2.transcript import Halo2PoseidonTranscript
    from snark_verifier_tpu.pcs.kzg import KzgAsVerifyingKey

    # range_bits=17 splits the 68-bit limbs into exactly 4 lookup chunks
    # (no partial-width rows); the 2^17-row table is negligible at this scale
    builder = builder if builder is not None else StreamingChecker(range_bits=17)
    loader = Halo2Loader(ecc_chip=EccChip(), builder=builder)
    verifier = PlonkSuccinctVerifier(As)

    accumulators = []
    for i, snark in enumerate(snarks):
        loader.start_cost_metering(f"snark-{i}")  # row metering, loader.rs:272-295
        loaded = (
            snark.protocol.loaded_preprocessed_as_witness(loader)
            if preprocessed_as_witness
            else snark.protocol.loaded(loader)
        )
        instances = [
            [loader.assign_scalar(v) for v in col] for col in snark.instances
        ]
        transcript = Halo2PoseidonTranscript(snark.proof, loader)
        proof = verifier.read_proof(svk, loaded, instances, transcript)
        accumulators.extend(verifier.verify(svk, loaded, instances, proof))
        loader.end_cost_metering()

    if len(accumulators) == 1:
        accumulator = accumulators[0]
    else:
        loader.start_cost_metering("accumulation")
        transcript = Halo2PoseidonTranscript(as_proof, loader)
        vk = KzgAsVerifyingKey()
        proof = As.as_read_proof(vk, accumulators, transcript)
        accumulator = As.as_verify(vk, accumulators, proof)
        loader.end_cost_metering()

    chip = loader.ecc_chip
    exposed = []
    for pt in (accumulator.lhs, accumulator.rhs):
        for coord in (pt.value.x, pt.value.y):
            canon = chip.integer.normalize(loader.ctx, coord)
            for limb in canon.limbs:
                loader.expose_scalar(Scalar(loader, limb))
                exposed.append(limb.value)
    builder.row_costs = dict(loader.row_costs)  # per-identifier row metering
    return builder, exposed
