"""Verifier cost model (parity: cost.rs:7-40 + impls in verifier/plonk.rs
:137-188, pcs/kzg/multiopen/{bdfg21.rs:373-386, gwc19.rs:162-176}) and the
EVM gas estimator (loader/evm/util.rs:94-102)."""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class Cost:
    num_instance: int = 0
    num_commitment: int = 0
    num_evaluation: int = 0
    num_msm: int = 0
    num_pairing: int = 0

    def __add__(self, other: "Cost") -> "Cost":
        return Cost(
            self.num_instance + other.num_instance,
            self.num_commitment + other.num_commitment,
            self.num_evaluation + other.num_evaluation,
            self.num_msm + other.num_msm,
            self.num_pairing + other.num_pairing,
        )


def pcs_cost(As, protocol) -> Cost:
    """Multiopen cost (gwc19.rs:162-176 / bdfg21.rs:373-386)."""
    from snark_verifier_tpu.pcs.kzg import Bdfg21, Gwc19
    from snark_verifier_tpu.verifier.plonk.proof import PlonkProof

    mos = getattr(As, "mos", As)
    if mos is Bdfg21:
        return Cost(num_commitment=2, num_msm=2)
    if mos is Gwc19:
        queries = PlonkProof.empty_queries(protocol)
        shifts = []
        for q in queries:
            if q.shift not in shifts:
                shifts.append(q.shift)
        return Cost(num_commitment=len(shifts), num_msm=len(shifts))
    raise ValueError(f"unknown multiopen scheme {As}")


def succinct_verifier_cost(As, protocol) -> Cost:
    """PlonkSuccinctVerifier cost (verifier/plonk.rs:147-168)."""
    num_accumulator = len(protocol.accumulator_indices)
    num_instance = sum(protocol.num_instance)
    num_commitment = sum(protocol.num_witness) + protocol.quotient.num_chunk
    num_evaluation = len(protocol.evaluations)
    num_msm = len(protocol.preprocessed) + num_commitment + 1 + 2 * num_accumulator
    return Cost(
        num_instance=num_instance,
        num_commitment=num_commitment,
        num_evaluation=num_evaluation,
        num_msm=num_msm,
    ) + pcs_cost(As, protocol)


def verifier_cost(As, protocol) -> Cost:
    """PlonkVerifier cost: succinct + 2 pairings (verifier/plonk.rs:181-187)."""
    return succinct_verifier_cost(As, protocol) + Cost(num_pairing=2)


def estimate_gas(cost: Cost) -> int:
    """EVM verification gas estimate (loader/evm/util.rs:94-102)."""
    proof_size = cost.num_commitment * 64 + (cost.num_evaluation + cost.num_instance) * 32
    intrinsic = 21000
    calldata = math.ceil(proof_size * 15.25)
    syscall = 45100 + cost.num_pairing * 34000 + max(0, cost.num_msm - 2) * 6350
    return intrinsic + calldata + syscall
