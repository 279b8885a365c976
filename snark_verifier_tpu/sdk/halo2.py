"""Proving helpers with artifact caching (parity: snark-verifier-sdk/src/halo2.rs).

Caching matches the reference's discipline: proofs are cached on disk and
**re-verified before reuse** (halo2.rs:163-177).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.pcs.kzg import KzgGwc, KzgShplonk
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.transcript import (
    NativeEvmTranscript,
    NativePoseidonTranscript,
)
from snark_verifier_tpu.verifier.plonk import PlonkVerifier

_CACHE_DIR = os.environ.get(
    "PARAMS_DIR", os.path.join(os.path.dirname(__file__), "../../testdata/cache")
)


@dataclass
class Snark:
    """(protocol, instances, proof) container (sdk lib.rs:49-67)."""

    protocol: object
    instances: list  # [[int]]
    proof: bytes


def scheme_class(scheme: str):
    return {"gwc": KzgGwc, "shplonk": KzgShplonk}[scheme]


def gen_proof(
    pk,
    instances,
    scheme: str = "gwc",
    cache_name: str | None = None,
    transcript_kind: str = "evm",
) -> bytes:
    path = (
        os.path.join(_CACHE_DIR, f"proof_{cache_name}_{scheme}_{transcript_kind}.pkl")
        if cache_name
        else None
    )
    from snark_verifier_tpu.util import metrics

    if path and os.path.exists(path):
        with open(path, "rb") as f:
            proof = pickle.load(f)
        if _verifies(pk, instances, proof, scheme, transcript_kind):
            metrics.count("sdk.proof_cache_hit")
            return proof
        metrics.count("sdk.proof_cache_stale")
    with metrics.timer("sdk.create_proof"):
        proof = _create(pk, instances, scheme, transcript_kind)
    if path:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        from snark_verifier_tpu.system.halo2.srs import _atomic_pickle

        _atomic_pickle(path, proof)
    return proof


def _create(pk, instances, scheme, transcript_kind) -> bytes:
    """prover_fast (threaded native kernels) when available — byte-identical
    to prover.create_proof (tests/test_prover_fast.py) — else the python
    oracle prover."""
    if os.environ.get("SVTPU_NATIVE", "1") != "0":
        from snark_verifier_tpu.util import frvec

        if frvec.available():
            from snark_verifier_tpu.system.halo2.prover_fast import create_proof_fast

            return create_proof_fast(pk, instances, scheme, transcript_kind)
    return create_proof(pk, instances, scheme, transcript_kind)


def gen_snark(
    pk,
    instances,
    scheme: str = "gwc",
    cache_name: str | None = None,
    transcript_kind: str = "evm",
) -> Snark:
    return Snark(
        pk.protocol,
        instances,
        gen_proof(pk, instances, scheme, cache_name, transcript_kind),
    )


def _verifies(pk, instances, proof, scheme, transcript_kind: str = "evm") -> bool:
    try:
        loader = NativeLoader()
        verifier = PlonkVerifier(scheme_class(scheme))
        dk = pk.srs.decider_key()
        loaded = pk.protocol.loaded(loader)
        ins = [[loader.load_const(v) for v in col] for col in instances]
        transcript = (
            NativeEvmTranscript(proof, loader)
            if transcript_kind == "evm"
            else NativePoseidonTranscript(proof, loader)
        )
        p = verifier.read_proof(dk, loaded, ins, transcript)
        return verifier.verify(dk, loaded, ins, p) is True
    except Exception:
        return False
