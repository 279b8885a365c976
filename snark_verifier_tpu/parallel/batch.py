"""Batched device verification: specialize the loader-generic verifier to a
protocol and jit it over a proof batch.

This is the capability the reference does not have: `build_verifier` stages
the whole PLONK verify (transcript keccak + field math + MSMs) into one XLA
computation over (B, ...) arrays — one trace, B proofs — and
`parallel.mesh` shards it over TPU meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.loader import Scalar
from snark_verifier_tpu.loader.jax_loader import JaxLoader
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops.limbs import ints_to_limbs
from snark_verifier_tpu.system.halo2.transcript_jax import (
    JaxEvmTranscript,
    JaxPoseidonTranscript,
)
from snark_verifier_tpu.verifier.plonk import PlonkSuccinctVerifier

FR = F.FR


def build_verifier(protocol, As, svk, decide_dk=None, transcript_kind: str = "evm"):
    """Returns a jittable `fn(proof_bytes, instances) -> result dict`.

    proof_bytes: (B, L) uint32 byte values; instances: (B, total, 16)
    canonical Fr limbs (columns flattened in order).  Output dict:
      lhs_x, lhs_y, rhs_x, rhs_y: (B, 16) canonical Fq limbs of the
      accumulator pair, and ok: (B,) validity mask.  If `decide_dk` is
      given, the pairing check runs in-graph and folds into `ok`.
    """
    verifier = PlonkSuccinctVerifier(As)
    num_instance = protocol.num_instance

    def verify_fn(proof_bytes, instances):
        batch_shape = proof_bytes.shape[:-1]
        loader = JaxLoader(batch_shape)
        loaded = protocol.loaded(loader)

        cols = []
        off = 0
        for n in num_instance:
            cols.append(
                [
                    Scalar(loader, F.to_mont(instances[..., off + i, :], FR))
                    for i in range(n)
                ]
            )
            off += n

        transcript = (
            JaxEvmTranscript(proof_bytes, loader)
            if transcript_kind == "evm"
            else JaxPoseidonTranscript(proof_bytes, loader)
        )
        proof = verifier.read_proof(svk, loaded, cols, transcript)
        accumulators = verifier.verify(svk, loaded, cols, proof)

        # Every accumulator (the fresh one plus any old ones decoded from the
        # instance columns) must be decided — mirroring decide_all
        # (verifier/plonk.rs:125-134).  With one accumulator the coordinate
        # outputs are (B, 16); with A > 1 they gain a leading axis (A, B, 16)
        # so deferred deciding sees all of them.
        if decide_dk is not None:
            for acc in accumulators:
                loader.decide_pairing(acc, decide_dk)

        def coords(acc):
            lhs = acc.lhs.value.as_affine()
            rhs = acc.rhs.value.as_affine()
            return {
                "lhs_x": F.from_mont(lhs.x, F.FQ),
                "lhs_y": F.from_mont(lhs.y, F.FQ),
                "rhs_x": F.from_mont(rhs.x, F.FQ),
                "rhs_y": F.from_mont(rhs.y, F.FQ),
            }

        if len(accumulators) == 1:
            out = coords(accumulators[0])
        else:
            per_acc = [coords(a) for a in accumulators]
            out = {
                k: jnp.stack([jnp.broadcast_to(c[k], batch_shape + (16,)) for c in per_acc])
                for k in per_acc[0]
            }
        out["ok"] = loader.ok
        return out

    return verify_fn


def pack_proofs(proof_bytes_list):
    """Host: list of equal-length proof byte strings -> (B, L) uint32."""
    L = len(proof_bytes_list[0])
    assert all(len(p) == L for p in proof_bytes_list)
    return jnp.asarray(
        np.frombuffer(b"".join(proof_bytes_list), np.uint8)
        .reshape(len(proof_bytes_list), L)
        .astype(np.uint32)
    )


def pack_instances(instances_list):
    """Host: list (per proof) of per-column int lists -> (B, total, 16)."""
    flat = [[v for col in ins for v in col] for ins in instances_list]
    return jnp.asarray(np.stack([ints_to_limbs(row) for row in flat]))


def build_batch_decider(dk):
    """Jittable `fn(lhs_x, lhs_y, rhs_x, rhs_y, fold_scalars) -> ok?`.

    Production batch-decide pattern: fold the B accumulators with a random
    linear combination (soundness: verifier-local randomness), evaluating two
    B-term MSMs, then run ONE pairing check — the device analogue of the
    EVM decider's keccak-challenge fold (pcs/kzg/decider.rs:146-186).

    Inputs are the canonical affine coords from `build_verifier`'s output
    plus (B, 16) canonical random fold scalars.
    """
    from snark_verifier_tpu.ops import msm as MSM
    from snark_verifier_tpu.ops import pairing as PAIR
    from snark_verifier_tpu.ops.curve import G1

    @jax.jit
    def _fold_stage(lhs_x, lhs_y, rhs_x, rhs_y, fold_scalars):
        def to_g1(cx, cy):
            xm = F.to_mont(cx, F.FQ)
            ym = F.to_mont(cy, F.FQ)
            inf = jnp.logical_and(
                jnp.all(cx == 0, axis=-1), jnp.all(cy == 0, axis=-1)
            )
            z = F.select(inf, F.zeros(inf.shape), F.ones(inf.shape, F.FQ))
            return G1(xm, F.select(inf, F.ones(inf.shape, F.FQ), ym), z)

        lhs = MSM.msm_serial(to_g1(lhs_x, lhs_y), fold_scalars)
        rhs = MSM.msm_serial(to_g1(rhs_x, rhs_y), fold_scalars)
        return lhs, rhs

    def decide_fn(lhs_x, lhs_y, rhs_x, rhs_y, fold_scalars):
        # fold jitted as one stage; the pairing stays deliberately staged
        # (never wrap kzg_pairing_check in an outer jit — CLAUDE.md)
        lhs, rhs = _fold_stage(lhs_x, lhs_y, rhs_x, rhs_y, fold_scalars)
        lhs = G1(lhs.x[None], lhs.y[None], lhs.z[None])
        rhs = G1(rhs.x[None], rhs.y[None], rhs.z[None])
        return PAIR.kzg_pairing_check(lhs, rhs, dk.g2, dk.s_g2)[0]

    return decide_fn


def decode_accumulator(result, index=0):
    """Host: result dict -> ((lhs, rhs) affine int pairs) for one element."""
    import numpy as _np

    from snark_verifier_tpu.ops.limbs import limbs_to_int

    def coord(key):
        return limbs_to_int(_np.asarray(result[key])[index])

    return (
        (coord("lhs_x"), coord("lhs_y")),
        (coord("rhs_x"), coord("rhs_y")),
    )
