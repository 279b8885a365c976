"""SDK layer: user-facing helpers mirroring `snark-verifier-sdk`.

`Snark` is the serializable (protocol, instances, proof) triple
(snark-verifier-sdk/src/lib.rs:49-67); `gen_snark` proves with disk caching
and re-verifies cached artifacts before reuse (halo2.rs:115-185 semantics).
"""

from snark_verifier_tpu.sdk.halo2 import Snark, gen_snark, gen_proof

__all__ = ["Snark", "gen_snark", "gen_proof"]
