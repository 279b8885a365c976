"""snark_verifier_tpu — a TPU-native SNARK verification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
privacy-scaling-explorations/snark-verifier (mounted read-only at
/root/reference): a generic PLONK verifier written once against a Loader
abstraction and interpreted by multiple backends — a pure-Python native
backend (oracle), and a JAX backend that jit-compiles the whole verification
(limb-decomposed BN254 arithmetic, Pippenger MSM, Keccak/Poseidon
transcripts, pairing) to TPU, batched over proofs with `vmap` and sharded
over device meshes with `shard_map`.
"""

from snark_verifier_tpu.errors import (
    Error,
    InvalidInstances,
    InvalidProtocol,
    AssertionFailure,
    TranscriptError,
)

__version__ = "0.1.0"

__all__ = [
    "Error",
    "InvalidInstances",
    "InvalidProtocol",
    "AssertionFailure",
    "TranscriptError",
]
