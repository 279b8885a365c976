"""EVM verifier generation + simulated on-chain verification
(parity: snark-verifier-sdk/src/evm.rs:112-192).

`gen_evm_verifier` stages the PLONK verifier through the EvmLoader into a
Solidity/Yul contract; `evm_verify` executes the generated program with the
in-process executor (role of revm); `write_calldata`/`encode_calldata`
match loader/evm/util.rs:78-91 (instances BE || proof).
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.loader.evm import EvmLoader
from snark_verifier_tpu.loader.evm_interp import EvmExecutor, EvmRevert
from snark_verifier_tpu.system.halo2.transcript_evmgen import EvmGenTranscript
from snark_verifier_tpu.verifier.plonk import PlonkVerifier


@dataclass
class EvmVerifier:
    solidity: str
    ir: list
    num_instance: list


def gen_evm_verifier(protocol, As, dk, path: str | None = None) -> EvmVerifier:
    """Stage the verifier into Yul (evm.rs:112-178).  `dk` is the
    KzgDecidingKey; writes the .sol next to `path` if given."""
    loader = EvmLoader()
    transcript = EvmGenTranscript(loader)
    loaded = protocol.loaded(loader)
    instances = transcript.load_instances(protocol.num_instance)

    verifier = PlonkVerifier(As)
    proof = verifier.read_proof(dk, loaded, instances, transcript)
    verifier.verify(dk, loaded, instances, proof)

    solidity = loader.solidity_code()
    if path:
        with open(path, "w") as f:
            f.write(solidity)
    return EvmVerifier(solidity, loader.ir, list(protocol.num_instance))


def encode_calldata(instances, proof: bytes) -> bytes:
    """instances (per-column int lists) || proof, 32-byte BE words
    (loader/evm/util.rs:78-91)."""
    out = bytearray()
    for col in instances:
        for v in col:
            out += int(v).to_bytes(32, "big")
    out += proof
    return bytes(out)


def evm_verify(verifier: EvmVerifier, instances, proof: bytes) -> int:
    """Run the generated verifier on calldata (evm.rs:180-192 semantics):
    returns MODELED gas on accept, raises EvmRevert on reject.

    Gas caveat: solc/revm do not exist in this environment, so the number
    comes from the in-repo Yul interpreter's gas schedule
    (loader/evm_yul.py — Yellow-Paper/EIP-1108 rules for the opcodes and
    precompiles the contract uses), not from a real EVM run.  Treat it as
    a model estimate until the contract has been executed by revm/geth.

    Executes BOTH the rendered Yul text (the artifact users deploy — role
    of solc+revm, loader/evm/util.rs:105-130) and the loader IR, asserting
    they agree, so text and IR cannot silently diverge."""
    from snark_verifier_tpu.loader.evm_yul import YulVerifier

    calldata = encode_calldata(instances, proof)
    try:
        ir_ok = bool(EvmExecutor(verifier.ir, calldata).run())
    except EvmRevert:
        ir_ok = False
    try:
        gas = YulVerifier(verifier.solidity).run(calldata)
    except EvmRevert:
        if ir_ok:
            raise AssertionError("IR accepts but rendered Yul reverts")
        raise
    if not ir_ok:
        raise AssertionError("rendered Yul accepts but IR executor reverts")
    return gas


__all__ = ["EvmVerifier", "gen_evm_verifier", "encode_calldata", "evm_verify", "EvmRevert"]
