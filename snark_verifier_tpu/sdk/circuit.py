"""CircuitExt: the SDK's circuit interface (parity: sdk lib.rs:108-125).

The reference defines `CircuitExt: Circuit` with `num_instance`,
`instances`, and `accumulator_indices`; proving helpers are generic over
it.  Here a circuit owns its witness inputs and knows how to compile
itself to a (protocol, ProvingKey) pair; `gen_snark_for` drives any
CircuitExt through the cached prover.
"""

from __future__ import annotations

from snark_verifier_tpu.sdk.halo2 import Snark, gen_proof


class CircuitExt:
    """Interface: instance shape/values + optional accumulator indices."""

    def num_instance(self) -> list:
        return [len(col) for col in self.instances()]

    def instances(self) -> list:
        raise NotImplementedError

    @staticmethod
    def accumulator_indices() -> list | None:
        """[[(column, row)]] of exposed accumulator limbs, or None
        (lib.rs:115-118)."""
        return None

    def compile(self, k: int, srs):
        """-> (protocol, ProvingKey)."""
        raise NotImplementedError


class StandardPlonkCircuit(CircuitExt):
    """The flagship test circuit as a CircuitExt (standard.rs:10-124)."""

    def __init__(self, x: int, zk: bool = False):
        self.x = x
        self.zk = zk

    def instances(self):
        return [[self.x]]

    def compile(self, k, srs):
        from snark_verifier_tpu.system.halo2.circuits import build_standard_plonk

        return build_standard_plonk(k, srs, zk=self.zk)


class LookupPlonkCircuit(CircuitExt):
    def __init__(self, x: int, range_values=(3, 7, 0, 15), zk: bool = False):
        self.x = x
        self.range_values = range_values
        self.zk = zk

    def instances(self):
        return [[self.x]]

    def compile(self, k, srs):
        import dataclasses

        from snark_verifier_tpu.system.halo2.circuits import build_lookup_plonk

        protocol, pk = build_lookup_plonk(k, srs, zk=self.zk)
        base = pk.synthesize
        rv = self.range_values
        pk = dataclasses.replace(pk, synthesize=lambda ins: base(ins, rv))
        return protocol, pk


class BuilderCircuit(CircuitExt):
    """Any circuit synthesized by the Halo2Loader's CircuitBuilder."""

    def __init__(self, builder, name: str = "builder-circuit"):
        self.builder = builder
        self.name = name

    def instances(self):
        self.builder._relocate_instance_rows()
        return [self.builder.instance_values()]

    def compile(self, k, srs):
        assert k >= self.builder.k()
        return self.builder.build(srs, name=self.name)


def gen_snark_for(
    circuit: CircuitExt,
    k: int,
    srs,
    scheme: str = "gwc",
    cache_name: str | None = None,
    transcript_kind: str = "evm",
) -> Snark:
    """Compile + prove a CircuitExt (halo2.rs gen_snark's role)."""
    protocol, pk = circuit.compile(k, srs)
    instances = circuit.instances()
    assert circuit.num_instance() == protocol.num_instance
    proof = gen_proof(pk, instances, scheme, cache_name, transcript_kind)
    return Snark(protocol, instances, proof)
