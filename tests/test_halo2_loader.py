"""Halo2Loader (in-circuit interpreter): builder + main gate + loader.

Parity: loader/halo2/loader.rs + shim.rs — circuits synthesized by running
loader ops must (a) satisfy their own constraints (MockProver analogue),
(b) prove and verify through the regular host-prover / native / JAX
pipeline, and (c) reject corrupted witnesses.
"""

import jax
import pytest

from snark_verifier_tpu.loader.halo2 import Halo2Loader
from snark_verifier_tpu.loader.halo2.builder import CircuitBuilder
from snark_verifier_tpu.loader.native import NativeLoader
from snark_verifier_tpu.parallel.batch import (
    build_verifier,
    pack_instances,
    pack_proofs,
)
from snark_verifier_tpu.pcs.kzg import KzgGwc
from snark_verifier_tpu.system.halo2.prover import create_proof
from snark_verifier_tpu.system.halo2.srs import gen_srs
from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.verifier.plonk import PlonkVerifier

R = bn254.R


def _scalar_computation(loader):
    """A little program exercising every IntegerInstructions path; returns
    the result scalar.  Expected value computed alongside in ints."""
    x = loader.assign_scalar(12345)
    y = loader.assign_scalar(678)
    s = loader.sum_with_coeff_and_const([(3, x), (5, y)], 7)  # 3x+5y+7
    p = loader.sum_products_with_coeff_and_const([(2, x, y), (1, s, s)], 11)
    inv = p.invert()
    loader.assert_eq("inv*p == 1", inv * p, loader.load_one())
    out = (p - x) * inv + loader.load_const(99) - y.pow_const(3)
    return x, y, out


def _expected():
    x, y = 12345, 678
    s = (3 * x + 5 * y + 7) % R
    p = (2 * x * y + s * s + 11) % R
    inv = bn254.inv_mod(p, R)
    return ((p - x) * inv + 99 - pow(y, 3, R)) % R


def test_witness_check_and_prove_verify():
    loader = Halo2Loader()
    x, y, out = _scalar_computation(loader)
    assert out.value.value == _expected()
    loader.expose_scalar(out)

    assert loader.builder.check_witness() == []

    srs = gen_srs(max(loader.builder.k(), 4))
    protocol, pk = loader.builder.build(srs, name="m1-scalar")

    instances = [loader.builder.instance_values()]
    proof_bytes = create_proof(pk, instances, "gwc")

    nat = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(nat)
    ins = [[nat.load_const(v) for v in col] for col in instances]
    transcript = NativeEvmTranscript(proof_bytes, nat)
    proof = verifier.read_proof(dk, loaded, ins, transcript)
    assert verifier.verify(dk, loaded, ins, proof) is True

    # JAX backend on the same synthesized circuit
    fn = jax.jit(build_verifier(protocol, KzgGwc, srs.g[0]))
    out_j = fn(pack_proofs([proof_bytes]), pack_instances([instances]))
    assert bool(out_j["ok"][0])


def test_witness_check_catches_violations():
    loader = Halo2Loader()
    a = loader.assign_scalar(4)
    b = loader.assign_scalar(5)
    loader.assert_eq("4 == 5", a, b)  # wrong on purpose
    failures = loader.builder.check_witness()
    assert any("copy constraint" in f for f in failures)


def test_invert_zero_unsatisfiable():
    loader = Halo2Loader()
    z = loader.assign_scalar(0)
    loader.invert(z)
    failures = loader.builder.check_witness()
    assert any("gate unsatisfied" in f for f in failures)


def test_range_cells_and_lookup_circuit():
    builder = CircuitBuilder(range_bits=8)
    loader = Halo2Loader(builder=builder)
    v = loader.assign_scalar(200)
    builder.range_cell(200)
    builder.range_cell(255)
    loader.expose_scalar(v * v)
    assert builder.check_witness() == []

    srs = gen_srs(builder.k())
    protocol, pk = builder.build(srs, name="m1-range")
    instances = [builder.instance_values()]
    proof_bytes = create_proof(pk, instances, "gwc")

    nat = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(nat)
    ins = [[nat.load_const(x) for x in col] for col in instances]
    proof = verifier.read_proof(dk, loaded, ins, NativeEvmTranscript(proof_bytes, nat))
    assert verifier.verify(dk, loaded, ins, proof) is True


def test_range_cell_out_of_bounds_detected():
    builder = CircuitBuilder(range_bits=8)
    builder.range_cell(256)
    assert any("range" in f for f in builder.check_witness())
