"""Non-native integer gadget + EccChip (in-circuit EC arithmetic).

Parity: the Integer/Ecc chips behind loader/halo2/shim.rs:161-472 — Fq as
4x68-bit range-checked limbs in an Fr circuit, sound incomplete addition,
double-and-add MSM with aux offset.  Checked against the python-int oracle
and through the MockProver-analogue witness checker; one small circuit is
proven and verified end-to-end through the regular pipeline.
"""

import random

import pytest

from snark_verifier_tpu.loader.halo2 import Halo2Loader
from snark_verifier_tpu.loader.halo2.builder import CircuitBuilder
from snark_verifier_tpu.loader.halo2.ecc_chip import EccChip
from snark_verifier_tpu.loader.halo2.integer import IntegerChip
from snark_verifier_tpu.loader.halo2.main_gate import MainGateChip
from snark_verifier_tpu.loader.halo2.shim import Context
from snark_verifier_tpu.util import bn254 as bn

P = bn.P


def _fresh(range_bits=10):
    b = CircuitBuilder(range_bits=range_bits)
    return b, Context(b)


def test_integer_chip_ops_vs_oracle():
    rng = random.Random(7)
    b, ctx = _fresh()
    chip = IntegerChip(MainGateChip())
    x, y = rng.randrange(P), rng.randrange(P)
    ax, ay = chip.assign(ctx, x), chip.assign(ctx, y)
    assert chip.mul(ctx, ax, ay).value == x * y % P
    assert chip.reduce(ctx, chip.add(ctx, ax, ay)).value == (x + y) % P
    assert chip.reduce(ctx, chip.sub(ctx, ax, ay)).value % P == (x - y) % P
    inv = chip.invert(ctx, ax)
    assert inv.value * x % P == 1
    n = chip.normalize(ctx, chip.add(ctx, ax, ay))
    assert n.value == (x + y) % P and n.value < P
    chip.assert_equal(ctx, n, chip.assign_constant(ctx, (x + y) % P))
    assert b.check_witness() == []


def test_integer_chip_detects_tampering():
    b, ctx = _fresh()
    chip = IntegerChip(MainGateChip())
    ax = chip.assign(ctx, 12345)
    ay = chip.assign(ctx, 67890)
    chip.mul(ctx, ax, ay)
    assert b.check_witness() == []
    # flip one advice value somewhere in the mul rows: must break a gate or
    # a copy constraint
    row = len(b.rows) - 3
    vals = list(b.rows[row])
    vals[7] = (vals[7] + 1) % bn.R  # advice column a (5-wire row layout)
    b.rows[row] = tuple(vals)
    assert b.check_witness() != []


def test_ec_add_double_msm_vs_oracle():
    b, ctx = _fresh()
    chip = EccChip()
    g = bn.G1_GEN
    a1 = chip.assign_point(ctx, g)
    a2 = chip.assign_point(ctx, bn.g1_mul(g, 2))
    assert chip.add(ctx, a1, a2).value == bn.g1_mul(g, 3)
    assert chip.double(ctx, a2).value == bn.g1_mul(g, 4)
    s1 = chip.gate.assign_integer(ctx, 11)
    s2 = chip.gate.assign_integer(ctx, 7)
    out = chip.msm_bits(ctx, [(s1, a1), (s2, a2)], None, 5)
    assert out.value == bn.g1_mul(g, 25)
    xr, yr = chip.coords_reduced_native(ctx, out)
    assert xr.value == bn.g1_mul(g, 25)[0] % bn.R
    assert yr.value == bn.g1_mul(g, 25)[1] % bn.R
    assert b.check_witness() == []


def test_ec_full_width_scalar_mul_vs_oracle():
    """One full-width (254-bit) scalar mul through the MSM path."""
    b, ctx = _fresh()
    chip = EccChip()
    s_val = int.from_bytes(b"full-width scalar test value....", "big") % bn.R
    a = chip.assign_point(ctx, bn.G1_GEN)
    s = chip.gate.assign_integer(ctx, s_val)
    out = chip.variable_base_msm(ctx, [(s, a)])
    assert out.value == bn.g1_mul(bn.G1_GEN, s_val)
    assert b.check_witness() == []


def test_off_curve_point_rejected():
    b, ctx = _fresh()
    chip = EccChip()
    with pytest.raises(AssertionError):
        chip.assign_point(ctx, (bn.G1_GEN[0], (bn.G1_GEN[1] + 1) % P))


def test_ec_circuit_proves_and_verifies():
    """An EC addition synthesized by the loader proves through the host
    prover (with the lookup argument) and verifies natively."""
    from snark_verifier_tpu.loader.native import NativeLoader
    from snark_verifier_tpu.pcs.kzg import KzgGwc
    from snark_verifier_tpu.system.halo2.prover import create_proof
    from snark_verifier_tpu.system.halo2.srs import gen_srs
    from snark_verifier_tpu.system.halo2.transcript import NativeEvmTranscript
    from snark_verifier_tpu.verifier.plonk import PlonkVerifier

    builder = CircuitBuilder(range_bits=10)
    loader = Halo2Loader(ecc_chip=EccChip(), builder=builder)
    ctx = loader.ctx
    chip = loader.ecc_chip
    g = bn.G1_GEN
    p1 = loader.assign_ec_point(g)
    p2 = loader.assign_ec_point(bn.g1_mul(g, 2))
    out = chip.add(ctx, p1.value, p2.value)
    xr, yr = chip.coords_reduced_native(ctx, out)
    from snark_verifier_tpu.loader import Scalar

    loader.expose_scalar(Scalar(loader, xr))
    loader.expose_scalar(Scalar(loader, yr))
    assert builder.check_witness() == []

    srs = gen_srs(builder.k())
    protocol, pk = builder.build(srs, name="ecc-add")
    instances = [builder.instance_values()]
    want = bn.g1_mul(g, 3)
    assert instances[0] == [want[0] % bn.R, want[1] % bn.R]

    proof_bytes = create_proof(pk, instances, "gwc")
    nat = NativeLoader()
    verifier = PlonkVerifier(KzgGwc)
    dk = srs.decider_key()
    loaded = protocol.loaded(nat)
    ins = [[nat.load_const(v) for v in col] for col in instances]
    proof = verifier.read_proof(dk, loaded, ins, NativeEvmTranscript(proof_bytes, nat))
    assert verifier.verify(dk, loaded, ins, proof) is True
