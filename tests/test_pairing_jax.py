"""Device pairing (Miller loop + final exp) vs the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from snark_verifier_tpu.ops import curve as C
from snark_verifier_tpu.ops import pairing as PAIR
from snark_verifier_tpu.util import bn254 as bn


def test_final_exp_chain_oracle():
    ml = bn.miller_loop(bn.g1_mul(bn.G1_GEN, 3), bn.g2_mul(bn.G2_GEN, 4))
    assert bn.final_exponentiation_chain(ml) == bn.final_exponentiation(ml)


def test_final_exp_tape_vm_vs_oracle():
    """The tape-VM final exponentiation (ops/pairing._final_exp_chain_stage)
    must be bit-exact vs the oracle chain on a batch."""
    import jax.numpy as jnp

    from snark_verifier_tpu.ops import field as F
    from snark_verifier_tpu.ops.limbs import int_to_limbs, limbs_to_int

    mls = [
        bn.miller_loop(bn.g1_mul(bn.G1_GEN, 3), bn.g2_mul(bn.G2_GEN, 4)),
        bn.miller_loop(bn.g1_mul(bn.G1_GEN, 9), bn.g2_mul(bn.G2_GEN, 2)),
    ]

    def enc_comp(c):
        return jnp.asarray(
            [int_to_limbs(F.FQ.to_mont_int(m)) for m in c], jnp.uint32
        )

    f = tuple(
        tuple(
            (enc_comp([m[l][j][0] for m in mls]), enc_comp([m[l][j][1] for m in mls]))
            for j in range(3)
        )
        for l in range(2)
    )
    out = PAIR._final_exp_chain_stage(f)
    for i, ml in enumerate(mls):
        got = tuple(
            tuple(
                tuple(
                    F.FQ.from_mont_int(limbs_to_int(np.asarray(c)[i])) for c in c2
                )
                for c2 in c6
            )
            for c6 in out
        )
        assert got == bn.final_exponentiation_chain(ml)


def test_kzg_pairing_check_batched():
    s = 987654321  # plays the role of the SRS secret
    g2 = bn.G2_GEN
    s_g2 = bn.g2_mul(g2, s)

    # valid pairs: (s*P, P); invalid: (s*P, Q != P), plus identity pair
    p1 = bn.g1_mul(bn.G1_GEN, 42)
    p2 = bn.g1_mul(bn.G1_GEN, 77)
    lhs_pts = [bn.g1_mul(p1, s), bn.g1_mul(p2, s), bn.g1_mul(p2, s), None]
    rhs_pts = [p1, p2, p1, None]
    expected = [True, True, False, True]

    lhs = C.g1_from_affine_ints(lhs_pts)
    rhs = C.g1_from_affine_ints(rhs_pts)
    ok = np.asarray(PAIR.kzg_pairing_check(lhs, rhs, g2, s_g2))
    assert ok.tolist() == expected
