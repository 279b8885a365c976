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
