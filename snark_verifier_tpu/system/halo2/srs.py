"""KZG structured reference string (test-grade, deterministic).

Role of halo2's ParamsKZG + the SDK's gen_srs/PARAMS_DIR cache
(snark-verifier-sdk/src/halo2.rs:78-110).  The trusted-setup secret is
derived from a fixed seed — fine for test vectors and benchmarks, obviously
not for production; a production deployment imports a ceremony SRS.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256

_CACHE_DIR = os.environ.get(
    "PARAMS_DIR", os.path.join(os.path.dirname(__file__), "../../../testdata/cache")
)


@dataclass
class Srs:
    k: int
    g: list  # [tau^i * G1] affine int pairs, len 2^k
    g2: tuple
    s_g2: tuple

    def commit(self, coeffs) -> tuple:
        """Commit a coefficient-form polynomial (affine int pair)."""
        assert len(coeffs) <= len(self.g)
        return bn254.fast_msm(coeffs, self.g[: len(coeffs)])

    def decider_key(self):
        from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey

        return KzgDecidingKey(svk=self.g[0], g2=self.g2, s_g2=self.s_g2)


def gen_srs(k: int, use_cache: bool = True) -> Srs:
    path = os.path.join(_CACHE_DIR, f"srs_{k}.pkl")
    if use_cache and os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    tau = int.from_bytes(keccak256(b"svtpu-test-srs"), "big") % bn254.R
    n = 1 << k
    g = []
    acc = 1
    base = bn254._to_jac(bn254.G1_GEN)
    for _ in range(n):
        g.append(bn254.g1_mul(bn254.G1_GEN, acc))
        acc = acc * tau % bn254.R
    srs = Srs(k=k, g=g, g2=bn254.G2_GEN, s_g2=bn254.g2_mul(bn254.G2_GEN, tau))

    if use_cache:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(srs, f)
    return srs
