"""KZG structured reference string (test-grade, deterministic).

Role of halo2's ParamsKZG + the SDK's gen_srs/PARAMS_DIR cache
(snark-verifier-sdk/src/halo2.rs:78-110).  The trusted-setup secret is
derived from a fixed seed — fine for test vectors and benchmarks, obviously
not for production; a production deployment imports a ceremony SRS.

Two storage forms:
- `g`: affine int pairs (the original, python-oracle-friendly form), used by
  small circuits and the decider (g[0], g[1]);
- `g_mont`: an (n,8) u64 numpy array of Montgomery affine points for the
  threaded native MSM (native/bn254_native.cpp bn254_msm2) — the form the
  at-scale prover commits against.  Large k (>= _NATIVE_K) generates ONLY
  this form natively (bn254_srs_gen) plus a 2-point `g` head, because 2^21
  python int pairs are too slow/large to materialize.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field

from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256

_CACHE_DIR = os.environ.get(
    "PARAMS_DIR", os.path.join(os.path.dirname(__file__), "../../../testdata/cache")
)

# k at or above which gen_srs uses the native fixed-base generator and keeps
# only the Montgomery-form table (+ a 2-point python head for deciding keys)
_NATIVE_K = 16


@dataclass
class Srs:
    k: int
    g: list  # [tau^i * G1] affine int pairs; may be a short head (see g_mont)
    g2: tuple
    s_g2: tuple
    g_mont: object = None  # (n,8) u64 Montgomery affine array (or None)

    @property
    def n(self) -> int:
        gm = getattr(self, "g_mont", None)
        return gm.shape[0] if gm is not None else len(self.g)

    def commit(self, coeffs) -> tuple:
        """Commit a coefficient-form polynomial (affine int pair or None).

        Accepts a python int list or an FrVec (the fast-prover path); FrVec
        commits require g_mont."""
        from snark_verifier_tpu.util.frvec import FrVec

        if isinstance(coeffs, FrVec):
            return self.commit_vec(coeffs)
        assert len(coeffs) <= self.n
        gm = getattr(self, "g_mont", None)
        if gm is not None and len(coeffs) > 64:
            return self.commit_vec(FrVec.from_ints(coeffs))
        assert len(coeffs) <= len(self.g)
        return bn254.fast_msm(coeffs, self.g[: len(coeffs)])

    def commit_vec(self, coeffs) -> tuple:
        from snark_verifier_tpu.util import native_ec

        gm = getattr(self, "g_mont", None)
        if gm is None:
            from snark_verifier_tpu.util import native_ec as ne

            gm = self.g_mont = ne.g1_to_mont(self.g)
        assert len(coeffs) <= gm.shape[0]
        return native_ec.msm2(coeffs.to_canonical_u64(), gm)

    def decider_key(self):
        from snark_verifier_tpu.pcs.kzg.decider import KzgDecidingKey

        return KzgDecidingKey(svk=self.g[0], g2=self.g2, s_g2=self.s_g2)


def _srs_tau() -> int:
    return int.from_bytes(keccak256(b"svtpu-test-srs"), "big") % bn254.R


def gen_srs(k: int, use_cache: bool = True) -> Srs:
    path = os.path.join(_CACHE_DIR, f"srs_{k}.pkl")
    if use_cache and os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    tau = _srs_tau()
    n = 1 << k

    from snark_verifier_tpu.util import native_ec

    if k >= _NATIVE_K and native_ec.lib_v2() is not None:
        g_mont = native_ec.srs_gen_mont(tau, n)
        head = native_ec.g1_from_mont(g_mont[:2])
        srs = Srs(
            k=k,
            g=head,
            g2=bn254.G2_GEN,
            s_g2=bn254.g2_mul(bn254.G2_GEN, tau),
            g_mont=g_mont,
        )
    else:
        g = []
        acc = 1
        for _ in range(n):
            g.append(bn254.g1_mul(bn254.G1_GEN, acc))
            acc = acc * tau % bn254.R
        srs = Srs(k=k, g=g, g2=bn254.G2_GEN, s_g2=bn254.g2_mul(bn254.G2_GEN, tau))

    if use_cache:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        _atomic_pickle(path, srs)
    return srs


def _atomic_pickle(path: str, obj):
    """Write-then-rename so concurrent readers (xdist workers) never see a
    partial file."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, path)


def commit_lagrange(srs: Srs, values, domain) -> tuple:
    """Commit evaluation-form values: iNTT + MSM, on the fast native path
    when available (FrVec + bn254_msm2), else the python-int oracle path."""
    from snark_verifier_tpu.util import frvec

    if (
        frvec.available()
        and getattr(srs, "g_mont", None) is not None
        and len(values) > 64
        and os.environ.get("SVTPU_NATIVE", "1") != "0"
    ):
        v = values if isinstance(values, frvec.FrVec) else frvec.FrVec.from_ints(values)
        coeffs = v.ntt(bn254.inv_mod(domain.gen, bn254.R), bn254.inv_mod(domain.n, bn254.R))
        return srs.commit_vec(coeffs)
    from snark_verifier_tpu.util.poly import lagrange_to_coeffs

    return srs.commit(lagrange_to_coeffs(values, domain))
