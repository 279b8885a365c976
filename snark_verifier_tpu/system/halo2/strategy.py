"""Verifier strategies (parity: system/halo2/strategy.rs).

The reference wraps halo2's `VerificationStrategy` for the IPA scheme:
`SingleStrategy` verifies one proof, decides immediately, and returns the
synthetic commitment `g = commit(G, h(xi))` on success (strategy.rs:24-57).
Here the same contract sits over our IPA accumulator type.
"""

from __future__ import annotations

from snark_verifier_tpu.errors import AssertionFailure
from snark_verifier_tpu.pcs.ipa import IpaDecidingKey, h_coeffs


class IpaSingleStrategy:
    """Verify-and-decide-immediately for a single IPA proof.

    `process(f)` runs `f()` (which performs the succinct verification and
    returns an `IpaAccumulator`), computes g = commit(G, h(xi)), checks the
    accumulator's U against it (the decide), and returns g — mirroring
    GuardIPA::compute_g + use_g + msm.check()."""

    def __init__(self, dk: IpaDecidingKey):
        self.dk = dk

    def process(self, f):
        accumulator = f()
        crv = self.dk.svk.curve
        h = h_coeffs([x.value for x in accumulator.xi], 1, crv.R)
        g = crv.fast_msm(h, self.dk.g)
        if accumulator.u.value != g:
            raise AssertionFailure("U == commit(G, h) (IPA SingleStrategy)")
        return g

    def finalize(self) -> bool:
        raise RuntimeError("SingleStrategy decides in process()")
