"""Runtime configuration knobs."""

from __future__ import annotations

import os

_FORCED = os.environ.get("SVTPU_PALLAS")  # "1" force on, "0" force off


def use_pallas() -> bool:
    """Whether curve ops route through the fused Pallas kernels.

    Default: on when the default JAX backend is a TPU, off on CPU (tests use
    the XLA path as the bit-exact reference; mosaic interpret mode is too
    slow).  Override with SVTPU_PALLAS=0/1.
    """
    if _FORCED is not None:
        return _FORCED == "1"
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
