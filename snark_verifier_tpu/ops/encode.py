"""Byte <-> limb encodings and u256 modular reduction (device-side).

Wire-format helpers for the transcript: the proof stream is big-endian
32-byte words (system/halo2/transcript/evm.rs), device representation is
16x16-bit little-endian limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops.limbs import NLIMB

# byte index (BE, 32 bytes) feeding limb j: lo byte at 31-2j, hi at 30-2j
_IDX_LO = np.array([31 - 2 * j for j in range(NLIMB)], np.int32)
_IDX_HI = np.array([30 - 2 * j for j in range(NLIMB)], np.int32)


def be_bytes_to_limbs(data):
    """(..., 32) BE byte values (uint32) -> (..., 16) canonical limbs."""
    return (data[..., _IDX_LO] | (data[..., _IDX_HI] << 8)).astype(jnp.uint32)


def limbs_to_be_bytes(limbs):
    """(..., 16) canonical limbs -> (..., 32) BE byte values."""
    lo = limbs & 0xFF
    hi = (limbs >> 8) & 0xFF
    le = jnp.stack([lo, hi], axis=-1).reshape(*limbs.shape[:-1], 2 * NLIMB)
    return le[..., ::-1]


@functools.partial(jax.jit, static_argnums=1)
def reduce_u256(limbs, spec):
    """Reduce a full 256-bit value into [0, p) by repeated conditional
    subtraction (2^256 / p < 6 for both BN254 moduli)."""
    x = limbs
    for _ in range(5):
        x = F._cond_sub_mod(x, spec)
    return x


def le_bytes_to_limbs(data):
    """(..., 32) LE byte values -> (..., 16) canonical limbs."""
    b = data.reshape(*data.shape[:-1], NLIMB, 2)
    return (b[..., 0] | (b[..., 1] << 8)).astype(jnp.uint32)


def limbs_to_le_bytes(limbs):
    lo = limbs & 0xFF
    hi = (limbs >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(*limbs.shape[:-1], 2 * NLIMB)


def is_lt_modulus(limbs, spec):
    """Boolean (...,): value < modulus (canonical encoding check)."""
    _, borrow = F._sub_limbs(limbs, jnp.broadcast_to(jnp.asarray(spec.mod_limbs), limbs.shape))
    return borrow > 0
