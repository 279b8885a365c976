"""Batched Keccak-256 for TPU (JAX).

Device-side Fiat–Shamir hashing for the EVM (keccak) transcript
(/root/reference/snark-verifier/src/system/halo2/transcript/evm.rs:184-198).
A 64-bit lane is a pair of uint32s: state has shape (..., 25, 2) with
[..., 0] = low word, [..., 1] = high word.  The 24 rounds run under
`lax.scan`; rho's per-lane rotations use constant shift vectors, so the whole
permutation is straight-line vector code, batched over arbitrary leading
dims.  Message lengths are static at trace time (the transcript's structure
is fixed by the protocol), so padding is a constant-tail concat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.util.keccak import _RHO, _ROUND_CONSTANTS

RATE = 136  # bytes


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


# Constant tables ------------------------------------------------------------
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS], np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _ROUND_CONSTANTS], np.uint32)

# pi permutation: dst[y + 5*((2x+3y)%5)] = src[x + 5y]  =>  dst[i] = src[PI_SRC[i]]
_PI_SRC = np.zeros(25, np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y

_RHO_ARR = np.array(_RHO, np.int32)[_PI_SRC]  # rotation applied at gather time
_RHO_S = np.uint32(_RHO_ARR % 32)
_RHO_SWAP = (_RHO_ARR % 64) >= 32

# chi: a[i] = b[i] ^ (~b[chi1[i]] & b[chi2[i]])
_CHI1 = np.array([(i % 5 + 1) % 5 + 5 * (i // 5) for i in range(25)], np.int32)
_CHI2 = np.array([(i % 5 + 2) % 5 + 5 * (i // 5) for i in range(25)], np.int32)

# theta neighbor indices
_TH_M1 = np.array([(x - 1) % 5 for x in range(5)], np.int32)
_TH_P1 = np.array([(x + 1) % 5 for x in range(5)], np.int32)


def _rotl_pair(lo, hi, s, swap):
    """Rotate-left 64-bit (lo, hi) pairs by per-lane constants."""
    s = _u32(s)
    # (x >> (32 - s)) computed as ((x >> (31 - s)) >> 1) to stay defined at s=0
    nlo = (lo << s) | ((hi >> (31 - s)) >> 1)
    nhi = (hi << s) | ((lo >> (31 - s)) >> 1)
    lo2 = jnp.where(swap, nhi, nlo)
    hi2 = jnp.where(swap, nlo, nhi)
    return lo2, hi2


def _round(state, rc):
    """One keccak-f round; state (..., 25, 2)."""
    lo, hi = state[..., 0], state[..., 1]
    # theta
    lo5 = lo.reshape(*lo.shape[:-1], 5, 5)
    hi5 = hi.reshape(*hi.shape[:-1], 5, 5)
    c_lo = _xor5(lo5)
    c_hi = _xor5(hi5)
    # d[x] = c[x-1] ^ rotl(c[x+1], 1)
    r_lo = (c_lo[..., _TH_P1] << 1) | (c_hi[..., _TH_P1] >> 31)
    r_hi = (c_hi[..., _TH_P1] << 1) | (c_lo[..., _TH_P1] >> 31)
    d_lo = c_lo[..., _TH_M1] ^ r_lo
    d_hi = c_hi[..., _TH_M1] ^ r_hi
    lo = lo ^ jnp.tile(d_lo, (1,) * (lo.ndim - 1) + (5,))
    hi = hi ^ jnp.tile(d_hi, (1,) * (hi.ndim - 1) + (5,))
    # rho + pi (fused: gather with pre-permuted rotation constants)
    g_lo = lo[..., _PI_SRC]
    g_hi = hi[..., _PI_SRC]
    b_lo, b_hi = _rotl_pair(g_lo, g_hi, _RHO_S, _RHO_SWAP)
    # chi
    lo = b_lo ^ (~b_lo[..., _CHI1] & b_lo[..., _CHI2])
    hi = b_hi ^ (~b_hi[..., _CHI1] & b_hi[..., _CHI2])
    # iota
    lo = jnp.concatenate([lo[..., :1] ^ rc[0], lo[..., 1:]], axis=-1)
    hi = jnp.concatenate([hi[..., :1] ^ rc[1], hi[..., 1:]], axis=-1)
    return jnp.stack([lo, hi], axis=-1)


def _xor5(x5):
    """XOR-reduce (..., 5, 5) over the row (y) axis -> (..., 5)."""
    return x5[..., 0, :] ^ x5[..., 1, :] ^ x5[..., 2, :] ^ x5[..., 3, :] ^ x5[..., 4, :]


@jax.jit
def keccak_f(state):
    """keccak-f[1600]; state (..., 25, 2) uint32."""

    def step(s, rc):
        return _round(s, rc), None

    rcs = jnp.stack([_u32(_RC_LO), _u32(_RC_HI)], axis=-1)  # (24, 2)
    out, _ = jax.lax.scan(lambda s, rc: (_round(s, (rc[0], rc[1])), None), state, rcs)
    return out


def _bytes_to_lanes(block):
    """(..., 136) uint32 byte values -> (..., 17, 2) lanes (LE)."""
    b = block.reshape(*block.shape[:-1], RATE // 8, 8)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    return jnp.stack([lo, hi], axis=-1)


@functools.partial(jax.jit, static_argnums=1)
def keccak256(data, length: int):
    """Keccak-256 of (..., length) byte arrays (uint32 entries in 0..255).

    `length` is static; returns (..., 32) uint32 digest bytes.
    """
    batch_shape = data.shape[:-1]
    pad_len = RATE - (length % RATE)
    pad = np.zeros(pad_len, np.uint32)
    pad[0] |= 0x01
    pad[-1] |= 0x80
    padded = jnp.concatenate(
        [jnp.asarray(data, jnp.uint32), jnp.broadcast_to(jnp.asarray(pad), batch_shape + (pad_len,))],
        axis=-1,
    )
    nblocks = padded.shape[-1] // RATE
    state = jnp.zeros(batch_shape + (25, 2), jnp.uint32)
    for blk in range(nblocks):  # statically unrolled; usually 1-3 blocks
        lanes = _bytes_to_lanes(padded[..., blk * RATE : (blk + 1) * RATE])
        state = jnp.concatenate(
            [state[..., : RATE // 8, :] ^ lanes, state[..., RATE // 8 :, :]], axis=-2
        )
        state = keccak_f(state)
    out_lanes = state[..., :4, :]  # 4 lanes = 32 bytes
    shifts = _u32(np.array([0, 8, 16, 24], np.uint32))
    lo_bytes = (out_lanes[..., 0:1] >> shifts) & 0xFF  # (..., 4, 4)
    hi_bytes = (out_lanes[..., 1:2] >> shifts) & 0xFF
    by = jnp.concatenate([lo_bytes, hi_bytes], axis=-1)  # (..., 4, 8)
    return by.reshape(*batch_shape, 32)
