"""Batched Poseidon permutation for TPU (JAX).

Device counterpart of util/poseidon.py (same spec object, same raw round
sequence): state is (..., T, 16) Montgomery Fr limbs; the 68 rounds run as
`lax.scan` over stacked round-constant tensors, with the full/partial sbox
handled branchlessly by a per-round mask.  The MDS multiply is a T x T
constant-coefficient linear combination (t^2 mont_muls, batched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops.limbs import NLIMB, int_to_limbs

FR = F.FR


_TENSOR_CACHE: dict = {}


def _spec_tensors(spec):
    """Stacked device constants for a spec (cached per spec object)."""
    key = id(spec)
    if key not in _TENSOR_CACHE:
        enc = lambda v: int_to_limbs(FR.to_mont_int(v))
        rc = np.array(
            [[enc(c) for c in row] for row in spec.round_constants], np.uint32
        )  # (rounds, t, 16)
        mds = np.array(
            [[enc(c) for c in row] for row in spec.mds], np.uint32
        )  # (t, t, 16)
        half = spec.r_f // 2
        rounds = spec.r_f + spec.r_p
        full_mask = np.array(
            [(r < half or r >= half + spec.r_p) for r in range(rounds)], np.bool_
        )
        _TENSOR_CACHE[key] = (
            spec,  # keep the spec alive so id() stays unique
            jnp.asarray(rc),
            jnp.asarray(mds),
            jnp.asarray(full_mask),
        )
    return _TENSOR_CACHE[key][1:]


def permutation(spec, state, inputs):
    """state: (..., t, 16) Montgomery; inputs: list of (..., 16) Montgomery
    scalars (len < t).  Returns the new state."""
    rc, mds, full_mask = _spec_tensors(spec)
    t = spec.t
    batch = state.shape[:-2]

    # absorb + round-0 ARK + padding (util/poseidon.py permutation)
    one = F.ones(batch, FR)
    parts = []
    for i in range(t):
        word = F.add(state[..., i, :], jnp.broadcast_to(rc[0, i], state[..., i, :].shape), FR)
        if 1 <= i < 1 + len(inputs):
            word = F.add(word, inputs[i - 1], FR)
        if i == 1 + len(inputs):
            word = F.add(word, one, FR)
        parts.append(word)
    st = jnp.stack(parts, axis=-2)

    def round_step(st, xs):
        next_rc, is_full, is_last = xs
        # sbox
        s2 = F.mont_mul(st, st, FR)
        s4 = F.mont_mul(s2, s2, FR)
        s5 = F.mont_mul(s4, st, FR)
        word0 = s5[..., :1, :]
        rest = jnp.where(is_full, s5[..., 1:, :], st[..., 1:, :])
        st = jnp.concatenate([word0, rest], axis=-2)
        # mds: out_i = sum_j mds[i][j] * st_j
        prod = F.mont_mul(st[..., None, :, :], jnp.broadcast_to(mds, st.shape[:-2] + mds.shape), FR)
        acc = prod[..., 0, :]
        for j in range(1, t):
            acc = F.add(acc, prod[..., j, :], FR)
        st = acc
        # next ARK (skipped after the final round)
        with_ark = F.add(st, jnp.broadcast_to(next_rc, st.shape), FR)
        st = jnp.where(is_last, st, with_ark)
        return st, None

    rounds = rc.shape[0]
    # next-round constants aligned with each round; dummy zeros for the last
    next_rcs = jnp.concatenate([rc[1:], jnp.zeros_like(rc[:1])], axis=0)
    is_last = jnp.arange(rounds) == rounds - 1
    st, _ = jax.lax.scan(round_step, st, (next_rcs, full_mask, is_last))
    return st


class JaxPoseidonSponge:
    """Buffered sponge over traced scalars (same semantics as the oracle)."""

    def __init__(self, spec, batch_shape=()):
        self.spec = spec
        self.batch_shape = tuple(batch_shape)
        self.state = jnp.broadcast_to(
            F.zeros(()), self.batch_shape + (spec.t, NLIMB)
        )
        self.buf = []  # list of (..., 16) Montgomery arrays

    def update(self, elements):
        self.buf.extend(elements)

    def squeeze(self):
        buf, self.buf = self.buf, []
        exact = len(buf) % self.spec.rate == 0
        for off in range(0, len(buf), self.spec.rate):
            self.state = permutation(self.spec, self.state, buf[off : off + self.spec.rate])
        if exact:
            self.state = permutation(self.spec, self.state, [])
        return self.state[..., 1, :]
