"""Batched Poseidon permutation for TPU (JAX).

Device counterpart of util/poseidon.py: state is (..., T, 16) Montgomery Fr
limbs.  Two evaluation forms, bit-identical (tests/test_poseidon.py):

* `permutation_raw` — the 68 rounds as one `lax.scan` over stacked
  round-constant tensors, full/partial sbox handled branchlessly by a
  per-round mask, dense T x T MDS each round (t^2 + 3t mont_muls/round).
* `permutation` (default) — the reference's optimized sparse form
  (util/hash/poseidon.rs:35-110 via util/poseidon_opt.py): partial rounds
  sbox only word 0 and apply a sparse matrix (3 + t + (t-1) = 12 muls vs
  40 for t=5), with one dense pre-sparse MDS at the full/partial boundary
  — ~2.6x fewer mont_muls per permutation, the device transcript win.
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
    """Stacked device constants for a spec (cached per spec object).

    The cache holds NUMPY arrays and converts per call: caching jnp arrays
    would capture constant tracers when first touched inside a jit trace and
    leak them into later traces (UnexpectedTracerError, round-4 find)."""
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
        _TENSOR_CACHE[key] = (spec, rc, mds, full_mask)
    _, rc, mds, full_mask = _TENSOR_CACHE[key]
    return jnp.asarray(rc), jnp.asarray(mds), jnp.asarray(full_mask)


def permutation_raw(spec, state, inputs):
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


# ---------------------------------------------------------------------------
# Optimized sparse form (reference poseidon.rs:171-202 schedule, constants
# and matrices from util/poseidon_opt.optimize_spec).
# ---------------------------------------------------------------------------

_OPT_TENSOR_CACHE: dict = {}


def _opt_tensors(spec):
    key = id(spec)
    if key not in _OPT_TENSOR_CACHE:
        from snark_verifier_tpu.util.poseidon_opt import optimize_spec

        opt = optimize_spec(spec)
        enc = lambda v: int_to_limbs(FR.to_mont_int(v))
        t = opt.t
        half = opt.r_f // 2
        c_start = np.array([[enc(c) for c in row] for row in opt.constants_start], np.uint32)
        c_partial = np.array([enc(c) for c in opt.constants_partial], np.uint32)
        # constants_end has half-1 rows; pad a zero row for the final
        # (constant-free) full round so one scan covers all `half` rounds
        c_end = np.array(
            [[enc(c) for c in row] for row in opt.constants_end]
            + [[enc(0)] * t],
            np.uint32,
        )
        mds = np.array([[enc(c) for c in row] for row in opt.mds], np.uint32)
        pre_sparse = np.array(
            [[enc(c) for c in row] for row in opt.pre_sparse_mds], np.uint32
        )
        sp_row = np.array([[enc(c) for c in row] for row, _ in opt.sparse], np.uint32)
        sp_col = np.array([[enc(c) for c in col] for _, col in opt.sparse], np.uint32)
        # cache NUMPY only (see _spec_tensors: jnp constants leak tracers)
        _OPT_TENSOR_CACHE[key] = (
            opt,  # keep alive for id() stability
            c_start, c_partial, c_end, mds, pre_sparse, sp_row, sp_col, half,
        )
    _, c_start, c_partial, c_end, mds, pre_sparse, sp_row, sp_col, half = (
        _OPT_TENSOR_CACHE[key]
    )
    return (
        jnp.asarray(c_start), jnp.asarray(c_partial), jnp.asarray(c_end),
        jnp.asarray(mds), jnp.asarray(pre_sparse),
        jnp.asarray(sp_row), jnp.asarray(sp_col), half,
    )


def _sbox_full(st):
    s2 = F.mont_mul(st, st, FR)
    s4 = F.mont_mul(s2, s2, FR)
    return F.mont_mul(s4, st, FR)


def _mds_apply(mat_row_major, st):
    """out_i = sum_j mat[i][j] * st_j; mat (t, t, 16), st (..., t, 16)."""
    t = st.shape[-2]
    prod = F.mont_mul(
        st[..., None, :, :], jnp.broadcast_to(mat_row_major, st.shape[:-2] + mat_row_major.shape), FR
    )
    acc = prod[..., 0, :]
    for j in range(1, t):
        acc = F.add(acc, prod[..., j, :], FR)
    return acc


def permutation(spec, state, inputs):
    """Optimized sparse-form permutation, bit-identical to `permutation_raw`.

    state: (..., t, 16) Montgomery; inputs: list of (..., 16) Montgomery
    scalars (len < t).  Partial rounds run as a 12-mul scan body (t=5)
    instead of the raw form's 40."""
    c_start, c_partial, c_end, mds, pre_sparse, sp_row, sp_col, half = _opt_tensors(spec)
    t = spec.t

    # absorb with constants_start[0] + padding (absorb_with_pre_constants)
    one = F.ones(state.shape[:-2], FR)
    parts = []
    for i in range(t):
        word = F.add(state[..., i, :], jnp.broadcast_to(c_start[0, i], state[..., i, :].shape), FR)
        if 1 <= i < 1 + len(inputs):
            word = F.add(word, inputs[i - 1], FR)
        if i == 1 + len(inputs):
            word = F.add(word, one, FR)
        parts.append(word)
    st = jnp.stack(parts, axis=-2)

    def full_round(st, consts, mat):
        sb = _sbox_full(st)
        sb = F.add(sb, jnp.broadcast_to(consts, sb.shape), FR)
        return _mds_apply(mat, sb)

    # start full rounds (dense MDS), then the boundary round (pre-sparse MDS)
    def start_step(st, consts):
        return full_round(st, consts, mds), None

    if half > 1:
        st, _ = jax.lax.scan(start_step, st, c_start[1:half])
    st = full_round(st, c_start[half], pre_sparse)

    # partial rounds: sbox word 0, add the post-sbox constant, sparse matrix
    def partial_step(st, xs):
        const, row, col_hat = xs
        s0 = _sbox_full(st[..., 0, :])
        s0 = F.add(s0, jnp.broadcast_to(const, s0.shape), FR)
        # new word 0 = row . (s0, st_1..st_{t-1})
        full = jnp.concatenate([s0[..., None, :], st[..., 1:, :]], axis=-2)
        w0 = _mds_apply(row[None], full)[..., 0, :]
        # words 1.. = col_hat_j * s0 + st_{j+1}
        scaled = F.mont_mul(jnp.broadcast_to(col_hat, st.shape[:-2] + col_hat.shape), s0[..., None, :], FR)
        rest = F.add(scaled, st[..., 1:, :], FR)
        return jnp.concatenate([w0[..., None, :], rest], axis=-2), None

    st, _ = jax.lax.scan(partial_step, st, (c_partial, sp_row, sp_col))

    # end full rounds: half-1 with constants + 1 constant-free (padded row)
    def end_step(st, consts):
        return full_round(st, consts, mds), None

    st, _ = jax.lax.scan(end_step, st, c_end)
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
