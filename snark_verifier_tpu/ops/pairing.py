"""Optimal-ate pairing on TPU (JAX): Miller loop + final exponentiation.

The device kernel behind the KZG decider's
`e(lhs, g2) * e(rhs, -s_g2) == 1` check (pcs/kzg/decider.rs:70-82).  G2
inputs are trace-time constants (the deciding key), so the Miller loop runs
with *affine* G2 arithmetic where every line's slope over Fq2 is a
precomputed host constant — the loop degenerates to evaluating constant
lines at the batched G1 points (2 Fq muls per line) and Fq12 accumulation.
The final exponentiation uses the Scott et al. addition chain
(util/bn254.py final_exponentiation_chain), ~300 Fq12 ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from snark_verifier_tpu.ops import curve as CRV
from snark_verifier_tpu.ops import field as F
from snark_verifier_tpu.ops import tower as T
from snark_verifier_tpu.util import bn254

FQ = F.FQ


@functools.lru_cache(maxsize=8)
def _line_constants(q_key):
    """Host-side: run the oracle Miller loop on constant Q, recording each
    line's (lambda, c3 = lambda*x_q - y_q) in Fq2, plus the step kind.

    Returns a list of ("dbl" | "add", lam, c3).
    """
    q = _key_to_g2(q_key)
    lines = []
    t = q
    for i in range(len(bn254.ATE_NAF) - 2, -1, -1):
        lam = bn254.fq2_mul(
            bn254.fq2_scalar(bn254.fq2_sqr(t[0]), 3),
            bn254.fq2_inv(bn254.fq2_scalar(t[1], 2)),
        )
        c3 = bn254.fq2_sub(bn254.fq2_mul(lam, t[0]), t[1])
        lines.append(("dbl", lam, c3))
        x3 = bn254.fq2_sub(bn254.fq2_sqr(lam), bn254.fq2_scalar(t[0], 2))
        y3 = bn254.fq2_sub(bn254.fq2_mul(lam, bn254.fq2_sub(t[0], x3)), t[1])
        t = (x3, y3)
        naf = bn254.ATE_NAF[i]
        if naf:
            qq = q if naf == 1 else bn254.g2_neg(q)
            lam = bn254.fq2_mul(
                bn254.fq2_sub(t[1], qq[1]), bn254.fq2_inv(bn254.fq2_sub(t[0], qq[0]))
            )
            c3 = bn254.fq2_sub(bn254.fq2_mul(lam, qq[0]), qq[1])
            lines.append(("add", lam, c3))
            x3 = bn254.fq2_sub(bn254.fq2_sqr(lam), bn254.fq2_add(qq[0], t[0]))
            y3 = bn254.fq2_sub(bn254.fq2_mul(lam, bn254.fq2_sub(qq[0], x3)), qq[1])
            t = (x3, y3)
    for qq in (bn254._g2_frobenius(q), bn254.g2_neg(bn254._g2_frobenius(bn254._g2_frobenius(q)))):
        lam = bn254.fq2_mul(
            bn254.fq2_sub(t[1], qq[1]), bn254.fq2_inv(bn254.fq2_sub(t[0], qq[0]))
        )
        c3 = bn254.fq2_sub(bn254.fq2_mul(lam, qq[0]), qq[1])
        lines.append(("add", lam, c3))
        x3 = bn254.fq2_sub(bn254.fq2_sqr(lam), bn254.fq2_add(qq[0], t[0]))
        y3 = bn254.fq2_sub(bn254.fq2_mul(lam, bn254.fq2_sub(qq[0], x3)), qq[1])
        t = (x3, y3)
    return lines


def _key_to_g2(q_key):
    (x0, x1), (y0, y1) = q_key
    return ((x0, x1), (y0, y1))


def _g2_key(q):
    return ((q[0][0], q[0][1]), (q[1][0], q[1][1]))


def miller_loop_const_q(px, py, q) -> tuple:
    """Miller loop for batched affine G1 (px, py Montgomery (..., 16)) against
    a constant G2 point q ((x0,x1),(y0,y1) int tuples).  Returns Fq12 batch.

    Line evaluation at P: l = py - lam*px*w + (lam*x_t - y_t)*w^3, embedded
    sparsely as ((py, 0, 0), (-lam*px, c3, 0)) in Fq12 (same embedding as the
    oracle's _line_double/_line_add).  The loop runs as `lax.scan` over the
    precomputed per-step (is_dbl, lam, c3) constant tensors so the Fq12
    square/multiply graph is compiled once, not 89 times.
    """
    shape = px.shape[:-1]
    lines = _line_constants(_g2_key(q))

    import numpy as np

    from snark_verifier_tpu.ops.limbs import int_to_limbs

    def enc(v):  # int -> Montgomery Fq limbs
        return int_to_limbs(FQ.to_mont_int(v))

    is_dbl = jnp.asarray(
        np.array([k == "dbl" for k, _, _ in lines], np.bool_)
    )
    lam_arr = jnp.asarray(
        np.array([[enc(lam[0]), enc(lam[1])] for _, lam, _ in lines], np.uint32)
    )  # (n, 2, 16)
    c3_arr = jnp.asarray(
        np.array([[enc(c3[0]), enc(c3[1])] for _, _, c3 in lines], np.uint32)
    )

    f0 = T.fq12_ones(shape)
    zero2 = T.fq2_zeros(shape)
    neg_px = F.neg(px, FQ)

    def step(f, xs):
        dbl, lam, c3 = xs
        f = T.fq12_select(dbl, T.fq12_sqr(f), f)
        c0 = (py, F.zeros(shape))
        lam_px = (T.fq_mul(lam[0], neg_px), T.fq_mul(lam[1], neg_px))
        c3_b = (
            jnp.broadcast_to(c3[0], py.shape),
            jnp.broadcast_to(c3[1], py.shape),
        )
        l = ((c0, zero2, zero2), (lam_px, c3_b, zero2))
        return T.fq12_mul(f, l), None

    f, _ = jax.lax.scan(step, f0, (is_dbl, lam_arr, c3_arr))
    return f


_POW_CHUNK = 1000  # max scan trip count per dispatch: longer sqr/mul scans
                   # (>= ~2048 steps) kill the TPU worker ("kernel fault" —
                   # measured: 1024 ok, 2048 crashes), so the exponent is
                   # staged as a host loop over equal-size jitted chunks.


@jax.jit
def _pow_chunk_stage(acc, a, bits):
    """acc <- acc^(2^len(bits)) * a^int(bits) (MSB-first square-and-multiply
    over one chunk of exponent bits)."""

    def step(acc, bit):
        acc = T.fq12_sqr(acc)
        with_mul = T.fq12_mul(acc, a)
        return T.fq12_select(bit.astype(bool), with_mul, acc), None

    out, _ = jax.lax.scan(step, acc, bits)
    return out


def _fq12_pow_scan(a, exponent: int):
    """a^e by square-and-multiply lax.scan, staged in <= _POW_CHUNK-step
    dispatches (one compiled chunk body reused for all chunks).  The Scott
    addition chain, while ~6x cheaper at runtime, unrolls ~25 Fq12 ops
    inline and blows up compile time.  Do NOT wrap in an outer jit — that
    re-fuses the chunks into one giant scan and re-triggers the crash."""
    bits = bin(exponent)[2:]  # MSB-first, acc starts at one
    nchunks = -(-len(bits) // _POW_CHUNK)
    size = -(-len(bits) // nchunks)
    bits = bits.zfill(nchunks * size)  # leading zeros: acc stays one
    shape = jax.tree_util.tree_leaves(a)[0].shape[:-1]
    acc = T.fq12_ones(shape)
    for c in range(nchunks):
        chunk = jnp.asarray(
            [int(b) for b in bits[c * size : (c + 1) * size]], jnp.uint32
        )
        acc = _pow_chunk_stage(acc, a, chunk)
    return acc


_FULL_EXP = (bn254.P**12 - 1) // bn254.R


def final_exponentiation(f, shape=()):
    """f^((p^12-1)/r) as a staged scanned exponentiation by the full
    ~3055-bit exponent.

    The easy-part/hard-part split (inversion, Frobenius maps, addition
    chains — see util/bn254.py final_exponentiation_chain) is ~3x cheaper at
    runtime but instantiates dozens of Fq12 ops inline, which multiplies XLA
    compile time by minutes; the scan keeps the compiled graph at one
    square-and-multiply body.  Deciding runs once per folded batch, so
    runtime here is not on the throughput path.
    """
    del shape
    return _fq12_pow_scan(f, _FULL_EXP)


@functools.partial(jax.jit, static_argnums=2)
def _miller_stage(px, py, q_key):
    return miller_loop_const_q(px, py, _key_to_g2(q_key))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _miller_stage_pair(px1, py1, px2, py2, q1_key, q2_key):
    """BOTH Miller loops of the KZG check in ONE scan at doubled batch.

    The dbl/add step sequence depends only on ATE_NAF (not on Q), so the
    two constant-line tapes align step-for-step: lanes [0, B) evaluate the
    q1 lines, lanes [B, 2B) the q2 lines.  Halves the ~91 sequential Fq12
    square/multiply steps vs two separate stages — the decide path is
    latency-bound at its tiny batch (PERF.md).  Returns (f1, f2)."""
    shape = px1.shape[:-1]
    assert len(shape) == 1, "pair stage expects a flat batch"
    B = shape[0]
    lines1 = _line_constants(q1_key)
    lines2 = _line_constants(q2_key)
    assert len(lines1) == len(lines2)
    assert [k for k, _, _ in lines1] == [k for k, _, _ in lines2]

    import numpy as np

    from snark_verifier_tpu.ops.limbs import int_to_limbs

    def enc(v):
        return int_to_limbs(FQ.to_mont_int(v))

    is_dbl = jnp.asarray(np.array([k == "dbl" for k, _, _ in lines1], np.bool_))

    def stack_consts(pick):
        # (nsteps, 2B, 2, 16): each step's constant replicated over its half
        rows = []
        for l1, l2 in zip(lines1, lines2):
            v1, v2 = pick(l1), pick(l2)
            rows.append([[enc(v1[0]), enc(v1[1])]] * B + [[enc(v2[0]), enc(v2[1])]] * B)
        return jnp.asarray(np.asarray(rows, np.uint32))

    lam_arr = stack_consts(lambda l: l[1])
    c3_arr = stack_consts(lambda l: l[2])

    px = jnp.concatenate([px1, px2], axis=0)
    py = jnp.concatenate([py1, py2], axis=0)
    shape2 = (2 * B,)
    f0 = T.fq12_ones(shape2)
    zero2 = T.fq2_zeros(shape2)
    neg_px = F.neg(px, FQ)

    def step(f, xs):
        dbl, lam, c3 = xs  # lam/c3: (2B, 2, 16)
        f = T.fq12_select(dbl, T.fq12_sqr(f), f)
        c0 = (py, F.zeros(shape2))
        lam_px = (T.fq_mul(lam[:, 0], neg_px), T.fq_mul(lam[:, 1], neg_px))
        l = ((c0, zero2, zero2), (lam_px, (c3[:, 0], c3[:, 1]), zero2))
        return T.fq12_mul(f, l), None

    f, _ = jax.lax.scan(step, f0, (is_dbl, lam_arr, c3_arr))
    f1 = jax.tree_util.tree_map(lambda x: x[:B], f)
    f2 = jax.tree_util.tree_map(lambda x: x[B:], f)
    return f1, f2


@jax.jit
def _combine_stage(f1, f2, lhs_inf, rhs_inf):
    shape = lhs_inf.shape
    one = T.fq12_ones(shape)

    def neutralize(f, inf):
        return T.fq12_select(
            inf, jax.tree.map(lambda o, x: jnp.broadcast_to(o, x.shape), one, f), f
        )

    return T.fq12_mul(neutralize(f1, lhs_inf), neutralize(f2, rhs_inf))


_BN_X_BITS = [int(b) for b in bin(bn254.BN_X)[3:]]  # MSB-first, leading 1 cut

# --- Final exponentiation as a tape VM -------------------------------------
#
# The Scott et al. addition chain (util/bn254.py final_exponentiation_chain)
# is ~300 Fq12 ops.  Inlining them into one XLA graph multiplies compile time
# past 8 minutes (each stacked fq12_mul traces ~550 eqns); a blind
# square-and-multiply scan compiles fast but runs ~6100 steps.  Best of both:
# run the chain as a lax.scan over a host-built instruction tape acting on a
# register file of flat Fq12 values — the compiled graph is ONE switch body
# (mul / conj / frobenius) regardless of chain length, and the constant
# exponent bits bake into the tape so there are no data-dependent branches.

_OP_MUL, _OP_CONJ, _OP_FROB = 0, 1, 2
_REG_ONE, _REG_INV, _REG_F0 = 0, 1, 2


@functools.lru_cache(maxsize=1)
def _hard_exp_tape():
    """Instruction tape (op, dst, src1, src2) mirroring
    util/bn254.final_exponentiation_chain.  src2 is the second register for
    MUL and the Frobenius power minus one for FROB.  Registers: 0 = Fq12 one
    (copy source), 1 = inv(f0), 2 = f0; 3..15 scratch.  Returns
    (tape int32 (N,4), output register, register count)."""
    import numpy as np

    instrs = []

    def mul(d, a, b):
        instrs.append((_OP_MUL, d, a, b))

    def conj(d, a):
        instrs.append((_OP_CONJ, d, a, 0))

    def frob(d, a, k):
        instrs.append((_OP_FROB, d, a, k - 1))

    def pow_x(d, src):  # d <- src^BN_X (d must differ from src)
        mul(d, src, _REG_ONE)
        for bit in _BN_X_BITS:
            mul(d, d, d)
            if bit:
                mul(d, d, src)

    # easy part: f = g * frob(g, 2) where g = conj(f0) * inv(f0)
    conj(3, _REG_F0)
    mul(1, 3, _REG_INV)
    frob(2, 1, 2)
    mul(1, 2, 1)  # r1 = f
    # hard part
    frob(2, 1, 1)  # fp
    frob(3, 1, 2)  # fp2
    frob(4, 3, 1)  # fp3
    mul(2, 2, 3)
    mul(2, 2, 4)  # r2 = y0 = fp*fp2*fp3
    pow_x(3, 1)  # r3 = fu
    pow_x(4, 3)  # r4 = fu2
    pow_x(5, 4)  # r5 = fu3
    frob(6, 3, 1)
    conj(6, 6)  # r6 = y3 = conj(frob(fu, 1))
    frob(7, 4, 1)  # fu2p
    frob(8, 5, 1)  # fu3p
    frob(9, 4, 2)  # r9 = y2
    conj(10, 1)  # r10 = y1 = conj(f)
    mul(11, 3, 7)
    conj(11, 11)  # r11 = y4 = conj(fu*fu2p)
    conj(12, 4)  # r12 = y5 = conj(fu2)
    mul(13, 5, 8)
    conj(13, 13)  # r13 = y6 = conj(fu3*fu3p)
    mul(14, 13, 13)
    mul(14, 14, 11)
    mul(14, 14, 12)  # t0 = y6^2 * y4 * y5
    mul(15, 6, 12)
    mul(15, 15, 14)  # t1 = y3 * y5 * t0
    mul(14, 14, 9)  # t0 *= y2
    mul(15, 15, 15)
    mul(15, 15, 14)  # t1 = t1^2 * t0
    mul(15, 15, 15)  # t1 = t1^2
    mul(14, 15, 10)  # t0 = t1 * y1
    mul(15, 15, 2)  # t1 = t1 * y0
    mul(14, 14, 14)  # t0 = t0^2
    mul(14, 14, 15)  # result
    return np.asarray(instrs, np.int32), 14, 16


@functools.lru_cache(maxsize=1)
def _frob_tables():
    """Per-power Frobenius data for the flat layout: coefficient limbs
    (2 powers, 6 fq2 slots, 2 components, 16 limbs) and the conjugation flag.
    Slot (l, j) covers flat components 2*(3l+j), 2*(3l+j)+1; its coefficient
    is FROB_FQ6_C{j}[k] * (FROB_FQ12_C1[k] if l else 1)."""
    import numpy as np

    from snark_verifier_tpu.ops.limbs import int_to_limbs

    def enc(v):
        return int_to_limbs(FQ.to_mont_int(v))

    tab = np.zeros((2, 6, 2, 16), np.uint32)
    for k in (1, 2):
        c6 = [(1, 0), bn254.FROB_FQ6_C1[k], bn254.FROB_FQ6_C2[k]]
        for l in range(2):
            for j in range(3):
                coef = c6[j]
                if l:
                    coef = bn254.fq2_mul(coef, bn254.FROB_FQ12_C1[k])
                tab[k - 1, 3 * l + j, 0] = enc(coef[0])
                tab[k - 1, 3 * l + j, 1] = enc(coef[1])
    odd = np.asarray([True, False])  # power 1 conjugates, power 2 doesn't
    # numpy on purpose: jnp constants materialized under a trace would be
    # cached as tracers and leak into later traces.
    return tab, odd


def _frob_flat(x, k_idx):
    """Frobenius^k on a flat Fq12 (12, *B, 16); k_idx = power - 1 (traced)."""
    tab, odd = _frob_tables()
    coeff = jnp.take(jnp.asarray(tab), k_idx, axis=0)  # (6, 2, 16)
    a0, a1 = x[0::2], x[1::2]  # (6, *B, 16)
    a1 = F.select(
        jnp.broadcast_to(jnp.take(jnp.asarray(odd), k_idx), a1.shape[:-1]),
        F.neg(a1, FQ),
        a1,
    )

    def bcast(c):  # (6, 16) -> (6, *B, 16)
        return jnp.broadcast_to(
            c.reshape(c.shape[0], *([1] * (a0.ndim - 2)), c.shape[-1]), a0.shape
        )

    c0, c1 = bcast(coeff[:, 0]), bcast(coeff[:, 1])
    lhs = jnp.concatenate([a0, a1, F.add(a0, a1, FQ)])
    rhs = jnp.concatenate([c0, c1, F.add(c0, c1, FQ)])
    rr = F.mont_mul(lhs, rhs, FQ)
    t0, t1, t2 = rr[:6], rr[6:12], rr[12:]
    r0 = F.sub(t0, t1, FQ)
    r1 = F.sub(t2, F.add(t0, t1, FQ), FQ)
    return jnp.stack([r0, r1], axis=1).reshape(x.shape)


def _conj_flat(x):
    return jnp.concatenate([x[:6], F.neg(x[6:], FQ)], axis=0)


def _mul_flat(x, y):
    if T._use_fq12_kernel():
        from snark_verifier_tpu.ops.tower_pallas import fq12_mul_flat_pallas

        return fq12_mul_flat_pallas(x, y)
    return T.fq12_to_flat(T.fq12_mul(T.fq12_from_flat(x), T.fq12_from_flat(y)))


@jax.jit
def _final_exp_chain_stage(f):
    """Easy part + the Scott hard-part chain, executed by the tape VM.
    Bit-exact vs the oracle chain and the scan path
    (tests/test_pairing_jax.py)."""
    tape, out_reg, nregs = _hard_exp_tape()
    inv = T.fq12_inv(f)
    shape = jax.tree_util.tree_leaves(f)[0].shape[:-1]
    regs = [
        T.fq12_to_flat(T.fq12_ones(shape)),
        T.fq12_to_flat(inv),
        T.fq12_to_flat(f),
    ]
    regs += [jnp.zeros_like(regs[0])] * (nregs - len(regs))
    regs = jnp.stack(regs)  # (R, 12, *B, 16)

    def step(regs, ins):
        op, dst, s1, s2 = ins[0], ins[1], ins[2], ins[3]
        x = jnp.take(regs, s1, axis=0)
        y = jnp.take(regs, s2, axis=0)
        res = jax.lax.switch(
            op,
            [
                lambda o: _mul_flat(o[0], o[1]),
                lambda o: _conj_flat(o[0]),
                lambda o: _frob_flat(o[0], o[2]),
            ],
            (x, y, s2),
        )
        return jax.lax.dynamic_update_index_in_dim(regs, res, dst, axis=0), None

    regs, _ = jax.lax.scan(step, regs, jnp.asarray(tape))
    return T.fq12_from_flat(regs[out_reg])


def _final_exp_stage(f):
    return _final_exp_chain_stage(f)


@jax.jit
def _is_one_stage(f, lhs_inf):
    return T.fq12_is_one(f, lhs_inf.shape)


def kzg_pairing_check(lhs, rhs, g2, s_g2):
    """e(lhs, g2) * e(rhs, -s_g2) == 1 for batched projective G1 lhs/rhs.

    g2 / s_g2 are host-side constant G2 int tuples (the deciding key).
    Returns a boolean mask over the batch.

    NOTE: deliberately composed of several separately-jitted stages rather
    than one jit — XLA's compile time on the fused Miller+final-exp graph is
    pathological (tens of minutes) while the stages compile in seconds each.
    Do not wrap this in an outer jit.

    Small 1-D batches are padded to 8: the compiled B=1 layout is
    pathologically slow on the TPU backend (measured 8.6 s vs 2.6 s at
    B>=4 warm), and padding also makes B=1..8 share one compiled shape.
    """
    shape = lhs.x.shape[:-1]
    if len(shape) == 1 and shape[0] < 8:
        B = shape[0]

        def pad(p):
            reps = [1] * p.x.ndim
            reps[0] = 8 - B

            def ext(a):
                return jnp.concatenate([a, jnp.tile(a[:1], reps)], axis=0)

            from snark_verifier_tpu.ops.curve import G1 as _G1

            return _G1(ext(p.x), ext(p.y), ext(p.z))

        return kzg_pairing_check(pad(lhs), pad(rhs), g2, s_g2)[:B]

    lhs_n = CRV.g1_normalize(lhs)
    rhs_n = CRV.g1_normalize(rhs)
    lhs_inf = CRV.g1_is_identity(lhs)
    rhs_inf = CRV.g1_is_identity(rhs)
    if len(shape) == 1:  # fused dual-Miller scan (halved sequential depth)
        f1, f2 = _miller_stage_pair(
            lhs_n.x, lhs_n.y, rhs_n.x, rhs_n.y,
            _g2_key(g2), _g2_key(bn254.g2_neg(s_g2)),
        )
    else:
        f1 = _miller_stage(lhs_n.x, lhs_n.y, _g2_key(g2))
        f2 = _miller_stage(rhs_n.x, rhs_n.y, _g2_key(bn254.g2_neg(s_g2)))
    f = _combine_stage(f1, f2, lhs_inf, rhs_inf)
    out = _final_exp_stage(f)
    return _is_one_stage(out, lhs_inf)
