"""At-scale host PLONK prover over FrVec (threaded native kernels).

Byte-identical to system/halo2/prover.py's `create_proof` (tested against
it on every scheme/transcript/zk combination), but every polynomial lives
as an (n,4) u64 Montgomery numpy buffer and all hot loops run in the
threaded C++ kernels (native/bn254_native.cpp v2): NTTs, elementwise field
ops, batch inversion, grand-product scans, Horner/synthetic division, and
the Pippenger commit MSMs.  This is what makes proving the k>=21
aggregation circuit tractable — the reference gets the same from
halo2_proofs' rayon prover (snark-verifier-sdk/src/halo2.rs:115-185);
here the parallel substrate is std::thread over limb vectors.

The quotient is evaluated on the extended domain decomposed into
n_ext/n sub-cosets of size n: on each sub-coset c_j = coset_gen*w_ext^j,
x^n is the CONSTANT c_j^n (so Z_H-inverse is a scalar), base-domain
rotations are cyclic rolls, and each used polynomial needs one size-n NTT
— strictly cheaper than one 2^ext_k NTT per polynomial and bounded-memory
(the reference's halo2 does the same windowed coset evaluation).
"""

from __future__ import annotations

from snark_verifier_tpu.loader import EcPoint
from snark_verifier_tpu.system.halo2.transcript import (
    NativeEvmTranscript,
    NativePoseidonTranscript,
)
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.frvec import FrVec, div_linear, horner
from snark_verifier_tpu.verifier.plonk.protocol import Rotation

R = bn254.R


# ---------------------------------------------------------------------------
# FrVec helpers
# ---------------------------------------------------------------------------


def _as_frvec(vals, n) -> FrVec:
    if isinstance(vals, FrVec):
        return vals
    assert len(vals) == n
    return FrVec.from_ints(vals)


def _vec_poly_add(a: FrVec, b: FrVec) -> FrVec:
    if len(a) == len(b):
        return a + b
    if len(a) < len(b):
        a, b = b, a
    return a + b.pad_to(len(a))


def _intt(vals: FrVec, domain) -> FrVec:
    return vals.ntt(
        bn254.inv_mod(domain.gen, R), bn254.inv_mod(domain.n, R)
    )


def eval_expr_vec(expr, poly_at, common_at, challenges, n):
    """Fold a protocol Expression into an FrVec of row-wise evaluations.

    poly_at(query) -> FrVec; common_at(key) -> FrVec (or raises);
    challenges: canonical ints.
    """
    return expr.evaluate(
        constant=lambda v: FrVec.full(n, v),
        common_poly=common_at,
        poly=poly_at,
        challenge=lambda i: FrVec.full(n, challenges[i]),
        negated=lambda a: a.neg(),
        sum_=lambda a, b: a + b,
        product=lambda a, b: a * b,
        scaled=lambda a, v: a.scale(v),
    )


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


def create_proof_fast(
    pk,
    instances,
    scheme: str = "gwc",
    transcript_kind: str = "evm",
    allow_unsatisfied: bool = False,
    rng=None,
) -> bytes:
    """Prove; drop-in replacement for prover.create_proof (same bytes)."""
    protocol = pk.protocol
    domain = protocol.domain
    n = domain.n
    zk_b = getattr(pk, "zk_blinding", 0)
    if zk_b and rng is None:
        import random as _random

        rng = _random.Random()

    transcript = (
        NativeEvmTranscript() if transcript_kind == "evm" else NativePoseidonTranscript()
    )
    loader = transcript.loader()

    if protocol.transcript_initial_state is not None:
        transcript.common_scalar(loader.load_const(protocol.transcript_initial_state))
    for col in instances:
        for v in col:
            transcript.common_scalar(loader.load_const(v))

    # ---- lagrange values for every poly (FrVec) -----------------------------
    values: dict = {}
    cache = getattr(pk, "_frvec_fixed_cache", None)
    if cache is None:
        cache = {
            idx: FrVec.from_ints(vals) for idx, vals in pk.fixed_values.items()
        }
        pk._frvec_fixed_cache = cache
    values.update(cache)

    for poly_idx, col in zip(pk.instance_polys, instances):
        vals = [0] * n
        for i, v in enumerate(col):
            vals[i] = v % R
        values[poly_idx] = FrVec.from_ints(vals)
    for idx, vals in pk.synthesize(instances).items():
        values[idx] = _as_frvec(vals, n)

    if zk_b:
        u = n - zk_b - 1
        special = set(pk.z_polys) | {getattr(pk, "random_poly", None)}
        for lk in getattr(pk, "lookups", None) or []:
            special |= {lk.permuted_input_poly, lk.permuted_table_poly, lk.z_poly}
        for phase_polys in pk.advice_phases:
            for idx in phase_polys:
                if idx not in special:
                    col = values[idx].copy()
                    tail = FrVec.from_ints(
                        [rng.randrange(R) for _ in range(n - u - 1)]
                    )
                    col.a[u + 1 :] = tail.a
                    values[idx] = col

    coeffs: dict = {}

    def commit_poly(idx):
        coeffs[idx] = _intt(values[idx], domain)
        return pk.srs.commit_vec(coeffs[idx])

    for idx in pk.fixed_values:
        coeffs[idx] = _intt(values[idx], domain)

    lookups = getattr(pk, "lookups", None) or []
    lookup_value_polys = {}
    for lk in lookups:
        lookup_value_polys[lk.permuted_input_poly] = ("permuted_input", lk)
        lookup_value_polys[lk.permuted_table_poly] = ("permuted_table", lk)
        lookup_value_polys[lk.z_poly] = ("z", lk)

    # ---- phases: witnesses + challenges -------------------------------------
    challenges = []
    for phase, (advice_polys, n_chal) in enumerate(
        zip(pk.advice_phases, protocol.num_challenge)
    ):
        for idx in advice_polys:
            if idx in pk.z_polys:
                values[idx] = _permutation_z_vec(
                    pk, values, challenges, allow_unsatisfied, rng=rng,
                    perm=pk.perm_for_z(idx),
                )
            elif zk_b and idx == getattr(pk, "random_poly", None):
                values[idx] = FrVec.from_ints([rng.randrange(R) for _ in range(n)])
            elif idx in lookup_value_polys:
                role, lk = lookup_value_polys[idx]
                _materialize_lookup_vec(
                    lk, role, pk, values, challenges, allow_unsatisfied, rng=rng
                )
            transcript.write_ec_point(EcPoint(loader, commit_poly(idx)))
        challenges.extend(s.value for s in transcript.squeeze_n_challenges(n_chal))

    # ---- quotient ------------------------------------------------------------
    h_chunks = _quotient_chunks_vec(pk, values, coeffs, challenges, allow_unsatisfied)
    for chunk in h_chunks:
        transcript.write_ec_point(EcPoint(loader, pk.srs.commit_vec(chunk)))

    z_point = transcript.squeeze_challenge().value

    zn = pow(z_point, n, R)
    quotient_idx = (
        len(protocol.preprocessed)
        + len(protocol.num_instance)
        + sum(protocol.num_witness)
    )
    h_comb = FrVec.zeros(1)
    zni = 1
    for chunk in h_chunks:
        h_comb = _vec_poly_add(h_comb, chunk.scale(zni))
        zni = zni * zn % R
    coeffs[quotient_idx] = h_comb

    if protocol.linearization == "without-constant":
        coeffs[quotient_idx + 1] = FrVec.zeros(1)

    # ---- evaluations ---------------------------------------------------------
    for q in protocol.evaluations:
        point = domain.rotate_scalar(z_point, q.rotation)
        transcript.write_scalar(loader.load_const(horner(coeffs[q.poly], point)))

    # ---- multiopen -----------------------------------------------------------
    if scheme == "gwc":
        _gwc_open_vec(pk, coeffs, transcript, z_point)
    elif scheme == "shplonk":
        _shplonk_open_vec(pk, coeffs, transcript, z_point)
    else:
        raise ValueError(scheme)

    return transcript.finalize()


# ---------------------------------------------------------------------------


def _permutation_z_vec(pk, values, challenges, allow_unsatisfied=False, rng=None,
                        perm=None):
    """Vectorized grand product (see prover._permutation_z)."""
    perm = perm or pk.permutation
    assert perm is not None
    beta, gamma = challenges[-2], challenges[-1]
    domain = pk.protocol.domain
    n = domain.n
    zk_b = getattr(pk, "zk_blinding", 0)
    u = n - zk_b - 1 if zk_b else n

    omega_pows = FrVec.pow_series(domain.gen, n)
    gamma_vec = FrVec.full(n, gamma)

    num = FrVec.full(n, 1)
    den = FrVec.full(n, 1)
    for i, (col, sp) in enumerate(zip(perm.columns, perm.sigma_polys)):
        delta_i = pow(perm.delta, i, R)
        col_vals = values[col]
        num = num * (col_vals + omega_pows.scale(beta * delta_i % R) + gamma_vec)
        den = den * (col_vals + values[sp].scale(beta) + gamma_vec)

    ratio = num * den.inv()
    pp = ratio.prefix_prod()  # pp[j] = prod_{i<=j} ratio[i]
    z = FrVec.full(n, 1)
    # z[j] = pp[j-1] for 1 <= j < u
    z.a[1:u] = pp.a[: u - 1]
    if zk_b:
        z_u = pp.at(u - 1)
        if not allow_unsatisfied:
            assert z_u == 1, "copy constraints unsatisfied"
        tail = [z_u if z_u == 1 else 0] + [rng.randrange(R) for _ in range(n - u - 1)]
        z.a[u:] = FrVec.from_ints(tail).a
    elif not allow_unsatisfied:
        assert pp.at(n - 1) == 1, "copy constraints unsatisfied"
    return z


def _compress_vec(exprs, theta, values, challenges, n):
    """DistributePowers-order compression, vectorized."""
    acc = FrVec.zeros(n)

    def poly_at(q):
        return values[q.poly].rotate(q.rotation.value % n)

    def common_at(key):
        raise ValueError("CommonPolynomial in lookup expression")

    for e in exprs:
        ev = eval_expr_vec(e, poly_at, common_at, challenges, n)
        acc = acc.scale(theta) + ev
    return acc


def _materialize_lookup_vec(
    lk, role, pk, values, challenges, allow_unsatisfied, rng=None
):
    """Vectorized lookup materialization (see prover._materialize_lookup).

    The permute step (sort + first-occurrence pinning) is inherently
    sequential/comparison-based and runs on python ints; everything around
    it is FrVec."""
    from snark_verifier_tpu.system.halo2.prover import _lookup_permute

    n = pk.protocol.domain.n
    zk_b = getattr(pk, "zk_blinding", 0)
    u = n - zk_b - 1 if zk_b else n

    if role in ("permuted_input", "permuted_table"):
        if lk.permuted_input_poly in values:
            return
        theta = challenges[lk.theta_challenge]
        a_c = _compress_vec(lk.input_exprs, theta, values, challenges, n)
        s_c = _compress_vec(lk.table_exprs, theta, values, challenges, n)
        a_ints = a_c.to_ints()
        s_ints = s_c.to_ints()
        a_p, s_p = _lookup_permute(a_ints[:u], s_ints[:u], allow_unsatisfied)
        if zk_b:
            a_p = a_p + [rng.randrange(R) for _ in range(n - u)]
            s_p = s_p + [rng.randrange(R) for _ in range(n - u)]
        values[lk.permuted_input_poly] = FrVec.from_ints(a_p)
        values[lk.permuted_table_poly] = FrVec.from_ints(s_p)
        values[("lookup_compressed", lk.z_poly)] = (a_c, s_c)
    else:
        beta, gamma = challenges[-2], challenges[-1]
        a_c, s_c = values.pop(("lookup_compressed", lk.z_poly))
        a_p = values[lk.permuted_input_poly]
        s_p = values[lk.permuted_table_poly]
        beta_v = FrVec.full(n, beta)
        gamma_v = FrVec.full(n, gamma)
        num = (a_c + beta_v) * (s_c + gamma_v)
        den = (a_p + beta_v) * (s_p + gamma_v)
        ratio = num * den.inv()
        pp = ratio.prefix_prod()
        z = FrVec.full(n, 1)
        z.a[1:u] = pp.a[: u - 1]
        closing = pp.at(u - 1)
        if zk_b:
            if not allow_unsatisfied:
                assert closing == 1, "lookup argument unsatisfied"
            tail = [closing if closing == 1 else 0] + [
                rng.randrange(R) for _ in range(n - u - 1)
            ]
            z.a[u:] = FrVec.from_ints(tail).a
        elif not allow_unsatisfied:
            assert closing == 1, "lookup argument unsatisfied"
        values[lk.z_poly] = z


def _quotient_chunks_vec(pk, values, coeffs, challenges, allow_unsatisfied=False):
    """Quotient via sub-coset decomposition of the extended domain."""
    import numpy as np

    protocol = pk.protocol
    domain = protocol.domain
    n = domain.n
    ext_k = pk.extended_k
    n_ext = 1 << ext_k
    stride = n_ext // n
    coset_g = pk.coset_gen
    omega_ext = bn254.root_of_unity(ext_k)
    n_inv = domain.n_inv

    used = protocol.quotient.numerator.used_query()
    used_polys = sorted({q.poly for q in used})
    for p in used_polys:
        if p not in coeffs:
            coeffs[p] = _intt(values[p], domain)

    used_lagranges = sorted(protocol.quotient.numerator.used_lagrange())

    h_arr = np.empty((n, stride, 4), np.uint64)
    omega_pows = FrVec.pow_series(domain.gen, n)

    for j in range(stride):
        cj = coset_g * pow(omega_ext, j, R) % R
        cj_pows = FrVec.pow_series(cj, n)
        evals = {}
        for p in used_polys:
            ev = coeffs[p] * cj_pows
            ev.ntt_inplace(domain.gen)
            evals[p] = ev

        xs = omega_pows.scale(cj)  # x at row i of this sub-coset
        znm1 = (pow(cj, n, R) - 1) % R  # x^n - 1 is constant on the sub-coset
        znm1_inv = bn254.inv_mod(znm1, R)

        lag = {}
        if used_lagranges:
            for idx in used_lagranges:
                omega_i = domain.rotate_scalar(1, Rotation(idx))
                denom_inv = (xs - FrVec.full(n, omega_i)).inv()
                lag[idx] = denom_inv.scale(znm1 * n_inv % R * omega_i % R)

        def poly_at(q):
            return evals[q.poly].rotate(q.rotation.value)

        def common_at(key):
            kind, idx = key
            if kind == "identity":
                return xs
            return lag[idx]

        numer = eval_expr_vec(
            protocol.quotient.numerator, poly_at, common_at, challenges, n
        )
        h_j = numer.scale(znm1_inv)
        h_arr[:, j] = h_j.a
        del evals

    h_ext = FrVec(h_arr.reshape(n_ext, 4))
    # coset_interp: values on coset_g * H_ext -> coefficients
    h_ext.ntt_inplace(bn254.inv_mod(omega_ext, R), bn254.inv_mod(n_ext, R))
    h_coeffs = h_ext * FrVec.pow_series(bn254.inv_mod(coset_g, R), n_ext)

    num_chunk = protocol.quotient.num_chunk
    if not allow_unsatisfied:
        tail = h_coeffs.a[num_chunk * n :]
        assert not tail.any(), "quotient degree overflow"
    return [FrVec(h_coeffs.a[i * n : (i + 1) * n].copy()) for i in range(num_chunk)]


def _prover_query_polys_vec(pk, coeffs, z_point):
    protocol = pk.protocol
    out = []
    for q in protocol.queries:
        shift = protocol.domain.rotate_scalar(1, q.rotation)
        point = shift * z_point % R
        out.append((q.poly, shift, coeffs[q.poly], horner(coeffs[q.poly], point)))
    return out


def _gwc_open_vec(pk, coeffs, transcript, z_point):
    loader = transcript.loader()
    v = transcript.squeeze_challenge().value

    queries = _prover_query_polys_vec(pk, coeffs, z_point)
    sets = []
    for poly, shift, cfs, ev in queries:
        for s in sets:
            if s[0] == shift:
                s[1].append((cfs, ev))
                break
        else:
            sets.append((shift, [(cfs, ev)]))

    for shift, claims in sets:
        point = shift * z_point % R
        combined = FrVec.zeros(1)
        vi = 1
        for cfs, ev in claims:
            numer = _vec_poly_add(cfs, FrVec.from_ints([(-ev) % R]))
            combined = _vec_poly_add(combined, numer.scale(vi))
            vi = vi * v % R
        w, rem = div_linear(combined, point)
        assert rem == 0
        transcript.write_ec_point(EcPoint(loader, pk.srs.commit_vec(w)))

    transcript.squeeze_challenge()  # u


def _shplonk_open_vec(pk, coeffs, transcript, z_point):
    from snark_verifier_tpu.util import poly as up

    loader = transcript.loader()
    mu = transcript.squeeze_challenge().value
    gamma = transcript.squeeze_challenge().value

    queries = _prover_query_polys_vec(pk, coeffs, z_point)
    poly_entries = []
    for poly, shift, cfs, ev in queries:
        for e in poly_entries:
            if e[0] == poly:
                if shift not in e[1]:
                    e[1].append(shift)
                break
        else:
            poly_entries.append((poly, [shift], cfs))
    sets = []
    for poly, shifts, cfs in poly_entries:
        for s in sets:
            if set(s[0]) == set(shifts):
                s[1].append(cfs)
                break
        else:
            sets.append((shifts, [cfs]))

    # H = sum_s gamma^s (f_s - r_s) / Z_s
    h = FrVec.zeros(1)
    set_data = []
    for s_idx, (shifts, polys) in enumerate(sets):
        points = [sh * z_point % R for sh in shifts]
        f_s = FrVec.zeros(1)
        mui = 1
        for cfs in polys:
            f_s = _vec_poly_add(f_s, cfs.scale(mui))
            mui = mui * mu % R
        r_s = up.lagrange_interp(points, [horner(f_s, pt) for pt in points])
        quot = _vec_poly_add(f_s, FrVec.from_ints(r_s).neg().pad_to(len(f_s)))
        for pt in points:
            quot, rem = div_linear(quot, pt)
            assert rem == 0, "not divisible by vanishing set"
        h = _vec_poly_add(h, quot.scale(pow(gamma, s_idx, R)))
        set_data.append((points, f_s))
    transcript.write_ec_point(EcPoint(loader, pk.srs.commit_vec(h)))

    z_prime = transcript.squeeze_challenge().value

    z_s0 = 1
    for pt in set_data[0][0]:
        z_s0 = z_s0 * (z_prime - pt) % R
    L = FrVec.zeros(1)
    for s_idx, (points, f_s) in enumerate(set_data):
        z_s = 1
        for pt in points:
            z_s = z_s * (z_prime - pt) % R
        nu = z_s0 * bn254.inv_mod(z_s, R) % R
        r_at_zp = up.eval_poly(
            up.lagrange_interp(points, [horner(f_s, pt) for pt in points]),
            z_prime,
        )
        term = _vec_poly_add(f_s, FrVec.from_ints([(-r_at_zp) % R]))
        L = _vec_poly_add(L, term.scale(pow(gamma, s_idx, R) * nu % R))
    L = _vec_poly_add(L, h.scale((R - z_s0) % R))
    w_prime, rem = div_linear(L, z_prime)
    assert rem == 0, "SHPLONK linearization not divisible at z'"
    transcript.write_ec_point(EcPoint(loader, pk.srs.commit_vec(w_prime)))
