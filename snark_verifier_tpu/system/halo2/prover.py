"""Host PLONK prover (zk=false) producing halo2-wire-format proofs.

Plays the role of halo2's prover behind the SDK's `gen_proof`
(snark-verifier-sdk/src/halo2.rs:115-185): given a ProvingKey it emits a
proof byte stream in the exact transcript order the verifier reads
(PlonkProof.read / proof.rs:52-169), for both the GWC and SHPLONK multiopen
schemes.  Supports the permutation argument and the halo2 v0.3 lookup
argument (permuted input/table columns + grand product, matching the
constraints synthesized per system/halo2.rs:662-727).  Pure python ints —
this is vector-generation machinery, not a performance path; the quotient is
evaluated generically by walking the protocol's Expression AST over a coset
evaluation domain.
"""

from __future__ import annotations

from snark_verifier_tpu.loader import EcPoint
from snark_verifier_tpu.system.halo2.transcript import (
    NativeEvmTranscript,
    NativePoseidonTranscript,
)
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util import poly as up
from snark_verifier_tpu.verifier.plonk.protocol import Rotation

R = bn254.R


def create_proof(
    pk,
    instances,
    scheme: str = "gwc",
    transcript_kind: str = "evm",
    allow_unsatisfied: bool = False,
    rng=None,
) -> bytes:
    """Prove.  `allow_unsatisfied` skips the prover-side sanity asserts so a
    deliberately-invalid witness still yields a proof (for negative tests —
    the verifier must reject it).  For zk proving keys (zk_blinding > 0) the
    advice/z tail rows are randomized and a random polynomial is committed
    (halo2's create_proof blinding); `rng` seeds that randomness."""
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

    # ---- lagrange values for every poly ------------------------------------
    values = dict(pk.fixed_values)
    for poly_idx, col in zip(pk.instance_polys, instances):
        vals = [0] * n
        for i, v in enumerate(col):
            vals[i] = v % R
        values[poly_idx] = vals
    values.update(pk.synthesize(instances))

    if zk_b:
        # blind rows u+1..n-1 of every plain advice column (u = n-B-1 is the
        # l_last row; gates hold there because selectors vanish, and the
        # permutation/lookup arguments are masked by l_active)
        u = n - zk_b - 1
        special = set(pk.z_polys) | {getattr(pk, "random_poly", None)}
        for lk in getattr(pk, "lookups", None) or []:
            special |= {lk.permuted_input_poly, lk.permuted_table_poly, lk.z_poly}
        for phase_polys in pk.advice_phases:
            for idx in phase_polys:
                if idx not in special:
                    col = list(values[idx])
                    for j in range(u + 1, n):
                        col[j] = rng.randrange(R)
                    values[idx] = col

    coeffs = {}

    def commit_poly(idx):
        coeffs[idx] = up.lagrange_to_coeffs(values[idx], domain)
        return pk.srs.commit(coeffs[idx])

    for idx in pk.fixed_values:
        coeffs[idx] = up.lagrange_to_coeffs(values[idx], domain)

    lookups = getattr(pk, "lookups", None) or []
    lookup_value_polys = {}  # poly idx -> which lookup & role
    for lk in lookups:
        lookup_value_polys[lk.permuted_input_poly] = ("permuted_input", lk)
        lookup_value_polys[lk.permuted_table_poly] = ("permuted_table", lk)
        lookup_value_polys[lk.z_poly] = ("z", lk)

    # ---- phases: witnesses + challenges ------------------------------------
    challenges = []
    for phase, (advice_polys, n_chal) in enumerate(
        zip(pk.advice_phases, protocol.num_challenge)
    ):
        for idx in advice_polys:
            if idx in pk.z_polys:
                values[idx] = _permutation_z(
                    pk, values, challenges, allow_unsatisfied, rng=rng,
                    perm=pk.perm_for_z(idx),
                )
            elif zk_b and idx == getattr(pk, "random_poly", None):
                values[idx] = [rng.randrange(R) for _ in range(n)]
            elif idx in lookup_value_polys:
                role, lk = lookup_value_polys[idx]
                _materialize_lookup(
                    lk, role, pk, values, challenges, allow_unsatisfied, rng=rng
                )
            transcript.write_ec_point(EcPoint(loader, commit_poly(idx)))
        challenges.extend(s.value for s in transcript.squeeze_n_challenges(n_chal))

    # ---- quotient ----------------------------------------------------------
    h_chunks = _quotient_chunks(pk, values, challenges, allow_unsatisfied)
    for chunk in h_chunks:
        transcript.write_ec_point(EcPoint(loader, pk.srs.commit(chunk)))

    z_point = transcript.squeeze_challenge().value

    # combined quotient poly (opened as sum_i (z^n)^i h_i)
    zn = pow(z_point, n, R)
    quotient_idx = (
        len(protocol.preprocessed)
        + len(protocol.num_instance)
        + sum(protocol.num_witness)
    )
    h_comb = [0]
    zni = 1
    for chunk in h_chunks:
        h_comb = up.poly_add(h_comb, up.poly_scale(chunk, zni))
        zni = zni * zn % R
    coeffs[quotient_idx] = h_comb

    if protocol.linearization == "without-constant":
        # the WithoutConstant strategy (proof.rs:272-283) expects a
        # linearization polynomial at index quotient+1; with every numerator
        # poly evaluated its reconstructed commitment is empty, so the
        # polynomial is identically zero (evaluation 0 sent via the
        # protocol's evaluation list, opened like any other query).
        coeffs[quotient_idx + 1] = [0]

    # ---- evaluations -------------------------------------------------------
    for q in protocol.evaluations:
        point = domain.rotate_scalar(z_point, q.rotation)
        transcript.write_scalar(loader.load_const(up.eval_poly(coeffs[q.poly], point)))

    # ---- multiopen ---------------------------------------------------------
    if scheme == "gwc":
        _gwc_open(pk, coeffs, transcript, z_point)
    elif scheme == "shplonk":
        _shplonk_open(pk, coeffs, transcript, z_point)
    else:
        raise ValueError(scheme)

    return transcript.finalize()


# ---------------------------------------------------------------------------


def _permutation_z(pk, values, challenges, allow_unsatisfied=False, rng=None,
                    perm=None):
    """Grand product z for one single-chunk permutation argument (for
    num_proof>1 protocols each proof's z gets its own PermutationInfo whose
    columns are that proof's advice polys; sigmas/challenges are shared).

    zk=false: product telescopes over the full domain.  zk (zk_blinding>0):
    the product runs over the active rows 0..u-1 only (u = n-B-1), so
    z[u] == 1 satisfies l_last*(z^2-z); the B tail rows are random
    (halo2's permutation prover blinding)."""
    perm = perm or pk.permutation
    assert perm is not None
    beta, gamma = challenges[-2], challenges[-1]
    domain = pk.protocol.domain
    n = domain.n
    zk_b = getattr(pk, "zk_blinding", 0)
    u = n - zk_b - 1 if zk_b else n

    omega_pows = []
    acc = 1
    for _ in range(n):
        omega_pows.append(acc)
        acc = acc * domain.gen % R

    num = [1] * n
    den = [1] * n
    for i, (col, sp) in enumerate(zip(perm.columns, perm.sigma_polys)):
        delta_i = pow(perm.delta, i, R)
        col_vals = values[col]
        sigma_vals = values[sp]
        for j in range(n):
            num[j] = num[j] * (col_vals[j] + beta * delta_i * omega_pows[j] + gamma) % R
            den[j] = den[j] * (col_vals[j] + beta * sigma_vals[j] + gamma) % R

    den_inv = bn254.batch_inv_mod(den, R)
    z = [1] * n
    for j in range(1, u):
        z[j] = z[j - 1] * num[j - 1] * den_inv[j - 1] % R
    if zk_b:
        z_u = z[u - 1] * num[u - 1] * den_inv[u - 1] % R
        if not allow_unsatisfied:
            assert z_u == 1, "copy constraints unsatisfied"
        z[u] = z_u if z_u == 1 else 0  # keep l_last*(z^2-z) satisfiable
        for j in range(u + 1, n):
            z[j] = rng.randrange(R)
    elif not allow_unsatisfied:
        assert (
            z[n - 1] * num[n - 1] * den_inv[n - 1] % R == 1
        ), "copy constraints unsatisfied"
    return z


# ---------------------------------------------------------------------------
# Lookup argument (halo2 v0.3 semantics; constraint shapes per
# /root/reference/snark-verifier/src/system/halo2.rs:662-727, zk=false)
# ---------------------------------------------------------------------------


def eval_expr_on_domain(expr, values, challenges, n):
    """Row-wise evaluation of a protocol Expression over the base domain.
    Rotations are cyclic row shifts; CommonPolynomial nodes are not allowed
    here (they only appear in system-synthesized constraints)."""

    def rotated(q):
        vals = values[q.poly]
        r = q.rotation.value % n
        return vals[r:] + vals[:r] if r else list(vals)

    return expr.evaluate(
        constant=lambda v: [v % R] * n,
        common_poly=lambda key: (_ for _ in ()).throw(
            ValueError("CommonPolynomial in lookup expression")
        ),
        poly=rotated,
        challenge=lambda i: [challenges[i]] * n,
        negated=lambda a: [(-x) % R for x in a],
        sum_=lambda a, b: [(x + y) % R for x, y in zip(a, b)],
        product=lambda a, b: [x * y % R for x, y in zip(a, b)],
        scaled=lambda a, v: [x * v % R for x in a],
    )


def _compress(exprs, theta, values, challenges, n):
    """sum_i expr_i * theta^(len-1-i), row-wise (DistributePowers order)."""
    acc = [0] * n
    for e in exprs:
        ev = eval_expr_on_domain(e, values, challenges, n)
        acc = [(a * theta + v) % R for a, v in zip(acc, ev)]
    return acc


def _lookup_permute(a_c, s_c, allow_unsatisfied):
    """halo2's permute step over the given rows: sort the compressed input;
    the permuted table pins each first occurrence (so a'[i] == s'[i] there)
    and fills repeats (where a'[i] == a'[i-1]) with leftover table values."""
    from collections import Counter

    n = len(a_c)
    sorted_input = sorted(a_c)
    counts = Counter(s_c)
    permuted_table = [None] * n
    for i, v in enumerate(sorted_input):
        if i == 0 or v != sorted_input[i - 1]:
            if counts[v] > 0:
                counts[v] -= 1
                permuted_table[i] = v
            elif not allow_unsatisfied:
                raise ValueError(f"lookup input {v} not in table")
    leftovers = iter([v for v, c in counts.items() for _ in range(c)])
    for i in range(n):
        if permuted_table[i] is None:
            permuted_table[i] = next(leftovers)
    return sorted_input, permuted_table


def _materialize_lookup(lk, role, pk, values, challenges, allow_unsatisfied, rng=None):
    """Compute the permuted pair (after theta) or the grand product z (after
    beta/gamma) for one lookup, storing results in `values`.

    zk (pk.zk_blinding > 0): the permute/product run over the active rows
    0..u-1 only (u = n-B-1); the tail rows are random and the protocol's
    l_last/l_active masks cover them (halo2.rs:706-718)."""
    n = pk.protocol.domain.n
    zk_b = getattr(pk, "zk_blinding", 0)
    u = n - zk_b - 1 if zk_b else n

    def blind_tail(col):
        return col + [rng.randrange(R) for _ in range(n - u)]

    if role in ("permuted_input", "permuted_table"):
        if lk.permuted_input_poly in values:
            return
        theta = challenges[lk.theta_challenge]
        a_c = _compress(lk.input_exprs, theta, values, challenges, n)
        s_c = _compress(lk.table_exprs, theta, values, challenges, n)
        a_p, s_p = _lookup_permute(a_c[:u], s_c[:u], allow_unsatisfied)
        if zk_b:
            a_p, s_p = blind_tail(a_p), blind_tail(s_p)
        values[lk.permuted_input_poly] = a_p
        values[lk.permuted_table_poly] = s_p
        values[("lookup_compressed", lk.z_poly)] = (a_c, s_c)
    else:  # z: z[j+1] = z[j] * (A_c+beta)(S_c+gamma) / ((a'+beta)(s'+gamma))
        beta, gamma = challenges[-2], challenges[-1]
        a_c, s_c = values.pop(("lookup_compressed", lk.z_poly))
        a_p = values[lk.permuted_input_poly]
        s_p = values[lk.permuted_table_poly]
        num = [(a_c[j] + beta) * (s_c[j] + gamma) % R for j in range(u)]
        den = [(a_p[j] + beta) * (s_p[j] + gamma) % R for j in range(u)]
        den_inv = bn254.batch_inv_mod(den, R)
        z = [1] * n
        for j in range(1, u):
            z[j] = z[j - 1] * num[j - 1] * den_inv[j - 1] % R
        closing = z[u - 1] * num[u - 1] * den_inv[u - 1] % R
        if zk_b:
            if not allow_unsatisfied:
                assert closing == 1, "lookup argument unsatisfied"
            z[u] = closing if closing == 1 else 0
            for j in range(u + 1, n):
                z[j] = rng.randrange(R)
        elif not allow_unsatisfied:
            assert closing == 1, "lookup argument unsatisfied"
        values[lk.z_poly] = z


def _quotient_chunks(pk, values, challenges, allow_unsatisfied=False):
    """Evaluate the quotient numerator on an extended coset by walking the
    Expression AST, divide by X^n - 1, split into chunks."""
    protocol = pk.protocol
    domain = protocol.domain
    n = domain.n
    ext_k = pk.extended_k
    n_ext = 1 << ext_k
    coset_g = pk.coset_gen

    omega_ext = bn254.root_of_unity(ext_k)
    xs = []
    acc = coset_g
    for _ in range(n_ext):
        xs.append(acc)
        acc = acc * omega_ext % R

    # coset evaluations of every referenced poly
    used = protocol.quotient.numerator.used_query()
    poly_coset = {}
    for q in used:
        if q.poly not in poly_coset:
            coeffs = up.lagrange_to_coeffs(values[q.poly], domain)
            poly_coset[q.poly] = up.coset_eval(coeffs, ext_k, coset_g)

    # rotation on the extended domain: rotating by 1 on the base domain is a
    # shift by n_ext/n positions on the extended one
    stride = n_ext // n

    def poly_at(query):
        base = poly_coset[query.poly]
        r = query.rotation.value
        if r == 0:
            return base
        shift = (r * stride) % n_ext
        return base[shift:] + base[:shift]

    zn_minus_one = [(pow(x, n, R) - 1) % R for x in xs]
    zn_minus_one_inv = bn254.batch_inv_mod(zn_minus_one, R)
    n_inv = domain.n_inv

    lag_cache = {}

    def common_at(key):
        kind, idx = key
        if kind == "identity":
            return xs
        if idx not in lag_cache:
            omega_i = domain.rotate_scalar(1, Rotation(idx))
            denom = [(x - omega_i) % R for x in xs]
            denom_inv = bn254.batch_inv_mod(denom, R)
            lag_cache[idx] = [
                zn_minus_one[j] * n_inv % R * omega_i % R * denom_inv[j] % R
                for j in range(n_ext)
            ]
        return lag_cache[idx]

    numerator = protocol.quotient.numerator.evaluate(
        constant=lambda v: [v % R] * n_ext,
        common_poly=common_at,
        poly=poly_at,
        challenge=lambda i: [challenges[i]] * n_ext,
        negated=lambda a: [(-x) % R for x in a],
        sum_=lambda a, b: [(x + y) % R for x, y in zip(a, b)],
        product=lambda a, b: [x * y % R for x, y in zip(a, b)],
        scaled=lambda a, v: [x * v % R for x in a],
    )

    h_vals = [numerator[j] * zn_minus_one_inv[j] % R for j in range(n_ext)]
    h_coeffs = up.coset_interp(h_vals, ext_k, coset_g)
    num_chunk = protocol.quotient.num_chunk
    if not allow_unsatisfied:
        assert all(
            c == 0 for c in h_coeffs[num_chunk * n :]
        ), "quotient degree overflow"
    return [h_coeffs[i * n : (i + 1) * n] for i in range(num_chunk)]


def _prover_query_polys(pk, coeffs, z_point):
    """(poly_idx, shift, coeffs, eval) per protocol query, in order."""
    protocol = pk.protocol
    out = []
    for q in protocol.queries:
        shift = protocol.domain.rotate_scalar(1, q.rotation)
        point = shift * z_point % R
        out.append((q.poly, shift, coeffs[q.poly], up.eval_poly(coeffs[q.poly], point)))
    return out


def _gwc_open(pk, coeffs, transcript, z_point):
    """GWC19 prover: one witness commitment per shift set."""
    loader = transcript.loader()
    v = transcript.squeeze_challenge().value

    queries = _prover_query_polys(pk, coeffs, z_point)
    # group by shift, preserving order (matches gwc19.rs:142-160)
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
        combined = [0]
        vi = 1
        for cfs, ev in claims:
            numer = up.poly_sub(cfs, [ev])
            combined = up.poly_add(combined, up.poly_scale(numer, vi))
            vi = vi * v % R
        w, rem = up.divide_by_linear(combined, point)
        assert rem == 0
        transcript.write_ec_point(EcPoint(loader, pk.srs.commit(w)))

    transcript.squeeze_challenge()  # u


def _shplonk_open(pk, coeffs, transcript, z_point):
    """BDFG21 prover: W (per-set quotients folded) + W' (final quotient)."""
    loader = transcript.loader()
    mu = transcript.squeeze_challenge().value
    gamma = transcript.squeeze_challenge().value

    queries = _prover_query_polys(pk, coeffs, z_point)
    # group polys by shift-SET in the verifier's order (bdfg21.rs:121-171)
    poly_entries = []  # (poly, [shift], [coeffs]) in first-seen order
    for poly, shift, cfs, ev in queries:
        for e in poly_entries:
            if e[0] == poly:
                if shift not in e[1]:
                    e[1].append(shift)
                break
        else:
            poly_entries.append((poly, [shift], cfs))
    sets = []  # (shifts, [poly coeffs])
    for poly, shifts, cfs in poly_entries:
        for s in sets:
            if set(s[0]) == set(shifts):
                s[1].append(cfs)
                break
        else:
            sets.append((shifts, [cfs]))

    # H = sum_s gamma^s (f_s - r_s) / Z_s
    h = [0]
    set_data = []
    for s_idx, (shifts, polys) in enumerate(sets):
        points = [sh * z_point % R for sh in shifts]
        f_s = [0]
        mui = 1
        for cfs in polys:
            f_s = up.poly_add(f_s, up.poly_scale(cfs, mui))
            mui = mui * mu % R
        r_s = up.lagrange_interp(points, [up.eval_poly(f_s, pt) for pt in points])
        quot = up.divide_by_vanishing(up.poly_sub(f_s, r_s), points)
        h = up.poly_add(h, up.poly_scale(quot, pow(gamma, s_idx, R)))
        set_data.append((points, f_s))
    transcript.write_ec_point(EcPoint(loader, pk.srs.commit(h)))

    z_prime = transcript.squeeze_challenge().value

    # L = sum_s gamma^s nu_s (f_s - r_s(z')) - Z_{S0}(z') H;  W' = L/(X - z')
    z_s0 = 1
    for pt in set_data[0][0]:
        z_s0 = z_s0 * (z_prime - pt) % R
    L = [0]
    for s_idx, (points, f_s) in enumerate(set_data):
        z_s = 1
        for pt in points:
            z_s = z_s * (z_prime - pt) % R
        nu = z_s0 * bn254.inv_mod(z_s, R) % R
        r_at_zp = up.eval_poly(
            up.lagrange_interp(points, [up.eval_poly(f_s, pt) for pt in points]),
            z_prime,
        )
        term = up.poly_sub(f_s, [r_at_zp])
        L = up.poly_add(L, up.poly_scale(term, pow(gamma, s_idx, R) * nu % R))
    L = up.poly_sub(L, up.poly_scale(h, z_s0))
    w_prime, rem = up.divide_by_linear(L, z_prime)
    assert rem == 0, "SHPLONK linearization not divisible at z'"
    transcript.write_ec_point(EcPoint(loader, pk.srs.commit(w_prime)))
