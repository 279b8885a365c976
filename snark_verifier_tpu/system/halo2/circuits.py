"""Circuit -> protocol compilation for the built-in test circuits.

This module plays the role of the reference's `compile()` frontend
(system/halo2.rs:95-182): it produces a `PlonkProtocol` (poly index layout,
query/evaluation orders, constraint expressions) plus a `ProvingKey` for our
host prover.  The poly index layout and transcript orders follow the
reference exactly (fixed, permutation-fixed | instance | advice phases |
permutation z | quotient), so protocols compiled by the reference from real
halo2 verifying keys drop into the same verifier.

The flagship circuit is StandardPlonk
(system/halo2/test/circuit/standard.rs:10-124): one gate
  q_a*a + q_b*b + q_c*c + q_ab*a*b + constant + instance = 0,
three advice columns under a copy-constraint permutation argument.
zk is disabled (Config::set_zk(false) analogue): no blinding rows, no
random poly — prover simplicity; the verifier machinery is zk-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from snark_verifier_tpu.system.halo2.srs import Srs
from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256
from snark_verifier_tpu.util.poly import lagrange_to_coeffs
from snark_verifier_tpu.verifier.plonk.protocol import (
    Challenge,
    CommonIdentity,
    CommonLagrange,
    Constant,
    DistributePowers,
    Domain,
    PlonkProtocol,
    Polynomial,
    Query,
    QuotientPolynomial,
)

# halo2's DELTA for bn256 Fr: generator^(2^S) — coset separator for the
# permutation argument.
DELTA = pow(bn254.FR_GENERATOR, 1 << bn254.FR_S, bn254.R)


@dataclass
class PermutationInfo:
    columns: list  # poly indices of permuted columns, in order
    sigma_polys: list  # poly indices of the sigma (perm-fixed) polynomials
    chunk: int
    delta: int = DELTA


@dataclass
class LookupInfo:
    """One halo2 v0.3 lookup: prover-side metadata matching the constraints
    the protocol carries (system/halo2.rs:662-727)."""

    input_exprs: list  # [Expression] compressed with theta
    table_exprs: list
    permuted_input_poly: int  # a'
    permuted_table_poly: int  # s'
    z_poly: int
    theta_challenge: int = 0  # global challenge index of theta


@dataclass
class ProvingKey:
    protocol: PlonkProtocol
    srs: Srs
    fixed_values: dict  # poly index -> lagrange values (fixed + perm fixed)
    permutation: Optional[PermutationInfo]
    advice_phases: list  # [[poly indices]] per phase
    z_polys: list  # permutation z poly indices
    instance_polys: list  # poly indices of instance columns
    synthesize: Callable  # instances -> {advice poly idx: lagrange values}
    extended_k: int
    coset_gen: int = bn254.FR_GENERATOR
    lookups: list = None  # [LookupInfo]
    zk_blinding: int = 0  # blinding factors B (0 = zk disabled)
    random_poly: Optional[int] = None  # zk random witness poly index
    permutations: list = None  # num_proof>1: one PermutationInfo per z poly

    def perm_for_z(self, z_idx: int):
        perms = self.permutations or ([self.permutation] if self.permutation else [])
        return dict(zip(self.z_polys, perms))[z_idx]


BLINDING = 5  # zk blinding factors (cs.blinding_factors() analogue)


def build_standard_plonk(k: int, srs: Srs, zk: bool = False, num_proof: int = 1):
    """Compile StandardPlonk at size 2^k; returns (protocol, pk).

    zk=True mirrors the reference's Config::set_zk(true) compile
    (system/halo2.rs:520-546, 596-660): l_last = l[-(B+1)], l_blind = the B
    trailing lagranges, the permutation constrained as l_0*(1-z),
    l_last*(z^2-z), l_active*(left-right), and one extra random witness
    polynomial queried last (halo2.rs:131,148,468-474).  The prover blinds
    advice/z tail rows and commits a random polynomial.

    num_proof=t compiles ONE protocol describing t proofs in a single
    transcript (system/halo2.rs:72-76,325-345; exercised by the reference's
    test/kzg/native.rs:20-38 with num_proof=2): instance/advice/z polys
    repeat per proof (advice proof-major within each phase), constraints
    replicate per proof under one DistributePowers(alpha), fixed/sigma
    queries appear once, and all challenges are shared."""
    assert srs.k >= k and num_proof >= 1
    domain = Domain.new(k)
    n = domain.n
    T = num_proof

    # ---- poly index layout (reference: fixed | perm-fixed | instance*T |
    # advice phases (proof-major) | z*T [| random] | quotient) ---------------
    Q_A, Q_B, Q_C, Q_AB, CONST = range(5)
    S_A, S_B, S_C = 5, 6, 7
    INSTANCE = [8 + t for t in range(T)]
    ADV = [(8 + T + 3 * t, 9 + T + 3 * t, 10 + T + 3 * t) for t in range(T)]
    Z = [8 + 4 * T + t for t in range(T)]
    RAND = 8 + 5 * T if zk else None
    QUOT = 8 + 5 * T + (1 if zk else 0)

    P = lambda idx, rot=0: Polynomial(Query.new(idx, rot))
    theta, beta, gamma, alpha = Challenge(0), Challenge(1), Challenge(2), Challenge(3)

    l_0 = CommonLagrange(0)
    one = Constant(1)
    sigmas = [P(S_A), P(S_B), P(S_C)]
    ident = CommonIdentity()
    if zk:
        rot_last = -(BLINDING + 1)
        l_last = CommonLagrange(rot_last)
        l_blind = None
        for j in range(rot_last + 1, 0):
            term = CommonLagrange(j)
            l_blind = term if l_blind is None else l_blind + term
        l_active = one - l_last - l_blind

    constraints = []
    for t in range(T):
        A, B, C = ADV[t]
        gate = (
            P(Q_A) * P(A)
            + P(Q_B) * P(B)
            + P(Q_C) * P(C)
            + P(Q_AB) * P(A) * P(B)
            + P(CONST)
            + P(INSTANCE[t])
        )
        # permutation constraints, single chunk of all 3 columns
        # (system/halo2.rs:567-660)
        cols = [P(A), P(B), P(C)]
        perm_l0 = l_0 * (one - P(Z[t]))
        left = P(Z[t], 1)
        for col, sigma in zip(cols, sigmas):
            left = left * (col + beta * sigma + gamma)
        right = P(Z[t])
        delta_pow = 1
        for col in cols:
            right = right * (col + beta * Constant(delta_pow) * ident + gamma)
            delta_pow = delta_pow * DELTA % bn254.R
        perm_main = left - right
        if zk:
            constraints += [
                gate,
                perm_l0,
                l_last * (P(Z[t]) * P(Z[t]) - P(Z[t])),
                l_active * perm_main,
            ]
        else:
            constraints += [gate, perm_l0, perm_main]

    numerator = DistributePowers(tuple(constraints), alpha)
    degree = numerator.degree()  # 4 (zk: 5)
    num_chunk = degree - 1

    evaluations = (
        [Query.new(p) for t in range(T) for p in ADV[t]]
        + [Query.new(i) for i in range(5)]
        + ([Query.new(RAND)] if zk else [])
        + [Query.new(i) for i in (S_A, S_B, S_C)]
        + [q for t in range(T) for q in (Query.new(Z[t]), Query.new(Z[t], 1))]
    )
    queries = (
        [
            q
            for t in range(T)
            for q in (
                Query.new(ADV[t][0]),
                Query.new(ADV[t][1]),
                Query.new(ADV[t][2]),
                Query.new(Z[t]),
                Query.new(Z[t], 1),
            )
        ]
        + [Query.new(i) for i in range(5)]
        + [Query.new(i) for i in (S_A, S_B, S_C)]
        + [Query.new(QUOT)]
        + ([Query.new(RAND)] if zk else [])
    )

    # ---- fixed assignments (standard.rs:96-122) ---------------------------
    fixed = {i: [0] * n for i in range(5)}
    fixed[Q_A][0] = (-1) % bn254.R
    for idx, col in enumerate([Q_A, Q_B, Q_C, Q_AB, CONST], start=1):
        fixed[col][1] = idx

    # copy constraints: a[2] == b[3], a[2] == c[4] -> cycle (A,2)->(B,3)->(C,4)
    cycles = [[(0, 2), (1, 3), (2, 4)]]  # (column position in perm_cols, row)
    sigma_values = _sigmas(domain, 3, cycles)
    for sp, vals in zip((S_A, S_B, S_C), sigma_values):
        fixed[sp] = vals

    # ---- preprocessed commitments -----------------------------------------
    preprocessed = []
    for idx in [Q_A, Q_B, Q_C, Q_AB, CONST, S_A, S_B, S_C]:
        coeffs = lagrange_to_coeffs(fixed[idx], domain)
        preprocessed.append(srs.commit(coeffs))

    transcript_initial_state = (
        int.from_bytes(
            keccak256(
                f"svtpu-standard-plonk{'-zk' if zk else ''}-k{k}"
                f"{'' if T == 1 else f'-t{T}'}".encode()
            ),
            "big",
        )
        % bn254.R
    )

    protocol = PlonkProtocol(
        domain=domain,
        preprocessed=preprocessed,
        num_instance=[1] * T,
        num_witness=[3 * T, 0, (T + 1) if zk else T],
        num_challenge=[1, 2, 1],
        evaluations=evaluations,
        queries=queries,
        quotient=QuotientPolynomial(1, num_chunk, numerator),
        transcript_initial_state=transcript_initial_state,
    )

    def synthesize(instances):
        out = {}
        for t in range(T):
            A, B, C = ADV[t]
            x = instances[t][0]
            a = [0] * n
            b = [0] * n
            c = [0] * n
            a[0] = x
            a[1] = (-5) % bn254.R
            a[2] = 1
            b[3] = 1
            c[4] = 1
            out[A], out[B], out[C] = a, b, c
        return out

    perms = [
        PermutationInfo(
            columns=list(ADV[t]), sigma_polys=[S_A, S_B, S_C], chunk=3
        )
        for t in range(T)
    ]
    pk = ProvingKey(
        protocol=protocol,
        srs=srs,
        fixed_values=fixed,
        permutation=perms[0],
        permutations=perms,
        advice_phases=[
            [p for t in range(T) for p in ADV[t]],
            [],
            Z + [RAND] if zk else list(Z),
        ],
        z_polys=list(Z),
        instance_polys=INSTANCE,
        synthesize=synthesize,
        extended_k=k + (3 if zk else 2),
        zk_blinding=BLINDING if zk else 0,
        random_poly=RAND,
    )
    return protocol, pk


def build_fibonacci(k: int, srs: Srs):
    """A rotation-heavy test circuit: one advice column `a` under the gate
      q(X) * (a(wX) - a(X) - a(X/w)) = 0
    (Fibonacci recurrence via next/prev rotations).  No permutation argument,
    no instances — exercises negative rotations through the whole pipeline
    (domain.rotate_scalar, multiopen shift sets, transcript orders).
    """
    domain = Domain.new(k)
    n = domain.n

    # poly layout: 0 q (fixed); 1 a (advice); quotient 2
    Q, A = 0, 1
    P = lambda idx, rot=0: Polynomial(Query.new(idx, rot))
    gate = P(Q) * (P(A, 1) - P(A) - P(A, -1))
    numerator = DistributePowers((gate,), Challenge(3))
    num_chunk = max(1, gate.degree() - 1)

    evaluations = [Query.new(A), Query.new(A, 1), Query.new(A, -1), Query.new(Q)]
    queries = [
        Query.new(A),
        Query.new(A, 1),
        Query.new(A, -1),
        Query.new(Q),
        Query.new(2),
    ]

    fib = [1, 1]
    for _ in range(n - 2):
        fib.append((fib[-1] + fib[-2]) % bn254.R)
    q_vals = [0] + [1] * (n - 3) + [0, 0]  # recurrence holds on rows 1..n-3

    fixed = {Q: q_vals}
    preprocessed = [srs.commit(lagrange_to_coeffs(q_vals, domain))]

    protocol = PlonkProtocol(
        domain=domain,
        preprocessed=preprocessed,
        num_instance=[],
        num_witness=[1, 0, 0],
        num_challenge=[1, 2, 1],
        evaluations=evaluations,
        queries=queries,
        quotient=QuotientPolynomial(1, num_chunk, numerator),
        transcript_initial_state=(
            int.from_bytes(keccak256(f"svtpu-fibonacci-k{k}".encode()), "big")
            % bn254.R
        ),
    )

    pk = ProvingKey(
        protocol=protocol,
        srs=srs,
        fixed_values=fixed,
        permutation=None,
        advice_phases=[[A], [], []],
        z_polys=[],
        instance_polys=[],
        synthesize=lambda instances: {A: list(fib)},
        extended_k=k + 2,
    )
    return protocol, pk


def build_lookup_plonk(k: int, srs: Srs, range_bits: int = 4, zk: bool = False):
    """StandardPlonk extended with a 2-expression range-square lookup:
      (q_range * a, q_range * b) IN (TABLE_V, TABLE_SQ)
    where TABLE rows are (v, v^2) for v in 0..2^range_bits-1 (plus (0, 0)
    padding).  Exercises the halo2 v0.3 lookup argument end-to-end — theta
    compression, permuted columns, grand product — alongside the gate and
    permutation arguments, mirroring the reference's MainGateWithRange role
    (system/halo2/test/circuit/maingate.rs:15-113; constraint shapes per
    system/halo2.rs:662-727, both zk branches).
    """
    assert (1 << k) >= (1 << range_bits) and k >= 4
    domain = Domain.new(k)
    n = domain.n

    # ---- poly index layout (reference ordering: fixed | perm-fixed |
    # instance | advice | lookup permuted | perm z, lookup z | quotient) -----
    Q_A, Q_B, Q_C, Q_AB, CONST, Q_RANGE, TABLE_V, TABLE_SQ = range(8)
    S_A, S_B, S_C = 8, 9, 10
    INSTANCE = 11
    A, B, C = 12, 13, 14
    A_PERM, S_PERM = 15, 16  # lookup permuted input / table
    Z = 17  # permutation grand product
    Z_LK = 18  # lookup grand product
    RAND = 19 if zk else None
    QUOT = 20 if zk else 19

    P = lambda idx, rot=0: Polynomial(Query.new(idx, rot))
    theta, beta, gamma, alpha = Challenge(0), Challenge(1), Challenge(2), Challenge(3)

    gate = (
        P(Q_A) * P(A)
        + P(Q_B) * P(B)
        + P(Q_C) * P(C)
        + P(Q_AB) * P(A) * P(B)
        + P(CONST)
        + P(INSTANCE)
    )

    # permutation constraints (zk=false, single chunk)
    l_0 = CommonLagrange(0)
    one = Constant(1)
    cols = [P(A), P(B), P(C)]
    sigmas = [P(S_A), P(S_B), P(S_C)]
    ident = CommonIdentity()
    perm_l0 = l_0 * (one - P(Z))
    left = P(Z, 1)
    for col, sigma in zip(cols, sigmas):
        left = left * (col + beta * sigma + gamma)
    right = P(Z)
    delta_pow = 1
    for col in cols:
        right = right * (col + beta * Constant(delta_pow) * ident + gamma)
        delta_pow = delta_pow * DELTA % bn254.R
    perm_main = left - right

    # lookup constraints (system/halo2.rs:662-727)
    input_exprs = (P(Q_RANGE) * P(A), P(Q_RANGE) * P(B))
    table_exprs = (P(TABLE_V), P(TABLE_SQ))
    compressed_input = DistributePowers(input_exprs, theta)
    compressed_table = DistributePowers(table_exprs, theta)
    lk_l0 = l_0 * (one - P(Z_LK))
    lk_main = P(Z_LK, 1) * (P(A_PERM) + beta) * (P(S_PERM) + gamma) - P(Z_LK) * (
        compressed_input + beta
    ) * (compressed_table + gamma)
    lk_perm = (P(A_PERM) - P(S_PERM)) * (P(A_PERM) - P(A_PERM, -1))

    if zk:
        rot_last = -(BLINDING + 1)
        l_last = CommonLagrange(rot_last)
        l_blind = None
        for j in range(rot_last + 1, 0):
            term = CommonLagrange(j)
            l_blind = term if l_blind is None else l_blind + term
        l_active = one - l_last - l_blind
        constraints = (
            gate,
            perm_l0,
            l_last * (P(Z) * P(Z) - P(Z)),
            l_active * perm_main,
            lk_l0,
            l_last * (P(Z_LK) * P(Z_LK) - P(Z_LK)),
            l_active * lk_main,
            l_0 * (P(A_PERM) - P(S_PERM)),
            l_active * lk_perm,
        )
    else:
        constraints = (gate, perm_l0, perm_main, lk_l0, lk_main, lk_perm)

    numerator = DistributePowers(constraints, alpha)
    degree = numerator.degree()  # 5 (zk: 6)
    num_chunk = degree - 1

    evaluations = (
        [Query.new(A), Query.new(B), Query.new(C)]
        + [Query.new(i) for i in range(8)]
        + ([Query.new(RAND)] if zk else [])
        + [Query.new(i) for i in (S_A, S_B, S_C)]
        + [Query.new(Z), Query.new(Z, 1)]
        + [
            Query.new(Z_LK),
            Query.new(Z_LK, 1),
            Query.new(A_PERM),
            Query.new(A_PERM, -1),
            Query.new(S_PERM),
        ]
    )
    queries = (
        [Query.new(A), Query.new(B), Query.new(C)]
        + [Query.new(Z), Query.new(Z, 1)]
        + [
            Query.new(Z_LK),
            Query.new(A_PERM),
            Query.new(S_PERM),
            Query.new(A_PERM, -1),
            Query.new(Z_LK, 1),
        ]
        + [Query.new(i) for i in range(8)]
        + [Query.new(i) for i in (S_A, S_B, S_C)]
        + [Query.new(QUOT)]
        + ([Query.new(RAND)] if zk else [])
    )

    # ---- fixed assignments -------------------------------------------------
    fixed = {i: [0] * n for i in range(8)}
    fixed[Q_A][0] = (-1) % bn254.R
    for idx, col in enumerate([Q_A, Q_B, Q_C, Q_AB, CONST], start=1):
        fixed[col][1] = idx
    # lookup rows 8..11 range-check (a, b) = (v, v^2)
    lookup_rows = [8, 9, 10, 11]
    for j in lookup_rows:
        fixed[Q_RANGE][j] = 1
    for v in range(1 << range_bits):
        fixed[TABLE_V][v] = v
        fixed[TABLE_SQ][v] = v * v % bn254.R

    perm_cols = [A, B, C]
    cycles = [[(0, 2), (1, 3), (2, 4)]]
    sigma_values = _sigmas(domain, len(perm_cols), cycles)
    for sp, vals in zip((S_A, S_B, S_C), sigma_values):
        fixed[sp] = vals

    preprocessed = []
    for idx in list(range(8)) + [S_A, S_B, S_C]:
        preprocessed.append(srs.commit(lagrange_to_coeffs(fixed[idx], domain)))

    protocol = PlonkProtocol(
        domain=domain,
        preprocessed=preprocessed,
        num_instance=[1],
        num_witness=[3, 2, 3 if zk else 2],
        num_challenge=[1, 2, 1],
        evaluations=evaluations,
        queries=queries,
        quotient=QuotientPolynomial(1, num_chunk, numerator),
        transcript_initial_state=(
            int.from_bytes(
                keccak256(
                    f"svtpu-lookup-plonk{'-zk' if zk else ''}-k{k}-r{range_bits}".encode()
                ),
                "big",
            )
            % bn254.R
        ),
    )

    def synthesize(instances, range_values=(3, 7, 0, 15)):
        x = instances[0][0]
        a = [0] * n
        b = [0] * n
        c = [0] * n
        a[0] = x
        a[1] = (-5) % bn254.R
        a[2] = 1
        b[3] = 1
        c[4] = 1
        for j, v in zip(lookup_rows, range_values):
            a[j] = v % bn254.R
            b[j] = v * v % bn254.R
        return {A: a, B: b, C: c}

    pk = ProvingKey(
        protocol=protocol,
        srs=srs,
        fixed_values=fixed,
        permutation=PermutationInfo(
            columns=perm_cols, sigma_polys=[S_A, S_B, S_C], chunk=3
        ),
        advice_phases=[
            [A, B, C],
            [A_PERM, S_PERM],
            [Z, Z_LK, RAND] if zk else [Z, Z_LK],
        ],
        z_polys=[Z],
        instance_polys=[INSTANCE],
        synthesize=synthesize,
        extended_k=k + 3,  # degree-5/6 numerator needs 8n evaluation points
        zk_blinding=BLINDING if zk else 0,
        random_poly=RAND,
        lookups=[
            LookupInfo(
                input_exprs=list(input_exprs),
                table_exprs=list(table_exprs),
                permuted_input_poly=A_PERM,
                permuted_table_poly=S_PERM,
                z_poly=Z_LK,
                theta_challenge=0,
            )
        ],
    )
    return protocol, pk


def build_mock_accumulator_plonk(k: int, srs: Srs):
    """A circuit whose 16 instance values are the 4x68-bit limbs of a VALID
    KZG accumulator — the reference's mock-accumulator recursion fixture
    (system/halo2/test/kzg.rs:30-46): lhs = tau*G = srs.g[1], rhs = G =
    srs.g[0], so e(lhs, g2) * e(rhs, -s_g2) == 1 holds by construction.

    Gate: q_i * (a - instance) = 0 copies the limbs into an advice column
    (the MainGateWithRange analogue of exposing them).  The protocol carries
    accumulator_indices = [(0,0)..(0,15)], so the verifier decodes the old
    accumulator from the instances (proof.rs:146-157) and decide_all checks
    it alongside the fresh one.

    Returns (protocol, pk, instance_limbs).
    """
    from snark_verifier_tpu.pcs.kzg.accumulator import fe_to_limbs

    domain = Domain.new(k)
    n = domain.n
    assert n >= 17  # 16 limb rows + one free row keeping the quotient nonzero

    # limbs of (tau*G, G) in the reference's order [lhs.x, lhs.y, rhs.x, rhs.y]
    lhs, rhs = srs.g[1], srs.g[0]
    limbs = []
    for coord in (lhs[0], lhs[1], rhs[0], rhs[1]):
        limbs.extend(fe_to_limbs(coord))

    # poly layout: fixed q_i = 0; instance = 1; advice a = 2; quotient = 3
    Q_I, INSTANCE, A, QUOT = 0, 1, 2, 3
    P = lambda idx, rot=0: Polynomial(Query.new(idx, rot))
    gate = P(Q_I) * (P(A) - P(INSTANCE))
    numerator = DistributePowers((gate,), Challenge(3))

    evaluations = [Query.new(A), Query.new(Q_I)]
    queries = [Query.new(A), Query.new(Q_I), Query.new(QUOT)]

    q_vals = [1] * 16 + [0] * (n - 16)
    fixed = {Q_I: q_vals}
    preprocessed = [srs.commit(lagrange_to_coeffs(q_vals, domain))]

    protocol = PlonkProtocol(
        domain=domain,
        preprocessed=preprocessed,
        num_instance=[16],
        num_witness=[1, 0, 0],
        num_challenge=[1, 2, 1],
        evaluations=evaluations,
        queries=queries,
        quotient=QuotientPolynomial(1, max(1, numerator.degree() - 1), numerator),
        transcript_initial_state=(
            int.from_bytes(keccak256(f"svtpu-mock-accumulator-k{k}".encode()), "big")
            % bn254.R
        ),
        accumulator_indices=[[(0, i) for i in range(16)]],
    )

    def synthesize(instances):
        a = [0] * n
        for j, v in enumerate(instances[0]):
            a[j] = v % bn254.R
        # an unconstrained nonzero cell so a(X) != instance(X) as polynomials
        # (otherwise the quotient is identically zero and its commitment
        # would be the identity point, which transcripts reject)
        a[16] = 1
        return {A: a}

    pk = ProvingKey(
        protocol=protocol,
        srs=srs,
        fixed_values=fixed,
        permutation=None,
        advice_phases=[[A], [], []],
        z_polys=[],
        instance_polys=[INSTANCE],
        synthesize=synthesize,
        extended_k=k + 2,
    )
    return protocol, pk, limbs


def _sigmas(domain, num_cols, cycles):
    """sigma column values: identity mapping with cycle rotations applied."""
    n = domain.n
    delta_pows = [pow(DELTA, c, bn254.R) for c in range(num_cols)]
    # identity layout tag(col, row) = delta^col * omega^row, vectorized on
    # the native kernels at scale (2^21-row builder circuits)
    from snark_verifier_tpu.util import frvec

    if frvec.available() and n >= 4096:
        base = frvec.FrVec.pow_series(domain.gen, n)
        sigma = [base.scale(delta_pows[c]).to_ints() for c in range(num_cols)]
    else:
        omega_pows = []
        acc = 1
        for _ in range(n):
            omega_pows.append(acc)
            acc = acc * domain.gen % bn254.R
        sigma = [
            [delta_pows[c] * omega_pows[j] % bn254.R for j in range(n)]
            for c in range(num_cols)
        ]
    for cycle in cycles:
        # sigma(cell_i) = tag(cell_{i+1}); cycles are disjoint, so the
        # identity tags can be read off sigma before this cycle's writes
        tags = [sigma[c][j] for c, j in cycle]
        for (c, j), next_tag in zip(cycle, tags[1:] + tags[:1]):
            sigma[c][j] = next_tag
    return sigma
