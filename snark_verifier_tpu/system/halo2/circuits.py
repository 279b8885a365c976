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


def build_standard_plonk(k: int, srs: Srs):
    """Compile StandardPlonk at size 2^k; returns (protocol, pk)."""
    assert srs.k >= k
    domain = Domain.new(k)
    n = domain.n

    # ---- poly index layout -------------------------------------------------
    # fixed: 0 q_a, 1 q_b, 2 q_c, 3 q_ab, 4 constant; perm-fixed: 5,6,7
    # instance: 8; advice: 9 a, 10 b, 11 c; permutation z: 12; quotient: 13
    Q_A, Q_B, Q_C, Q_AB, CONST = range(5)
    S_A, S_B, S_C = 5, 6, 7
    INSTANCE = 8
    A, B, C = 9, 10, 11
    Z = 12

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

    # permutation constraints, zk=false, single chunk of all 3 columns
    # (system/halo2.rs:567-660 with zk=false, zs.len()==1)
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
    for i, col in enumerate(cols):
        right = right * (col + beta * Constant(delta_pow) * ident + gamma)
        delta_pow = delta_pow * DELTA % bn254.R
    perm_main = left - right

    numerator = DistributePowers((gate, perm_l0, perm_main), alpha)
    degree = numerator.degree()  # 4
    num_chunk = degree - 1

    evaluations = (
        [Query.new(A), Query.new(B), Query.new(C)]
        + [Query.new(i) for i in range(5)]
        + [Query.new(i) for i in (S_A, S_B, S_C)]
        + [Query.new(Z), Query.new(Z, 1)]
    )
    queries = (
        [Query.new(A), Query.new(B), Query.new(C)]
        + [Query.new(Z), Query.new(Z, 1)]
        + [Query.new(i) for i in range(5)]
        + [Query.new(i) for i in (S_A, S_B, S_C)]
        + [Query.new(13)]
    )

    # ---- fixed assignments (standard.rs:96-122) ---------------------------
    fixed = {i: [0] * n for i in range(5)}
    fixed[Q_A][0] = (-1) % bn254.R
    for idx, col in enumerate([Q_A, Q_B, Q_C, Q_AB, CONST], start=1):
        fixed[col][1] = idx

    # copy constraints: a[2] == b[3], a[2] == c[4] -> cycle (A,2)->(B,3)->(C,4)
    perm_cols = [A, B, C]
    cycles = [[(0, 2), (1, 3), (2, 4)]]  # (column position in perm_cols, row)
    sigma_values = _sigmas(domain, len(perm_cols), cycles)
    for sp, vals in zip((S_A, S_B, S_C), sigma_values):
        fixed[sp] = vals

    # ---- preprocessed commitments -----------------------------------------
    preprocessed = []
    for idx in [Q_A, Q_B, Q_C, Q_AB, CONST, S_A, S_B, S_C]:
        coeffs = lagrange_to_coeffs(fixed[idx], domain)
        preprocessed.append(srs.commit(coeffs))

    transcript_initial_state = (
        int.from_bytes(keccak256(f"svtpu-standard-plonk-k{k}".encode()), "big")
        % bn254.R
    )

    protocol = PlonkProtocol(
        domain=domain,
        preprocessed=preprocessed,
        num_instance=[1],
        num_witness=[3, 0, 1],
        num_challenge=[1, 2, 1],
        evaluations=evaluations,
        queries=queries,
        quotient=QuotientPolynomial(1, num_chunk, numerator),
        transcript_initial_state=transcript_initial_state,
    )

    def synthesize(instances):
        x = instances[0][0]
        a = [0] * n
        b = [0] * n
        c = [0] * n
        a[0] = x
        a[1] = (-5) % bn254.R
        a[2] = 1
        b[3] = 1
        c[4] = 1
        return {A: a, B: b, C: c}

    pk = ProvingKey(
        protocol=protocol,
        srs=srs,
        fixed_values=fixed,
        permutation=PermutationInfo(
            columns=perm_cols, sigma_polys=[S_A, S_B, S_C], chunk=3
        ),
        advice_phases=[[A, B, C], [], [Z]],
        z_polys=[Z],
        instance_polys=[INSTANCE],
        synthesize=synthesize,
        extended_k=k + 2,
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


def _sigmas(domain, num_cols, cycles):
    """sigma column values: identity mapping with cycle rotations applied."""
    n = domain.n
    # tag(col, row) = delta^col * omega^row
    omega_pows = []
    acc = 1
    for _ in range(n):
        omega_pows.append(acc)
        acc = acc * domain.gen % bn254.R
    delta_pows = [pow(DELTA, c, bn254.R) for c in range(num_cols)]
    sigma = [[delta_pows[c] * omega_pows[j] % bn254.R for j in range(n)] for c in range(num_cols)]
    for cycle in cycles:
        # sigma(cell_i) = tag(cell_{i+1})
        tags = [delta_pows[c] * omega_pows[j] % bn254.R for c, j in cycle]
        for (c, j), next_tag in zip(cycle, tags[1:] + tags[:1]):
            sigma[c][j] = next_tag
    return sigma
