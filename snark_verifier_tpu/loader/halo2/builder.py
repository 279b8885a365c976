"""Dynamic standard-plonk circuit builder behind the Halo2Loader.

Plays the role halo2_proofs' ConstraintSystem + layouter play for the
reference's in-circuit verifier (loader/halo2/loader.rs:22-63 builds on an
externally-synthesized circuit; here the circuit IS built by the loader run):
every chip operation appends a row to a fixed-shape standard-plonk gate

    q_a*a + q_b*b + q_c*c + q_ab*a*b + constant + instance = 0

over three advice columns with a copy-constraint permutation argument, plus
an optional 16-bit range-check lookup column for the non-native integer
gadget.  `build()` compiles the recorded rows into the same
(protocol, ProvingKey) pair the static test circuits produce
(system/halo2/circuits.py), so circuits synthesized by the loader run
through the identical host prover and all verifier backends.
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256


@dataclass(frozen=True)
class Cell:
    """One advice cell: column 0..3 (a, b, c, r), absolute row."""

    col: int
    row: int


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        # iterative with path compression: cycles can chain millions deep in
        # at-scale circuits (recursion would blow the interpreter stack)
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            self.parent[rx] = ry

    def groups(self):
        out = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return [g for g in out.values() if len(g) > 1]


class CircuitBuilder:
    """Row-appending constraint recorder; values are python Fr ints."""

    def __init__(self, range_bits: int = 0):
        self.rows = []  # (qa, qb, qc, qab, const, a, b, c)
        self.instances = []  # [(row, value)] exposed publics, in order
        self.range_bits = range_bits
        self.range_cells = []  # rows whose `r` cell is range-checked
        self._uf = _UnionFind()
        self._witness_cursor = None  # (row, next free col) for packed wits
        self._relocated = False

    # -- row primitives ------------------------------------------------------

    def new_row(self, qa=0, qb=0, qc=0, qab=0, const=0, a=0, b=0, c=0,
                copy_a: Cell | None = None, copy_b: Cell | None = None,
                copy_c: Cell | None = None, range_a: bool = False) -> int:
        """Append a gate row; copy_* add an equality constraint between the
        new cell and an existing one (the caller passes the same value).
        `range_a` additionally range-checks the a-cell via the lookup — a
        fused gate+lookup row (the integer gadget's decompose-and-fold)."""
        R = bn254.R
        row = len(self.rows)
        self.rows.append(
            (qa % R, qb % R, qc % R, qab % R, const % R, a % R, b % R, c % R)
        )
        for col, src in enumerate((copy_a, copy_b, copy_c)):
            if src is not None:
                self._uf.union((col, row), (src.col, src.row))
        if range_a:
            assert self.range_bits > 0, "builder built without a range table"
            self.range_cells.append(row)
        return row

    def witness_cell(self, value: int) -> Cell:
        """An unconstrained cell (selector-free row, packed 3 per row)."""
        value %= bn254.R
        if self._witness_cursor is not None:
            row, col = self._witness_cursor
            vals = list(self.rows[row])
            vals[5 + col] = value
            self.rows[row] = tuple(vals)
            self._witness_cursor = (row, col + 1) if col + 1 < 3 else None
            return Cell(col, row)
        row = self.new_row(a=value)
        self._witness_cursor = (row, 1)
        return Cell(0, row)

    def constant_cell(self, value: int) -> Cell:
        """A cell constrained to equal `value`: a - value = 0."""
        row = self.new_row(qa=1, const=-value, a=value)
        return Cell(0, row)

    def copy(self, c1: Cell, c2: Cell):
        self._uf.union((c1.col, c1.row), (c2.col, c2.row))

    def expose_public(self, cell: Cell, value: int):
        """instance[row] - a = 0 with a copied from `cell`."""
        row = self.new_row(qa=-1, a=value, copy_a=cell)
        self.instances.append((row, value % bn254.R))

    def range_cell(self, value: int) -> Cell:
        """A cell constrained via lookup to be < 2^range_bits."""
        assert self.range_bits > 0, "builder built without a range table"
        row = self.new_row(a=value)
        self.range_cells.append(row)
        return Cell(0, row)

    # -- satisfaction check (halo2 MockProver analogue) ------------------------

    def check_witness(self) -> list:
        """Direct satisfaction check of the recorded rows: gate identity per
        row, equal values inside every copy-constraint group, range cells in
        bounds.  Returns a list of human-readable failures (empty = sat).
        This is the halo2 MockProver analogue — full verification without
        proving, used while synthesizing large in-circuit verifiers."""
        R = bn254.R
        instance = dict(self.instances)
        failures = []
        for row, (qa, qb, qc, qab, const, a, b, c) in enumerate(self.rows):
            v = (
                qa * a + qb * b + qc * c + qab * a % R * b + const
                + instance.get(row, 0)
            ) % R
            if v:
                failures.append(f"gate unsatisfied at row {row}")
        for grp in self._uf.groups():
            vals = {self.rows[row][5 + col] for col, row in grp}
            if len(vals) > 1:
                failures.append(f"copy constraint violated: {sorted(grp)}")
        for row in self.range_cells:
            if self.rows[row][5] >= (1 << self.range_bits):
                failures.append(f"range cell out of bounds at row {row}")
        return failures

    def _relocate_instance_rows(self):
        """Move exposure rows to the front: the prover/verifier convention
        lays instance value i at row i (prover.py:56-60).  Sound because no
        builder gate spans rows (rotations appear only in the prover-
        materialized permutation/lookup columns)."""
        if self._relocated or not self.instances:
            self._relocated = True
            return
        exposure = [row for row, _ in self.instances]
        exposure_set = set(exposure)
        order = exposure + [r for r in range(len(self.rows)) if r not in exposure_set]
        old_to_new = {old: new for new, old in enumerate(order)}
        self.rows = [self.rows[old] for old in order]
        self.instances = [
            (old_to_new[row], v) for row, v in self.instances
        ]
        self.range_cells = [old_to_new[r] for r in self.range_cells]
        uf = _UnionFind()
        for (col, row), parent in list(self._uf.parent.items()):
            pcol, prow = self._uf.find((col, row))
            uf.union((col, old_to_new[row]), (pcol, old_to_new[prow]))
        self._uf = uf
        self._relocated = True

    # -- compile -------------------------------------------------------------

    def k(self) -> int:
        n_rows = len(self.rows) + 1
        if self.range_bits:
            n_rows = max(n_rows, (1 << self.range_bits) + 1)
        k = max(3, (n_rows - 1).bit_length())
        return k

    def build(self, srs, name: str = "halo2-loader-circuit",
              accumulator_indices=None):
        """Compile to (protocol, ProvingKey).  Layout mirrors
        build_standard_plonk (circuits.py:82-207) with a dynamic row count
        and, when range_bits > 0, one halo2-v0.3 lookup argument.

        `accumulator_indices` marks instance positions carrying KZG
        accumulator limbs (aggregation circuits expose the folded
        accumulator as (0, 0..16); sdk halo2/aggregation.rs:387-402) so
        downstream verifiers decode + decide the old accumulator."""
        from snark_verifier_tpu.system.halo2.circuits import (
            DELTA,
            LookupInfo,
            PermutationInfo,
            ProvingKey,
            _sigmas,
        )
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

        R = bn254.R
        self._relocate_instance_rows()
        k = self.k()
        assert srs.k >= k, f"srs too small: need k={k}"
        domain = Domain.new(k)
        n = domain.n
        has_lookup = self.range_bits > 0

        # poly layout mirrors build_lookup_plonk (circuits.py:287-296):
        # fixed 0..4 (qa qb qc qab const) [+5 q_range, 6 table] | perm-fixed
        # s_a s_b s_c | instance | advice a b c [| lookup a' s'] | perm z
        # [| lookup z] | quotient
        nfix = 7 if has_lookup else 5
        S_A, S_B, S_C = nfix, nfix + 1, nfix + 2
        INSTANCE = nfix + 3
        A, B, C = INSTANCE + 1, INSTANCE + 2, INSTANCE + 3
        if has_lookup:
            A_PERM, S_PERM = C + 1, C + 2
            Z = C + 3
            Z_LK = Z + 1
            QUOT = Z + 2
        else:
            Z = C + 1
            QUOT = Z + 1

        P = lambda idx, rot=0: Polynomial(Query.new(idx, rot))
        theta, beta, gamma, alpha = (
            Challenge(0),
            Challenge(1),
            Challenge(2),
            Challenge(3),
        )

        gate = (
            P(0) * P(A)
            + P(1) * P(B)
            + P(2) * P(C)
            + P(3) * P(A) * P(B)
            + P(4)
            + P(INSTANCE)
        )

        l_0 = CommonLagrange(0)
        one = Constant(1)
        ident = CommonIdentity()
        cols = [P(A), P(B), P(C)]
        sigmas = [P(S_A), P(S_B), P(S_C)]
        perm_l0 = l_0 * (one - P(Z))
        left = P(Z, 1)
        for col, sigma in zip(cols, sigmas):
            left = left * (col + beta * sigma + gamma)
        right = P(Z)
        delta_pow = 1
        for col in cols:
            right = right * (col + beta * Constant(delta_pow) * ident + gamma)
            delta_pow = delta_pow * DELTA % R
        perm_main = left - right

        constraints = [gate, perm_l0, perm_main]
        input_expr = table_expr = None
        if has_lookup:
            Q_RANGE, TABLE = 5, 6
            input_expr = P(Q_RANGE) * P(A)
            table_expr = P(TABLE)
            # halo2 v0.3 lookup constraints, same shapes/order as
            # build_lookup_plonk (circuits.py:327-340)
            lk_l0 = l_0 * (one - P(Z_LK))
            lk_main = P(Z_LK, 1) * (P(A_PERM) + beta) * (P(S_PERM) + gamma) - P(
                Z_LK
            ) * (input_expr + beta) * (table_expr + gamma)
            lk_perm = (P(A_PERM) - P(S_PERM)) * (P(A_PERM) - P(A_PERM, -1))
            constraints += [lk_l0, lk_main, lk_perm]

        numerator = DistributePowers(tuple(constraints), alpha)
        degree = numerator.degree()
        num_chunk = degree - 1

        evaluations = (
            [Query.new(A), Query.new(B), Query.new(C)]
            + [Query.new(i) for i in range(nfix)]
            + [Query.new(i) for i in (S_A, S_B, S_C)]
            + [Query.new(Z), Query.new(Z, 1)]
        )
        queries = (
            [Query.new(A), Query.new(B), Query.new(C)]
            + [Query.new(Z), Query.new(Z, 1)]
        )
        if has_lookup:
            evaluations += [
                Query.new(Z_LK),
                Query.new(Z_LK, 1),
                Query.new(A_PERM),
                Query.new(A_PERM, -1),
                Query.new(S_PERM),
            ]
            queries += [
                Query.new(Z_LK),
                Query.new(A_PERM),
                Query.new(S_PERM),
                Query.new(A_PERM, -1),
                Query.new(Z_LK, 1),
            ]
        queries += (
            [Query.new(i) for i in range(nfix)]
            + [Query.new(i) for i in (S_A, S_B, S_C)]
            + [Query.new(QUOT)]
        )

        # ---- fixed assignments ---------------------------------------------
        fixed = {i: [0] * n for i in range(nfix)}
        for row, (qa, qb, qc, qab, const, _, _, _) in enumerate(self.rows):
            fixed[0][row], fixed[1][row], fixed[2][row] = qa, qb, qc
            fixed[3][row], fixed[4][row] = qab, const
        if has_lookup:
            for row in self.range_cells:
                fixed[5][row] = 1
            for v in range(1 << self.range_bits):
                fixed[6][v] = v

        perm_cols = [A, B, C]
        cycles = [
            [(col, row) for (col, row) in grp] for grp in self._uf.groups()
        ]
        sigma_values = _sigmas(domain, len(perm_cols), cycles)
        for sp, vals in zip((S_A, S_B, S_C), sigma_values):
            fixed[sp] = vals

        from snark_verifier_tpu.system.halo2.srs import commit_lagrange

        preprocessed = []
        for idx in list(range(nfix)) + [S_A, S_B, S_C]:
            preprocessed.append(commit_lagrange(srs, fixed[idx], domain))

        transcript_initial_state = (
            int.from_bytes(keccak256(f"svtpu-{name}-k{k}".encode()), "big") % R
        )

        num_witness = [3, 2, 2] if has_lookup else [3, 0, 1]
        num_challenge = [1, 2, 1]

        protocol = PlonkProtocol(
            domain=domain,
            preprocessed=preprocessed,
            num_instance=[len(self.instances)],
            num_witness=num_witness,
            num_challenge=num_challenge,
            evaluations=evaluations,
            queries=queries,
            quotient=QuotientPolynomial(1, num_chunk, numerator),
            transcript_initial_state=transcript_initial_state,
            accumulator_indices=accumulator_indices or [],
        )

        col_vals = {col: [0] * n for col in range(3)}
        for row, (_, _, _, _, _, a, b, c) in enumerate(self.rows):
            col_vals[0][row], col_vals[1][row], col_vals[2][row] = a, b, c
        instance_rows = list(self.instances)

        def synthesize(instances):
            got = list(instances[0]) if instances else []
            want = [v for _, v in instance_rows]
            assert got == want, "builder circuits fix their instance values"
            return {A: col_vals[0], B: col_vals[1], C: col_vals[2]}

        lookups = None
        if has_lookup:
            lookups = [
                LookupInfo(
                    input_exprs=[input_expr],
                    table_exprs=[table_expr],
                    permuted_input_poly=A_PERM,
                    permuted_table_poly=S_PERM,
                    z_poly=Z_LK,
                    theta_challenge=0,
                )
            ]

        pk = ProvingKey(
            protocol=protocol,
            srs=srs,
            fixed_values=fixed,
            permutation=PermutationInfo(
                columns=perm_cols, sigma_polys=[S_A, S_B, S_C], chunk=3
            ),
            advice_phases=(
                [[A, B, C], [A_PERM, S_PERM], [Z, Z_LK]]
                if has_lookup
                else [[A, B, C], [], [Z]]
            ),
            z_polys=[Z],
            instance_polys=[INSTANCE],
            synthesize=synthesize,
            extended_k=k + (degree - 1).bit_length(),
            lookups=lookups,
        )
        return protocol, pk

    def instance_values(self):
        return [v for _, v in self.instances]

    def instance_lagrange(self, n):
        vals = [0] * n
        for row, v in self.instances:
            vals[row] = v
        return vals


class StreamingChecker(CircuitBuilder):
    """Check-only builder: every row is verified the moment it is emitted
    and then discarded (only cell values are kept, for copy checks).

    The full-scale in-circuit verifier runs to millions of rows — too large
    to hold as python tuples or to prove with the host prover, but its
    satisfiability is exactly checkable this way (the halo2 MockProver role
    at aggregation scale).  `build()` is unavailable; synthesize with a
    regular CircuitBuilder for circuits meant to be proven."""

    def __init__(self, range_bits: int = 0):
        super().__init__(range_bits)
        self._vals = ([], [], [])
        self._n = 0
        self.failures: list = []

    def new_row(self, qa=0, qb=0, qc=0, qab=0, const=0, a=0, b=0, c=0,
                copy_a: Cell | None = None, copy_b: Cell | None = None,
                copy_c: Cell | None = None, range_a: bool = False) -> int:
        R = bn254.R
        a, b, c = a % R, b % R, c % R
        row = self._n
        self._n += 1
        instance = self._pending_instance if getattr(self, "_pending_instance", None) else 0
        v = (qa * a + qb * b + qc * c + qab * a % R * b + const + instance) % R
        if v:
            self.failures.append(f"gate unsatisfied at row {row}")
        for val, src in ((a, copy_a), (b, copy_b), (c, copy_c)):
            if src is not None and self._vals[src.col][src.row] != val:
                self.failures.append(f"copy constraint violated at row {row}")
        if range_a:
            assert self.range_bits > 0, "builder built without a range table"
            if not 0 <= a < (1 << self.range_bits):
                self.failures.append(f"range cell out of bounds at row {row}")
        for i, val in enumerate((a, b, c)):
            self._vals[i].append(val)
        return row

    def witness_cell(self, value: int) -> Cell:
        value %= bn254.R
        if self._witness_cursor is not None:
            row, col = self._witness_cursor
            self._vals[col][row] = value
            self._witness_cursor = (row, col + 1) if col + 1 < 3 else None
            return Cell(col, row)
        row = self.new_row(a=value)
        self._witness_cursor = (row, 1)
        return Cell(0, row)

    def copy(self, c1: Cell, c2: Cell):
        if self._vals[c1.col][c1.row] != self._vals[c2.col][c2.row]:
            self.failures.append(f"copy constraint violated: {c1} vs {c2}")

    def expose_public(self, cell: Cell, value: int):
        self._pending_instance = value % bn254.R
        super().expose_public(cell, value)
        self._pending_instance = 0
        self.instances[-1] = (self.instances[-1][0], value % bn254.R)

    def range_cell(self, value: int) -> Cell:
        assert self.range_bits > 0
        if not 0 <= value < (1 << self.range_bits):
            self.failures.append(f"range cell out of bounds at row {self._n}")
        row = self.new_row(a=value)
        return Cell(0, row)

    def check_witness(self) -> list:
        return self.failures

    @property
    def n_rows(self):
        return self._n

    def build(self, srs, name: str = ""):
        raise NotImplementedError("StreamingChecker is check-only")
