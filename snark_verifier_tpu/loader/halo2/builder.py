"""Dynamic standard-plonk circuit builder behind the Halo2Loader.

Plays the role halo2_proofs' ConstraintSystem + layouter play for the
reference's in-circuit verifier (loader/halo2/loader.rs:22-63 builds on an
externally-synthesized circuit; here the circuit IS built by the loader run):
every chip operation appends a row to a fixed-shape 5-wire gate

    q_a*a + q_b*b + q_c*c + q_d*d + q_e*e + q_ab*a*b + constant + instance = 0

over five advice columns with a copy-constraint permutation argument, plus
an optional range-check lookup column for the non-native integer gadget.
The 5-wire shape matches the reference shim's MainGate (shim.rs:231-315):
accumulate chains fold three fresh linear terms per row (d = carry in,
e = carry out) and sum-of-products chains fold one product per row with the
accumulator riding the d/e wires — roughly halving rows vs the previous
3-wire gate.  `build()` compiles the recorded rows into the same
(protocol, ProvingKey) pair the static test circuits produce
(system/halo2/circuits.py), so circuits synthesized by the loader run
through the identical host prover and all verifier backends.
"""

from __future__ import annotations

from dataclasses import dataclass

from snark_verifier_tpu.util import bn254
from snark_verifier_tpu.util.keccak import keccak256

NCOLS = 5  # advice columns a, b, c, d, e


@dataclass(frozen=True)
class Cell:
    """One advice cell: column 0..4 (a, b, c, d, e), absolute row."""

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
    """Row-appending constraint recorder; values are python Fr ints.

    Row tuple: (qa, qb, qc, qd, qe, qab, const, a, b, c, d, e).
    """

    def __init__(self, range_bits: int = 0):
        self.rows = []  # 12-tuples (selectors + advice)
        self.instances = []  # [(row, value)] exposed publics, in order
        self.range_bits = range_bits
        self.range_cells = []  # rows whose `a` cell is range-checked
        self.range_cells_b = []  # rows whose `b` cell is range-checked
        self._uf = _UnionFind()
        self._witness_cursor = None  # (row, next free col) for packed wits
        self._relocated = False

    # -- row primitives ------------------------------------------------------

    def new_row(self, qa=0, qb=0, qc=0, qd=0, qe=0, qab=0, const=0,
                a=0, b=0, c=0, d=0, e=0,
                copy_a: Cell | None = None, copy_b: Cell | None = None,
                copy_c: Cell | None = None, copy_d: Cell | None = None,
                copy_e: Cell | None = None, range_a: bool = False,
                range_b: bool = False) -> int:
        """Append a gate row; copy_* add an equality constraint between the
        new cell and an existing one (the caller passes the same value).
        `range_a`/`range_b` additionally range-check the a-/b-cell via the
        two lookup arguments — fused gate+lookup rows (the integer gadget's
        decompose-and-fold packs two chunks per row)."""
        R = bn254.R
        row = len(self.rows)
        self.rows.append(
            (qa % R, qb % R, qc % R, qd % R, qe % R, qab % R, const % R,
             a % R, b % R, c % R, d % R, e % R)
        )
        for col, src in enumerate((copy_a, copy_b, copy_c, copy_d, copy_e)):
            if src is not None:
                self._uf.union((col, row), (src.col, src.row))
        if range_a:
            assert self.range_bits > 0, "builder built without a range table"
            self.range_cells.append(row)
        if range_b:
            assert self.range_bits > 0, "builder built without a range table"
            self.range_cells_b.append(row)
        return row

    def witness_cell(self, value: int) -> Cell:
        """An unconstrained cell (selector-free row, packed 5 per row)."""
        value %= bn254.R
        if self._witness_cursor is not None:
            row, col = self._witness_cursor
            vals = list(self.rows[row])
            vals[7 + col] = value
            self.rows[row] = tuple(vals)
            self._witness_cursor = (row, col + 1) if col + 1 < NCOLS else None
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

    @staticmethod
    def _gate_value(row_vals, instance):
        R = bn254.R
        qa, qb, qc, qd, qe, qab, const, a, b, c, d, e = row_vals
        return (
            qa * a + qb * b + qc * c + qd * d + qe * e
            + qab * a % R * b + const + instance
        ) % R

    def check_witness(self) -> list:
        """Direct satisfaction check of the recorded rows: gate identity per
        row, equal values inside every copy-constraint group, range cells in
        bounds.  Returns a list of human-readable failures (empty = sat).
        This is the halo2 MockProver analogue — full verification without
        proving, used while synthesizing large in-circuit verifiers."""
        instance = dict(self.instances)
        failures = []
        for row, vals in enumerate(self.rows):
            if self._gate_value(vals, instance.get(row, 0)):
                failures.append(f"gate unsatisfied at row {row}")
        for grp in self._uf.groups():
            vals = {self.rows[row][7 + col] for col, row in grp}
            if len(vals) > 1:
                failures.append(f"copy constraint violated: {sorted(grp)}")
        for row in self.range_cells:
            if self.rows[row][7] >= (1 << self.range_bits):
                failures.append(f"range cell out of bounds at row {row}")
        for row in self.range_cells_b:
            if self.rows[row][8] >= (1 << self.range_bits):
                failures.append(f"range-b cell out of bounds at row {row}")
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
        self.range_cells_b = [old_to_new[r] for r in self.range_cells_b]
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
        """Compile to (protocol, ProvingKey): the 5-wire gate, a 5-column
        permutation argument, and (when range_bits > 0) one halo2-v0.3
        lookup argument on the a-column.

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

        # poly layout (reference ordering): fixed 0..6 (qa qb qc qd qe qab
        # const) [+7 q_range_a, 8 q_range_b, 9 table] | perm-fixed s_a..s_e
        # | instance | advice a..e [| lookup a1' s1' a2' s2'] | perm z
        # [| lookup z1 z2] | quotient
        NSEL = 7
        nfix = NSEL + 3 if has_lookup else NSEL
        SIG = list(range(nfix, nfix + NCOLS))
        INSTANCE = nfix + NCOLS
        ADV = list(range(INSTANCE + 1, INSTANCE + 1 + NCOLS))
        nxt = ADV[-1] + 1
        if has_lookup:
            A_PERM, S_PERM, A_PERM2, S_PERM2 = nxt, nxt + 1, nxt + 2, nxt + 3
            Z = nxt + 4
            Z_LK, Z_LK2 = Z + 1, Z + 2
            QUOT = Z + 3
        else:
            Z = nxt
            QUOT = Z + 1

        P = lambda idx, rot=0: Polynomial(Query.new(idx, rot))
        theta, beta, gamma, alpha = (
            Challenge(0),
            Challenge(1),
            Challenge(2),
            Challenge(3),
        )

        gate = (
            P(0) * P(ADV[0])
            + P(1) * P(ADV[1])
            + P(2) * P(ADV[2])
            + P(3) * P(ADV[3])
            + P(4) * P(ADV[4])
            + P(5) * P(ADV[0]) * P(ADV[1])
            + P(6)
            + P(INSTANCE)
        )

        l_0 = CommonLagrange(0)
        one = Constant(1)
        ident = CommonIdentity()
        cols = [P(i) for i in ADV]
        sigmas = [P(i) for i in SIG]
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
        lookup_meta = []  # (input_expr, table_expr, a_perm, s_perm, z)
        if has_lookup:
            Q_RANGE_A, Q_RANGE_B, TABLE = NSEL, NSEL + 1, NSEL + 2
            table_expr = P(TABLE)
            lookup_meta = [
                (P(Q_RANGE_A) * P(ADV[0]), table_expr, A_PERM, S_PERM, Z_LK),
                (P(Q_RANGE_B) * P(ADV[1]), table_expr, A_PERM2, S_PERM2, Z_LK2),
            ]
            # halo2 v0.3 lookup constraints, same shapes/order as
            # build_lookup_plonk (circuits.py), one triple per lookup
            for input_expr, tbl, ap, sp, z_lk in lookup_meta:
                lk_l0 = l_0 * (one - P(z_lk))
                lk_main = P(z_lk, 1) * (P(ap) + beta) * (P(sp) + gamma) - P(
                    z_lk
                ) * (input_expr + beta) * (tbl + gamma)
                lk_perm = (P(ap) - P(sp)) * (P(ap) - P(ap, -1))
                constraints += [lk_l0, lk_main, lk_perm]

        numerator = DistributePowers(tuple(constraints), alpha)
        degree = numerator.degree()  # 6 (the 5-column permutation product)
        num_chunk = degree - 1

        evaluations = (
            [Query.new(i) for i in ADV]
            + [Query.new(i) for i in range(nfix)]
            + [Query.new(i) for i in SIG]
            + [Query.new(Z), Query.new(Z, 1)]
        )
        queries = (
            [Query.new(i) for i in ADV]
            + [Query.new(Z), Query.new(Z, 1)]
        )
        if has_lookup:
            for _, _, ap, sp, z_lk in lookup_meta:
                evaluations += [
                    Query.new(z_lk),
                    Query.new(z_lk, 1),
                    Query.new(ap),
                    Query.new(ap, -1),
                    Query.new(sp),
                ]
            for _, _, ap, sp, z_lk in lookup_meta:
                queries += [
                    Query.new(z_lk),
                    Query.new(ap),
                    Query.new(sp),
                    Query.new(ap, -1),
                    Query.new(z_lk, 1),
                ]
        queries += (
            [Query.new(i) for i in range(nfix)]
            + [Query.new(i) for i in SIG]
            + [Query.new(QUOT)]
        )

        # ---- fixed assignments ---------------------------------------------
        fixed = {i: [0] * n for i in range(nfix)}
        for row, vals in enumerate(self.rows):
            for s in range(NSEL):
                fixed[s][row] = vals[s]
        if has_lookup:
            for row in self.range_cells:
                fixed[NSEL][row] = 1
            for row in self.range_cells_b:
                fixed[NSEL + 1][row] = 1
            for v in range(1 << self.range_bits):
                fixed[NSEL + 2][v] = v
            # an unused lookup's permuted-input column would be identically
            # zero and commit to the identity (transcripts reject it): point
            # the selector at the spare row, whose a/b values are 1/2 (both
            # in the table for any range_bits >= 2)
            spare_row = len(self.rows)
            if not self.range_cells:
                fixed[NSEL][spare_row] = 1
            if not self.range_cells_b:
                fixed[NSEL + 1][spare_row] = 1

        cycles = [
            [(col, row) for (col, row) in grp] for grp in self._uf.groups()
        ]
        sigma_values = _sigmas(domain, NCOLS, cycles)
        for sp, vals in zip(SIG, sigma_values):
            fixed[sp] = vals

        from snark_verifier_tpu.system.halo2.srs import commit_lagrange

        preprocessed = []
        for idx in list(range(nfix)) + SIG:
            preprocessed.append(commit_lagrange(srs, fixed[idx], domain))

        transcript_initial_state = (
            int.from_bytes(keccak256(f"svtpu-{name}-k{k}-w5".encode()), "big") % R
        )

        num_witness = [NCOLS, 4, 3] if has_lookup else [NCOLS, 0, 1]
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

        col_vals = {col: [0] * n for col in range(NCOLS)}
        for row, vals in enumerate(self.rows):
            for col in range(NCOLS):
                col_vals[col][row] = vals[7 + col]
        # one unconstrained nonzero value per column on the spare row (k()
        # reserves it): sparsely-used wires (d, e) must not commit to the
        # identity point, which transcripts reject (same trick as
        # build_mock_accumulator_plonk's nonzero filler cell)
        spare = len(self.rows)
        for col in range(NCOLS):
            col_vals[col][spare] = col + 1
        instance_rows = list(self.instances)

        def synthesize(instances):
            got = list(instances[0]) if instances else []
            want = [v for _, v in instance_rows]
            assert got == want, "builder circuits fix their instance values"
            return {ADV[col]: col_vals[col] for col in range(NCOLS)}

        lookups = None
        if has_lookup:
            lookups = [
                LookupInfo(
                    input_exprs=[input_expr],
                    table_exprs=[tbl],
                    permuted_input_poly=ap,
                    permuted_table_poly=sp,
                    z_poly=z_lk,
                    theta_challenge=0,
                )
                for input_expr, tbl, ap, sp, z_lk in lookup_meta
            ]

        pk = ProvingKey(
            protocol=protocol,
            srs=srs,
            fixed_values=fixed,
            permutation=PermutationInfo(
                columns=list(ADV), sigma_polys=list(SIG), chunk=NCOLS
            ),
            advice_phases=(
                [list(ADV), [A_PERM, S_PERM, A_PERM2, S_PERM2], [Z, Z_LK, Z_LK2]]
                if has_lookup
                else [list(ADV), [], [Z]]
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
        self._vals = tuple([] for _ in range(NCOLS))
        self._n = 0
        self.failures: list = []

    def new_row(self, qa=0, qb=0, qc=0, qd=0, qe=0, qab=0, const=0,
                a=0, b=0, c=0, d=0, e=0,
                copy_a: Cell | None = None, copy_b: Cell | None = None,
                copy_c: Cell | None = None, copy_d: Cell | None = None,
                copy_e: Cell | None = None, range_a: bool = False,
                range_b: bool = False) -> int:
        R = bn254.R
        a, b, c, d, e = a % R, b % R, c % R, d % R, e % R
        row = self._n
        self._n += 1
        instance = self._pending_instance if getattr(self, "_pending_instance", None) else 0
        v = self._gate_value(
            (qa, qb, qc, qd, qe, qab, const % R, a, b, c, d, e), instance
        )
        if v:
            self.failures.append(f"gate unsatisfied at row {row}")
        for val, src in ((a, copy_a), (b, copy_b), (c, copy_c), (d, copy_d),
                         (e, copy_e)):
            if src is not None and self._vals[src.col][src.row] != val:
                self.failures.append(f"copy constraint violated at row {row}")
        for flag, val, which in ((range_a, a, "a"), (range_b, b, "b")):
            if flag:
                assert self.range_bits > 0, "builder built without a range table"
                if not 0 <= val < (1 << self.range_bits):
                    self.failures.append(
                        f"range-{which} cell out of bounds at row {row}"
                    )
        for i, val in enumerate((a, b, c, d, e)):
            self._vals[i].append(val)
        return row

    def witness_cell(self, value: int) -> Cell:
        value %= bn254.R
        if self._witness_cursor is not None:
            row, col = self._witness_cursor
            self._vals[col][row] = value
            self._witness_cursor = (row, col + 1) if col + 1 < NCOLS else None
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

    def k(self) -> int:
        n_rows = self._n + 1
        if self.range_bits:
            n_rows = max(n_rows, (1 << self.range_bits) + 1)
        return max(3, (n_rows - 1).bit_length())

    def build(self, srs, name: str = "", accumulator_indices=None):
        raise NotImplementedError("StreamingChecker is check-only")
