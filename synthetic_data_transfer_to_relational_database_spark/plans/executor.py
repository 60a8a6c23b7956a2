"""Generation executor: TableSpecs → referentially-consistent DataFrames.

The Spark-native re-expression of the reference's engines
(run_engine.py main loop :205-270, fill_db.py fill_tables :122-176):

- table build order = Kahn toposort of the FK graph (O1, fill_db.py:39-61)
  with the v2 incremental sequencing (O2, run_engine.py:265-266): each
  table is materialized before dependents sample its keys.
- row generation = ONE projection: ``spark.range(n).select(*compiled
  exprs)`` — whole-stage codegen, no Python row loop (SURVEY.md §4).
- **FK sampling join (J1, run_engine.py:156-162)**: each child row gets a
  uniformly-random EXISTING parent key. Two physical strategies:
    * parents ≤ `broadcast_threshold` rows AND an estimated
      ≤ `broadcast_key_bytes` of rendered key text: collected key array
      broadcast into an ``element_at(keys, pmod(hash, n)+1)`` expression
      — zero shuffle, mirroring the reference's 1000-key ID cache but
      complete. The byte cap exists because the literal array rides in
      the TASK BINARY and every task thread deserializes its own boxed
      copy: at 100k uuid keys (~4 MB text) × 32 local task threads the
      per-task copies alone OOM a default 1g heap (measured r10, the
      10× full-schema probe), and on a real cluster the closure
      re-ships per stage;
    * larger parents: deterministic random index on the child + equi-join
      against ``parent.zipWithIndex`` — shuffle-based, scales to any
      parent cardinality, AQE handles skew.
- **FK fallback (J2, run_engine.py:160-162)**: empty parent ⇒ fabricated
  key by type (the reference tolerates the violation because constraints
  are disabled; we reproduce the semantics and flag it).
- **self-referencing FKs** (CariHesap, script.sql:4043-4049): sampled
  within the same generated batch by *recomputing the PK expression at a
  sampled row index* — pure function composition, no second pass.
- **shared-PK subtypes** (FK_SatisBelge_BelgeBaslik_Id,
  script.sql:4256-4257): child PK sampled from parent PKs WITHOUT
  replacement via an affine permutation of the parent index space —
  collision-free and deterministic (the reference gets this wrong-ish;
  SURVEY.md §7 hard-part 2).

Determinism: same (specs, row_counts, seed) ⇒ byte-identical output,
independent of partitioning — all randomness is xxhash64(id, seed, salt).
"""

from __future__ import annotations

import math
import os
import threading
import warnings
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import generators as G
from ..functions.generators import _qd, _qi, _qs
from .compiler import compile_rule
from .model import ColumnSpec, TableSpec
from .rules import infer_table_rules
from .toposort import toposort_tables

DEFAULT_ROW_COUNT = 1000


def _array_literal(values: list) -> Column:
    """ONE parsed ``array(...)`` literal for a Python list.

    ``F.lit(list)`` in classic PySpark builds the array ELEMENT-BY-ELEMENT
    — one py4j round trip per element — so a 10k-key parent array cost
    ~5 s of pure socket time per FK edge, and an 85-table schema build
    spent ~47% of its wall clock inside those listcomps (measured, r6).
    Rendering the SQL text driver-side and parsing it once JVM-side is
    O(1) round trips at any length. Covers the key types parent PKs can
    carry (str/int/float/bool/Decimal/date/datetime); anything else
    falls back to the per-element form — correct, just slow.

    Float and string rendering delegate to generators._qd /._qs so the
    exact-double repr and the parser-mode-safe quoting (unbase64 for
    strings with quotes/backslashes) live in one place."""
    import datetime
    import decimal

    # r19: big STRING key arrays (the collected-FK path ships up to
    # broadcast_key_bytes of rendered uuids — 22 calls × 10k keys ≈ 8 MB
    # of array(...) text per full-schema build, measured) render as ONE
    # string literal + split(): the parser scans one token and the
    # analyzer walks 3 nodes instead of one per key; the optimizer
    # constant-folds split-of-literal to the IDENTICAL ArrayData, so the
    # executed plan, the task-binary footprint and the output bytes are
    # unchanged (determinism goldens + tests/test_generator.py pin it).
    # Strings only — every other key dtype keeps the exact typed-literal
    # rendering below; ';' inside a key falls back likewise.
    if len(values) >= 64 and all(
        isinstance(v, str) and v and ";" not in v for v in values
    ):
        return F.expr(f"split({_qs(';'.join(values))}, ';')")

    def render(v) -> str | None:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return f"{v}L"
        if isinstance(v, float):
            return _qd(v)
        if isinstance(v, decimal.Decimal):
            _, digits, exp = v.as_tuple()
            scale = max(0, -exp)
            int_digits = max(len(digits) + exp, 0) if exp < 0 else len(digits) + exp
            prec = max(int_digits + scale, 1)
            return f"CAST('{v}' AS DECIMAL({prec},{scale}))"
        if isinstance(v, datetime.datetime):
            return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
        if isinstance(v, datetime.date):
            return f"DATE '{v.isoformat()}'"
        if isinstance(v, str):
            return _qs(v)
        return None

    parts = []
    for v in values:
        r = render(v)
        if r is None:
            return F.lit(list(values))  # unknown element type: slow path
        parts.append(r)
    return F.expr("array(" + ",".join(parts) + ")")


def _coprime_step(n: int, seed: int) -> int:
    """Smallest step ≥ some seed-derived start that is coprime with n —
    defines the affine permutation i -> (a*i + b) mod n."""
    if n <= 1:
        return 1
    a = (seed % (n - 1)) + 1
    while math.gcd(a, n) != 1:
        a = a % (n - 1) + 1
    return a


@dataclass
class GenerationPlan:
    spark: SparkSession
    tables: dict[str, TableSpec]
    seed: int = 42
    row_counts: dict[str, int] = field(default_factory=dict)
    default_rows: int = DEFAULT_ROW_COUNT
    broadcast_threshold: int = 100_000
    # second gate on the collected-array FK path: estimated rendered key
    # bytes (n_parent × per-key width by dtype). 2 MiB ≈ 55k uuids —
    # big parents switch to the equi-join strategy, whose cost scales
    # with the shuffle, not with per-task literal deserialization.
    broadcast_key_bytes: int = 2 << 20
    num_partitions: int | None = None
    # opt-in heavy-tailed FK sampling (see _sample_idx): 0.0 = uniform
    # (the reference's semantics and every oracle-checked default);
    # e.g. 2.0 makes low parent ids hot keys so the generated data
    # exercises AQE skew-join / salting downstream.
    fk_skew: float = 0.0
    # F4/F5/F6 skip filters (run_engine.py:23,25,221; fill_db.py:147) —
    # opt-in: pass rules.DEFAULT_SKIP_TABLES / DEFAULT_SKIP_COLUMNS for
    # the reference's behavior; default generates everything.
    skip_tables: tuple[str, ...] = ()
    skip_table_substrings: tuple[str, ...] = ()
    skip_columns: tuple[str, ...] = ()
    # Identity read-back (run_engine.py:265-266 fetch_ids): when loading
    # into a LIVE database, IDENTITY values are NOT 1..n — the sink fetches
    # the real keys after insert and stores them here ({table: {pk_col:
    # [keys]}}); children then sample these instead of the assumed range.
    # Contract: to change a column's keys, REPLACE the list (assign a new
    # one) — never mutate it in place; the byte-gate memo invalidates on
    # list identity (+ a length backstop for .extend misuse).
    parent_keys_override: dict[str, dict[str, list]] = field(default_factory=dict)
    # storage root for materialize="write" (defaults to spark-warehouse)
    materialize_dir: str = "spark-warehouse/_generated"

    # populated during run()
    _built: dict[str, DataFrame] = field(default_factory=dict)
    _pk_expr_fns: dict[str, object] = field(default_factory=dict)
    _row_count_of: dict[str, int] = field(default_factory=dict)
    # (parent, col) -> (source list, sorted keys, rendered-byte estimate)
    # memo for the parent_keys_override byte gate; the SOURCE element is
    # the identity check that invalidates the memo when a caller replaces
    # the override list between builds (concurrent same-key writes are
    # GIL-atomic and value-identical — same-level builds may race benignly)
    _override_prepped: dict[tuple[str, str], tuple[list, list, int]] = field(default_factory=dict)
    # synthetic __override__ join-frame -> the sorted key list it was
    # built from (identity-checked for the same replacement staleness)
    _override_syn_src: dict[str, list] = field(default_factory=dict)
    # per-table scratch caches (indexed-parent frames) released once the
    # child that referenced them is materialized. THREAD-LOCAL because
    # run(parallelism=N) builds same-level tables on concurrent threads
    # (Spark's scheduler is thread-safe; same-level tables share no FK
    # edge) — a shared list would let one thread unpersist a sibling's
    # still-referenced indexed-parent frame mid-build.
    _scratch_tl: threading.local = field(default_factory=threading.local)

    # ------------------------------------------------------------------
    @property
    def _scratch(self) -> list[DataFrame]:
        """The CURRENT THREAD's scratch-cache list (see _scratch_tl)."""
        if not hasattr(self._scratch_tl, "items"):
            self._scratch_tl.items = []
        return self._scratch_tl.items

    def rows_for(self, name: str) -> int:
        return self.row_counts.get(name, self.default_rows)

    def _id_frame(self, n: int) -> DataFrame:
        parts = self.num_partitions or self.spark.sparkContext.defaultParallelism
        return self.spark.range(0, n, 1, min(parts, max(1, n))).withColumnRenamed("id", "__id")

    # ------------------------------------------------------------------
    # PK expressions as pure functions of the row index, so self-refs and
    # subtype FKs can be computed by composition. Index in, value out as
    # SQL TEXT (compile_rule's contract): composition is string
    # interpolation, and the whole composed column parses JVM-side once.
    def _pk_expr_fn(self, table: TableSpec):
        fns = {}
        for pk_col in table.pk:
            try:
                spec = table.column(pk_col)
            except KeyError:
                continue
            if spec.identity:
                # IDENTITY(1,1): values are 1..n by construction. The
                # reference reads them back after insert
                # (run_engine.py:265-266 fetch_ids); generating into files
                # we know them up front — children sample idx+1 directly.
                def make_ident(spec=spec):
                    return lambda idx: (
                        f"CAST((({idx}) + 1)"
                        f" AS {spec.spark_type().simpleString()})"
                    )

                fns[pk_col] = make_ident()
                continue
            if spec.computed:
                continue
            rule = spec.rule or "uuid4"
            if rule.startswith("foreign_key:"):
                continue  # subtype PK — resolved via parent sampling

            def make(spec=spec, rule=rule):
                return lambda idx: compile_rule(rule, spec, idx, self.seed + _stable_hash(table.name))

            fns[pk_col] = make()
        return fns

    # ------------------------------------------------------------------
    # a*(i mod n) must stay inside int64 for the permutation to be exact:
    # both factors are < n after the inner pmod, so the guarantee holds up
    # to n = floor(sqrt(2^63)) regardless of the CHILD row count. Beyond
    # that (3e9+ parents in a 1:1 relation) we fall back to hash sampling
    # rather than overflow (an ANSI-mode error) or silently wrap (which
    # would break injectivity anyway).
    _MAX_PERMUTATION_N = 3_037_000_499

    def _sample_idx(
        self, id_sql: str, salt: str, n: int, unique: bool, child_rows: int | None = None
    ) -> str:
        """Deterministic parent-row index in [0, n). Default: uniform with
        replacement (hash). ``unique`` (a unique index covers the FK
        column): WITHOUT replacement via an affine permutation — injective
        while the child row count ≤ n ≤ ``_MAX_PERMUTATION_N``, so sampled
        keys never repeat. When more children than parent keys exist the
        guarantee CANNOT hold (pigeonhole): we warn at plan time — a
        live-DB load would hit the unique constraint — and the permutation
        wraps (FK validity is preserved, uniqueness is not).

        ``fk_skew`` > 0 (plan-level, opt-in) warps the with-replacement
        draw to idx = floor(n·u^(1+skew)): low parent indices become
        hot keys with a heavy-tailed frequency profile — the Zipf-ish
        shape real FK data has (a few customers own most orders) and
        uniform sampling never produces. Generated children then
        actually EXERCISE the skew machinery downstream (AQE skew-join,
        skew.salted_join, skew_profile). Still a pure deterministic
        expression of (id, seed, salt); unique/without-replacement
        sampling stays uniform (a permutation cannot be skewed)."""
        if unique and n <= self._MAX_PERMUTATION_N:
            if child_rows is not None and child_rows > n:
                warnings.warn(
                    f"unique-indexed FK '{salt}': {child_rows} child rows > "
                    f"{n} parent keys — without-replacement sampling wraps; "
                    "the unique index WILL be violated (a live DB would "
                    "reject the load). Reduce the child row count or drop "
                    "the index.",
                    stacklevel=2,
                )
            s = self.seed + _stable_hash(salt)
            a = _coprime_step(n, s)
            # reduce i into [0, n) BEFORE the multiply: (a*i) mod n ==
            # (a*(i mod n)) mod n, and the reduced product stays < n^2 <=
            # 2^63 no matter how many child rows there are.
            return (
                f"pmod(((pmod({id_sql}, {_qi(n)}) * {_qi(a)})"
                f" + {_qi(s % max(n, 1))}), {_qi(n)})"
            )
        # `not unique`: a unique-indexed FK that overflows the permutation
        # cap falls through to the hash fallback — skewing THAT draw would
        # concentrate duplicates on hot parents and guarantee index
        # violations, the opposite of the uniform fallback's best effort
        if self.fk_skew > 0 and not unique:
            u = (
                f"(pmod(xxhash64({id_sql}, {_qi(self.seed)}, {_qs(salt)}),"
                f" {_qi(1 << 30)}) / {_qd(float(1 << 30))})"
            )
            return (
                f"CAST(floor(({_qd(float(n))} * power({u},"
                f" {_qd(1.0 + self.fk_skew)}))) AS BIGINT)"
            )
        return (
            f"pmod(xxhash64({id_sql}, {_qi(self.seed)}, {_qs(salt)}), {_qi(n)})"
        )

    def _fk_value(self, table: TableSpec, col: ColumnSpec, id_sql: str) -> Column:
        """J1/J2: deterministic sample of an existing parent key. The salt
        is per-FK-constraint (not per-column) so composite-FK columns
        sample the same parent row — tuple-consistent references.

        ``id_sql`` is SQL text; the pure-expression paths (PK
        composition, fallback synthesis) compose strings and parse ONCE
        here, while the array paths keep Column composition on top of the
        single parsed ``_array_literal`` node (already O(1) round trips)."""
        parent_name, _, parent_col = col.fk_parent.partition(".")
        salt = col.fk_salt or f"{table.name}.{col.name}"
        child_rows = self._row_count_of.get(table.name, self.rows_for(table.name))

        # self-reference: recompute this table's own PK expression at a
        # sampled index in [0, n) — same batch, always valid.
        if parent_name == table.name:
            n = child_rows
            pk_fns = self._pk_expr_fns.get(table.name, {})
            fn = pk_fns.get(parent_col)
            if fn is not None:
                return F.expr(fn(self._sample_idx(id_sql, salt, n, col.unique, child_rows)))
            return F.lit(None)

        # live-DB identity read-back wins over every assumed-key path
        override = self.parent_keys_override.get(parent_name, {}).get(parent_col)
        if override is not None:
            if not override:
                return self._fk_fallback(col, id_sql, salt)
            # r10 advice: the collected-path byte gate applies HERE too —
            # it is only the default fetch_limit=1000 that keeps readback
            # lists small, and a caller raising it re-opens the exact
            # per-task-literal OOM the gate exists for (the array literal
            # rides the task binary, one boxed copy per task thread).
            # Values are already in hand, so gate on actual rendered width.
            # Canonical (sorted) key order first: the equi-join path maps
            # sample index -> key by GLOBAL KEY RANK (_indexed_parent), so
            # the array path must use the same order for the two dispatch
            # outcomes to stay row-identical (same pin as the generated-
            # parent gate, tests/test_generator.py). Sort + byte estimate
            # are memoized per (parent, col): a 1M-key readback referenced
            # by many children would otherwise re-pay O(n log n) driver
            # work per FK column.
            # The memo entry records WHICH list object it was built from:
            # build_one is public precisely to allow interleaved
            # build/load/fetch, so a re-fetch may REPLACE the override list
            # for the same column — an identity check invalidates the
            # stale sort instead of silently sampling first-fetch keys
            # (r11 advice).
            memo_key = (parent_name, parent_col)
            prepped = self._override_prepped.get(memo_key)
            if (
                prepped is None
                or prepped[0] is not override
                # length check: catches the in-place `.extend(new_keys)`
                # misuse that an identity check alone cannot (same-length
                # in-place edits are the caller's contract breach — see
                # the parent_keys_override field doc: replace, never
                # mutate)
                or len(prepped[1]) != len(override)
            ):
                srt = sorted(override)
                prepped = (override, srt, sum(len(str(v)) + 3 for v in srt))
                self._override_prepped[memo_key] = prepped
            _, override, est = prepped
            if len(override) <= self.broadcast_threshold and est <= self.broadcast_key_bytes:
                arr = _array_literal(list(override))
                idx = (F.expr(self._sample_idx(id_sql, salt, len(override), col.unique, child_rows)) + 1).cast("int")
                return F.element_at(arr, idx)
            # Over cap: route through the same equi-join machinery as big
            # GENERATED parents, against a DataFrame built from the
            # readback keys. Registered under a synthetic name because
            # the real parent_name may still hold the generated parent
            # whose assumed keys this override supersedes.
            syn = f"__override__{parent_name}.{parent_col}"
            # same staleness rule as the memo: `override` here is the
            # memoized sorted list, whose identity changes exactly when
            # the caller replaced the override — rebuild the join frame
            # with it, never serve a first-fetch frame for replaced keys
            if self._override_syn_src.get(syn) is not override:
                self._built[syn] = self.spark.createDataFrame(
                    [(v,) for v in override], [parent_col]
                )
                self._row_count_of[syn] = len(override)
                self._override_syn_src[syn] = override
            raise _NeedsJoin(syn, parent_col)

        parent_df = self._built.get(parent_name)
        if parent_df is None:
            return self._fk_fallback(col, id_sql, salt)
        n_parent = self._row_count_of.get(parent_name)
        if n_parent is None:
            n_parent = parent_df.count()
        if n_parent == 0:
            return self._fk_fallback(col, id_sql, salt)

        # expression-computable parent PK ⇒ function composition, no join
        fn = self._pk_expr_fns.get(parent_name, {}).get(parent_col)
        if fn is not None:
            return F.expr(fn(self._sample_idx(id_sql, salt, n_parent, col.unique, child_rows)))

        if (
            n_parent <= self.broadcast_threshold
            and n_parent * self._key_width_estimate(parent_name, parent_col)
            <= self.broadcast_key_bytes
        ):
            keys = [r[0] for r in parent_df.select(parent_col).collect()]
            # ONE array literal (a single Catalyst Literal node), not 10^5
            # F.lit() Column constructions — the per-element form blows up
            # py4j call count and plan size long before the threshold.
            arr = _array_literal(keys)
            idx = (F.expr(self._sample_idx(id_sql, salt, len(keys), col.unique, child_rows)) + 1).cast("int")
            return F.element_at(arr, idx)

        # large-parent path is planned in _build_table via an equi-join
        raise _NeedsJoin(parent_name, parent_col)

    def _key_width_estimate(self, parent_name: str, parent_col: str) -> int:
        """Rendered-SQL bytes per key for the collected-array gate —
        rough and dtype-based, decided BEFORE collecting anything so an
        over-cap parent never pays the driver fetch it would discard.

        The estimate (and ``broadcast_key_bytes``) is a TEXT-BYTE PROXY
        for a several-times-larger heap footprint: the measured r10 OOM
        is driven by per-task boxed UTF8String/array copies at ~40+
        bytes of JVM object overhead per key, one copy per task THREAD
        (32 on local[32]). The 2 MiB default is sized with that
        multiplier in mind — ~2 MiB of literal text ≈ tens of MiB of
        transient heap across a fully-parallel stage; raise it only
        with executor heap to spare."""
        t = self.tables.get(parent_name)
        spec = None
        if t is not None:
            spec = next((c for c in t.columns if c.name == parent_col), None)
        if spec is None:
            return 40
        if spec.dtype == "uuid":
            return 39  # 36 chars + quotes + comma
        if spec.dtype in ("int", "short", "long"):
            return 22
        if spec.dtype.startswith("decimal"):
            # r10 advice: decimal PKs previously fell to the generic
            # length branch; size from declared precision instead —
            # digits + sign + point + comma margin.
            return (spec.precision or 18) + 5
        if spec.length is not None and spec.length < 0:
            # length=-1 is the varchar(MAX) sentinel (plans/model.py) —
            # unbounded keys must never slip under the cap as "minimum
            # width"; route straight to the join path.
            return self.broadcast_key_bytes + 1
        return max(spec.length or 24, 8) + 3

    def _fk_fallback(self, col: ColumnSpec, id_sql: str, salt: str) -> Column:
        """J2 semantics (run_engine.py:160-162): fabricate by type."""
        if col.dtype == "uuid":
            return F.expr(G.gen_uuid(id_sql, self.seed, salt + ".fallback"))
        if col.dtype in ("int", "short", "long"):
            return F.expr(G.gen_int(id_sql, self.seed, salt + ".fallback", 1, 10)).cast(col.dtype)
        return F.expr(G.gen_lexify(id_sql, self.seed, salt + ".fallback", min(col.length or 3, 4)))

    # ------------------------------------------------------------------
    def _build_table(self, table: TableSpec) -> DataFrame:
        n = self.rows_for(table.name)
        self._row_count_of[table.name] = n
        infer_table_rules(table)
        self._pk_expr_fns[table.name] = self._pk_expr_fn(table)

        df = self._id_frame(n)
        id_col = F.col("__id")
        id_sql = "__id"
        table_seed = self.seed + _stable_hash(table.name)

        # shared-PK subtype: PK sampled from parent WITHOUT replacement
        subtype_fk = table.shared_pk_fk()
        subtype_pk_exprs: dict[str, str] = {}
        if subtype_fk is not None:
            parent = self.tables.get(subtype_fk.parent_table)
            n_parent = self._row_count_of.get(subtype_fk.parent_table, 0)
            if parent is not None and n_parent >= n:
                a = _coprime_step(n_parent, table_seed)
                b = table_seed % max(n_parent, 1)
                # inner pmod is a no-op here (id < n ≤ n_parent) but keeps
                # the product provably < n_parent² — same shape as
                # _sample_idx's overflow guard.
                perm_idx = (
                    f"pmod(((pmod({id_sql}, {_qi(n_parent)}) * {_qi(a)})"
                    f" + {_qi(b)}), {_qi(n_parent)})"
                )
                for pk_col, ppk_col in zip(subtype_fk.columns, subtype_fk.parent_columns):
                    fn = self._pk_expr_fns.get(subtype_fk.parent_table, {}).get(ppk_col)
                    if fn is not None:
                        subtype_pk_exprs[pk_col] = fn(perm_idx)

        exprs: list[Column] = []
        join_requests: list[tuple[ColumnSpec, str, str]] = []
        for col in table.generated_columns:
            if col.name in self.skip_columns:
                continue
            if col.name in subtype_pk_exprs:
                exprs.append(
                    F.expr(subtype_pk_exprs[col.name]).cast(col.spark_type()).alias(col.name)
                )
                continue
            if col.fk_parent:
                try:
                    expr = self._fk_value(table, col, id_sql)
                except _NeedsJoin as nj:
                    join_requests.append((col, nj.parent, nj.parent_col))
                    continue
                # nullable FK columns get a deterministic null fraction,
                # exercising the null-extension path like the reference's
                # nullable handling (fill_db.py:162-163). Unique-indexed
                # columns stay non-null: repeated NULLs would violate the
                # index under ANSI-92 semantics (MSSQL treats NULLs equal).
                if col.nullable and not col.unique:
                    is_null = F.pmod(F.xxhash64(id_col, F.lit(table_seed), F.lit(col.name + ".null")), F.lit(10)) == 0
                    expr = F.when(is_null, F.lit(None)).otherwise(expr)
                exprs.append(expr.cast(col.spark_type()).alias(col.name))
                continue
            exprs.append(
                F.expr(compile_rule(col.rule or "word", col, id_sql, table_seed)).alias(col.name)
            )

        out = df.select(id_col, *exprs)

        # Large-parent FK values via index-equi-join (scale path of J1).
        # Requests are grouped per (parent, fk constraint salt): composite-FK
        # columns that share a constraint join against ONE sampled parent
        # row, keeping tuple consistency on this path too.
        grouped: dict[tuple[str, str], list[tuple[ColumnSpec, str]]] = {}
        for col, parent_name, parent_col in join_requests:
            salt = col.fk_salt or f"{table.name}.{col.name}"
            grouped.setdefault((parent_name, salt), []).append((col, parent_col))

        for (parent_name, salt), pairs in grouped.items():
            parent_idx, n_parent = self._indexed_parent(parent_name, pairs)
            uniq = any(col.unique for col, _ in pairs)
            pick = F.expr(self._sample_idx("__id", salt, n_parent, uniq, n)).alias("__pick")
            out = (
                out.withColumn("__pick", pick)
                .join(parent_idx, F.col("__pick") == F.col("__pidx"), "left")
                .drop("__pick", "__pidx")
            )
            for col, _ in pairs:
                val = F.col(f"__pk_{col.name}").cast(col.spark_type())
                if col.nullable and not col.unique:
                    is_null = (
                        F.pmod(
                            F.xxhash64(F.col("__id"), F.lit(table_seed), F.lit(col.name + ".null")),
                            F.lit(10),
                        )
                        == 0
                    )
                    val = F.when(is_null, F.lit(None)).otherwise(val)
                out = out.withColumn(col.name, val).drop(f"__pk_{col.name}")

        return out.drop("__id")

    # ------------------------------------------------------------------
    def _indexed_parent(
        self, parent_name: str, pairs: list[tuple[ColumnSpec, str]]
    ) -> tuple[DataFrame, int]:
        """Parent keys with a dense 0..n-1 index, WITHOUT a global
        single-partition sort: range-repartition by the key tuple (ordered
        partitions), sort within partitions, then add each partition's row
        number to its global offset (a num_partitions-sized collect). The
        index equals the global rank of the key tuple — deterministic and
        layout-independent — but every sort is partition-local, so the path
        scales to arbitrarily large parents.
        """
        from pyspark.sql.window import Window

        parent_df = self._built[parent_name]
        n_parent = self._row_count_of.get(parent_name) or parent_df.count()
        key_cols = [f"__pk_{col.name}" for col, _ in pairs]
        nparts = max(
            1,
            min(
                self.num_partitions or self.spark.sparkContext.defaultParallelism,
                n_parent,
            ),
        )
        p = (
            parent_df.select(
                *[F.col(pc).alias(f"__pk_{col.name}") for col, pc in pairs]
            )
            .repartitionByRange(nparts, *key_cols)
            .sortWithinPartitions(*key_cols)
            .withColumn("__part", F.spark_partition_id())
        )
        # CACHE before the counts action: RangePartitioner samples with an
        # RDD-derived seed, so re-executing this plan (once for the counts
        # collect, once at child-join time) can draw DIFFERENT range
        # boundaries when the parent outgrows the sampling reservoir — the
        # collected offsets would then describe partitions the join never
        # sees (duplicate/missing __pidx). Materializing the partitioning
        # here pins ONE set of boundaries for both uses; the cache is
        # released by build_one once the child is materialized.
        p = p.cache()
        self._scratch.append(p)
        counts = {r["__part"]: r["count"] for r in p.groupBy("__part").count().collect()}
        offsets: dict[int, int] = {}
        acc = 0
        for part in sorted(counts):
            offsets[part] = acc
            acc += counts[part]
        off_expr = F.element_at(
            F.map_from_arrays(
                F.lit([int(k) for k in sorted(counts)]),
                F.lit([int(offsets[k]) for k in sorted(counts)]),
            ),
            F.col("__part"),
        )
        w = Window.partitionBy("__part").orderBy(*key_cols)
        parent_idx = (
            p.withColumn("__pidx", (F.row_number().over(w) - 1 + off_expr).cast("long"))
            .drop("__part")
        )
        return parent_idx, n_parent

    # ------------------------------------------------------------------
    def build_order(self) -> list[str]:
        """Dependency-ordered table names (parents before children) —
        also the correct JDBC load order when FK constraints are live."""
        return toposort_tables(self.tables)

    def build_levels(self) -> list[list[str]]:
        """The toposort grouped into dependency LEVELS: level i contains
        tables whose every FK parent sits in a level < i, so tables
        WITHIN a level share no FK edge and can build concurrently.
        Level index = longest FK path from a root (self-loops and
        external parents excluded, matching toposort_tables).

        Residual-CYCLE members (tables with an FK "back edge" — a parent
        LATER in the fallback order — or targeted by one) are pinned
        STRICTLY SERIAL: each gets a level above everything before it in
        the order, so the parallel build observes exactly the serial
        build's _built state at their turn (which parents exist decides
        sample-vs-fallback for cycle edges; letting level-mates race
        there would make output depend on thread timing).
        Concatenating the levels yields a valid build order."""
        order = toposort_tables(self.tables)
        pos = {n: i for i, n in enumerate(order)}
        back_edge_nodes: set[str] = set()
        for name in order:
            for fk in self.tables[name].fks:
                p = fk.parent_table
                if p == name or p not in self.tables:
                    continue
                if pos[p] > pos[name]:
                    back_edge_nodes.add(name)
                    back_edge_nodes.add(p)
        depth: dict[str, int] = {}
        running_max = -1
        for name in order:
            d = 0
            for fk in self.tables[name].fks:
                p = fk.parent_table
                if p == name or p not in self.tables or pos[p] > pos[name]:
                    continue
                d = max(d, depth[p] + 1)
            if name in back_edge_nodes:
                d = max(d, running_max + 1)
            depth[name] = d
            running_max = max(running_max, d)
        levels: list[list[str]] = [[] for _ in range(max(depth.values(), default=0) + 1)]
        for name in order:
            levels[depth[name]].append(name)
        return levels

    def skips(self, name: str) -> bool:
        """True when the F4/F5 skip filters exclude ``name``."""
        return name in self.skip_tables or any(
            s in name for s in self.skip_table_substrings
        )

    def for_each_level(self, fn, parallelism: int | None = None) -> None:
        """Apply ``fn(table_name)`` over every non-skipped table — serial
        in toposort order, or (parallelism > 1) fanned out per dependency
        level with a barrier between levels. THE one implementation of
        the level-concurrency contract (residual-cycle serialization,
        identity-read-back-before-children); run() and the live-DB
        loader both drive through it so they cannot drift."""
        if not parallelism or parallelism <= 1:
            for name in toposort_tables(self.tables):
                if not self.skips(name):
                    fn(name)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=parallelism) as ex:
            for level in self.build_levels():
                todo = [n for n in level if not self.skips(n)]
                # drain so worker exceptions surface at the barrier
                list(ex.map(fn, todo))

    def build_one(self, name: str, materialize: bool | str = True) -> DataFrame:
        """Build (and register) a single table — parents must already be
        built. Public so sinks can interleave build → load → key-fetch."""
        scratch = self._scratch
        n_before = len(scratch)
        df = self._materialize_df(self._build_table(self.tables[name]), name, materialize)
        self._built[name] = df
        if materialize is not False:
            # THIS child no longer re-reads the indexed-parent scratch
            # caches once it is itself cached/written — release the ones
            # its build created, and ONLY those: scratch pinned by an
            # earlier materialize=False build is still referenced by that
            # table's lazy plan, and unpersisting it would reintroduce
            # the range-boundary recompute hazard the cache pins against.
            for s in scratch[n_before:]:
                s.unpersist()
            del scratch[n_before:]
        return df

    def _materialize_df(self, df: DataFrame, name: str, mode: bool | str) -> DataFrame:
        if mode is True or mode == "cache":
            # fine locally / for dimension tables; pins executor memory
            df = df.cache()
            df.count()
            return df
        if mode == "write":
            # the at-scale materialization: each table becomes a parquet
            # dataset; dependents re-read from storage, nothing is pinned
            # in cluster memory (85 tables × 10⁹ rows would not fit).
            path = os.path.join(self.materialize_dir, name)
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        return df

    def run(
        self, materialize: bool | str = True, parallelism: int | None = None
    ) -> dict[str, DataFrame]:
        """Build every table in dependency order, each materialized before
        dependents sample its keys (the O2 sequencing). ``materialize``:
        True/"cache" (local/dim-sized), "write" (parquet-backed, the 100 TB
        path), or False (lazy — only valid when no FK sampling needs
        deterministic parent scans).

        ``parallelism`` > 1 builds the tables of each dependency LEVEL
        (build_levels) on that many concurrent threads: per-table cost
        here is mostly driver-side plan construction + per-plan
        analysis/codegen, and the Spark scheduler happily runs the
        resulting jobs concurrently (on a cluster this is ordinary
        multi-job scheduling; use the FAIR scheduler to stop a huge
        table from starving its level-mates). Output is byte-identical
        to the serial build — every value is hash-of-(id, seed, salt),
        and a level's tables share no FK edge, so build order within a
        level cannot influence any sampled key (locked by
        tests/test_generator.py)."""
        self.for_each_level(lambda n: self.build_one(n, materialize), parallelism)
        # synthetic __override__ key frames (the over-cap readback path)
        # are join scaffolding, not schema tables — callers enumerating
        # the result (table writers, CLI counts) must not see them
        return {k: v for k, v in self._built.items() if not k.startswith("__override__")}


class _NeedsJoin(Exception):
    def __init__(self, parent: str, parent_col: str):
        self.parent = parent
        self.parent_col = parent_col


def _stable_hash(s: str) -> int:
    """Deterministic small int from a name (Python hash() is salted)."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1_000_003
    return h
