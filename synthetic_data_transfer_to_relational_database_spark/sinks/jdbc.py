"""JDBC bulk-load sink and driver-side DDL executor.

Re-expresses the reference's relational output path Spark-first:

- K3 bulk append (`pandas.to_sql(if_exists='append')`, run_engine.py:259-260,
  fill_db.py:167-168) → ``df.write.jdbc(mode='append')`` with explicit
  ``batchsize`` / ``numPartitions``: each partition opens one connection
  and streams executemany batches, so load parallelism scales with
  partition count instead of the reference's single connection.
- K1/K2 DDL deploy (apply_mssql.py:94-102, :27-43) → driver-side
  ``java.sql.DriverManager`` statement loop with per-batch
  error-containment. DDL is metadata work — never a DataFrame op.
- K4 constraint/trigger gate (fill_db.py:28-37, run_engine.py:227-228,
  :276-277) → dialect-aware statement generators bracketing the load.
- S8 parent-key scan (`SELECT TOP 1000 ... WITH (NOLOCK)`,
  run_engine.py:149-151) → pushed-down limit query via
  ``spark.read.jdbc``.

Transactionality: Spark JDBC writes commit PER PARTITION (the reference
commits per table, run_engine.py:225). A failed task can leave partial
rows; callers needing all-or-nothing should write to a staging table and
swap — documented rather than hidden, same trade the reference makes with
disabled constraints (J2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcTarget:
    """Connection descriptor. ``dialect`` picks constraint-gate syntax."""

    url: str
    driver: str | None = None
    properties: dict[str, str] = field(default_factory=dict)
    dialect: str = "generic"  # 'mssql' | 'derby' | 'generic'

    def jdbc_properties(self) -> dict[str, str]:
        props = dict(self.properties)
        if self.driver:
            props["driver"] = self.driver
        return props


# --- K1: driver-side statement executor --------------------------------


def _connect(jvm, target: JdbcTarget):
    """Open a driver-side java.sql connection honoring
    ``target.properties`` (user/password/...): ``write_table``
    authenticates via properties, so the driver-side paths must too or
    the staging write succeeds while the publish cannot connect on any
    authenticated target (the mssql dialect this repo aims at). The
    ``driver`` key is Spark's spelling, not a JDBC property — it is
    loaded via Class.forName instead of passed through."""
    if target.driver:
        jvm.java.lang.Class.forName(target.driver)
    props = jvm.java.util.Properties()
    for k, v in target.jdbc_properties().items():
        if k != "driver":
            props.setProperty(k, v)
    return jvm.java.sql.DriverManager.getConnection(target.url, props)


def execute_statements(
    spark: SparkSession,
    target: JdbcTarget,
    statements: list[str],
    continue_on_error: bool = True,
) -> list[tuple[str, str | None]]:
    """Run DDL/utility statements sequentially over one JVM connection.

    Returns ``[(statement, error-or-None), ...]``; with
    ``continue_on_error`` a failing batch doesn't abort the run
    (apply_mssql.py:94-102 semantics).
    """
    jvm = spark._sc._jvm  # noqa: SLF001 — java.sql lives JVM-side
    conn = _connect(jvm, target)
    results: list[tuple[str, str | None]] = []
    try:
        stmt = conn.createStatement()
        for sql in statements:
            try:
                stmt.execute(sql)
                results.append((sql, None))
            except Exception as exc:  # py4j wraps SQLException
                if not continue_on_error:
                    raise
                results.append((sql, str(exc).splitlines()[0]))
        stmt.close()
    finally:
        conn.close()
    return results


def query_values(
    spark: SparkSession,
    target: JdbcTarget,
    sql: str,
) -> list:
    """Driver-side SELECT over one JVM connection; returns the first
    column of every row. For metadata probes (ledger membership, control
    counts) where spinning up a Spark JDBC scan + collect per probe would
    cost a full job — the streaming sink probes its ledger once per
    micro-batch with this."""
    jvm = spark._sc._jvm  # noqa: SLF001 — java.sql lives JVM-side
    conn = _connect(jvm, target)
    try:
        stmt = conn.createStatement()
        try:
            rs = stmt.executeQuery(sql)
            out = []
            while rs.next():
                out.append(rs.getObject(1))
            rs.close()
            return out
        finally:
            stmt.close()
    finally:
        conn.close()


def execute_transaction(
    spark: SparkSession,
    target: JdbcTarget,
    statements: list[str],
) -> None:
    """Run ``statements`` as ONE all-or-nothing transaction over a single
    JVM connection (autocommit off, commit at the end, rollback +
    re-raise on any failure) — the per-table transaction bracket the
    reference wraps each load in (run_engine.py:255-266), offered on the
    sink side for multi-statement atomicity (the streaming exactly-once
    publish in streaming/batch_sink.py relies on it)."""
    jvm = spark._sc._jvm  # noqa: SLF001 — java.sql lives JVM-side
    conn = _connect(jvm, target)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


# --- K2: idempotent database creation -----------------------------------


def _sql_states(exc: Exception) -> set[str]:
    """SQLStates along the Java cause chain of a py4j-raised error
    (empty for non-JVM exceptions). Derby wraps the interesting
    SQLException a level or two down, so the chain is walked (bounded —
    Java cause chains can self-reference)."""
    states: set[str] = set()
    j = getattr(exc, "java_exception", None)
    for _ in range(10):
        if j is None:
            break
        get_state = getattr(j, "getSQLState", None)
        if get_state is not None:
            try:
                s = get_state()
            except Exception:
                s = None
            if s:
                states.add(s)
        j = j.getCause() if hasattr(j, "getCause") else None
    return states


def ensure_database_statements(db_name: str) -> tuple[str, str]:
    """The mssql check/create SQL pair of the reference's
    ``ensure_database`` (apply_mssql.py:27-43): probe ``sys.databases``
    for the name, and bracket-quote the CREATE so reserved words /
    odd characters in the db name survive — with T-SQL escaping the
    reference skips (doubled ``'`` in the string literal, doubled ``]``
    inside the brackets), so a quote in the name can neither break nor
    widen the probe. Exposed separately so the statement text is
    unit-testable without a live SQL Server."""
    if not db_name:
        raise ValueError("db_name must be non-empty")
    probe_name = db_name.replace("'", "''")
    bracket_name = db_name.replace("]", "]]")
    check = f"SELECT database_id FROM sys.databases WHERE name = '{probe_name}'"
    create = f"CREATE DATABASE [{bracket_name}]"
    return check, create


def ensure_database(
    spark: SparkSession, target: JdbcTarget, db_name: str
) -> bool:
    """K2 — idempotent database creation (apply_mssql.py:27-43): make
    sure ``db_name`` exists before a deploy, creating it only when
    absent. Returns True iff this call created it.

    - mssql: like the reference's ``make_conn_str(args, 'master')``,
      ``target`` must point at an admin database (CREATE DATABASE cannot
      run from inside the database being created); the probe is the
      reference's ``sys.databases`` lookup, the create its bracketed
      ``CREATE DATABASE``.
    - derby (the sandbox-testable stand-in): the database IS the URL
      path, so ``db_name`` is ignored; existence is probed by connecting
      WITHOUT the ``create=true`` attribute (fails with XJ004 when the
      path is absent), and creation is one connection WITH it — Derby's
      native check-then-create.
    - generic: issues ``CREATE DATABASE <name>`` with error containment
      and reports created-iff-no-error (no portable catalog probe
      exists across engines).
    """
    if target.dialect == "derby":
        base = ";".join(
            p for p in target.url.split(";") if not p.lower().startswith("create=")
        )
        jvm = spark._sc._jvm  # noqa: SLF001 — java.sql lives JVM-side
        probe = JdbcTarget(
            url=base, driver=target.driver,
            properties=target.properties, dialect="derby",
        )
        try:
            _connect(jvm, probe).close()
            return False
        except Exception as exc:
            # only "database not found" means "absent": embedded Derby
            # raises SQLState XJ004; the network client surfaces the
            # same condition as 08004 (connection authorization/database
            # not found — and if 08004 were actually an auth failure,
            # the create=true connect below fails loudly the same way,
            # so nothing is masked). Anything else — bad driver/
            # classpath, permissions, a corrupt-but-existing database
            # (XJ040) — must surface, not be misread as absence and
            # "created" over.
            if not {"XJ004", "08004"} & _sql_states(exc):
                raise
        creator = JdbcTarget(
            url=base + ";create=true", driver=target.driver,
            properties=target.properties, dialect="derby",
        )
        _connect(jvm, creator).close()
        return True
    if target.dialect == "mssql":
        check, create = ensure_database_statements(db_name)
        if query_values(spark, target, check):
            return False
        execute_statements(spark, target, [create], continue_on_error=False)
        return True
    if not db_name:
        raise ValueError("db_name must be non-empty")
    log = execute_statements(
        spark, target, [f"CREATE DATABASE {db_name}"], continue_on_error=True
    )
    return log[0][1] is None


# --- K4: constraint/trigger gate ---------------------------------------


def constraint_gate_statements(
    target: JdbcTarget, tables: list[str], enable: bool
) -> list[str]:
    """Statements to disable (before bulk load) or re-enable (after) FK
    checking. MSSQL uses the reference's server-wide forms; other dialects
    get per-table generic SQL (Derby has no session FK toggle — callers
    load parent-first instead, which our toposort guarantees anyway)."""
    if target.dialect == "mssql":
        if enable:
            return [
                "EXEC sp_msforeachtable 'ALTER TABLE ? WITH CHECK CHECK CONSTRAINT all'",
                "EXEC sp_msforeachtable 'ALTER TABLE ? ENABLE TRIGGER all'",
            ]
        return [
            "EXEC sp_msforeachtable 'ALTER TABLE ? NOCHECK CONSTRAINT all'",
            "EXEC sp_msforeachtable 'ALTER TABLE ? DISABLE TRIGGER all'",
        ]
    if target.dialect == "generic":
        kw = "ENABLE" if enable else "DISABLE"
        return [f"ALTER TABLE {t} {kw} CONSTRAINT ALL" for t in tables]
    return []  # derby: dependency order (O1) makes the gate unnecessary


# --- K3: bulk append ----------------------------------------------------


def write_table(
    df: DataFrame,
    target: JdbcTarget,
    table: str,
    mode: str = "append",
    batchsize: int = 1000,
    num_partitions: int | None = None,
    isolation_level: str = "READ_UNCOMMITTED",
) -> None:
    """Parallel bulk append. ``num_partitions`` caps concurrent
    connections (repartitions only when the df has more)."""
    if num_partitions and df.rdd.getNumPartitions() > num_partitions:
        df = df.coalesce(num_partitions)
    (
        df.write.mode(mode)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
        .jdbc(target.url, table, properties=target.jdbc_properties())
    )


# --- S4-S8: reads -------------------------------------------------------


def read_table(
    spark: SparkSession,
    target: JdbcTarget,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """Table scan; with a numeric ``partition_column`` + bounds the read
    fans out to ``num_partitions`` parallel range queries."""
    reader = spark.read.format("jdbc").option("url", target.url).option("dbtable", table)
    for k, v in target.jdbc_properties().items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def load_plan_to_live_db(
    plan,
    target: JdbcTarget,
    fetch_limit: int = 1_000_000,
    batchsize: int = 1000,
    num_partitions: int | None = None,
    parallelism: int | None = None,
) -> list[str]:
    """Generate + bulk-append every table of a GenerationPlan into a LIVE
    database in dependency order, with identity read-back: after a table
    with an IDENTITY PK is appended, its REAL keys are fetched from the
    database (run_engine.py:265-266 re-fetches after insert) and override
    the executor's assumed 1..n sequence — children of a pre-populated
    table then reference actual DB keys, not fabricated ones.

    ``parallelism`` > 1 loads each FK dependency LEVEL's tables on that
    many concurrent threads (``plan.build_levels()`` — level-mates share
    no FK edge, so their appends cannot race a constraint, and the level
    barrier guarantees every identity read-back lands before any child
    samples it). The reference loads one table at a time on one
    connection (run_engine.py:220); this is the same correctness order
    with per-level fan-out on top of the per-table ``numPartitions``
    connection fan-out.

    Returns the load order (also the constraint-safe order, O1)."""
    spark = plan.spark

    def load_one(name: str) -> None:
        table = plan.tables[name]
        df = plan.build_one(name)
        write_table(df, target, name, batchsize=batchsize, num_partitions=num_partitions)
        for pk_col in table.pk:
            try:
                spec = table.column(pk_col)
            except KeyError:
                continue
            if spec.identity:
                keys = fetch_parent_keys(spark, target, name, pk_col, limit=fetch_limit)
                plan.parent_keys_override.setdefault(name, {})[pk_col] = keys

    # one implementation of the level-concurrency contract (the plan's)
    plan.for_each_level(load_one, parallelism)
    return [n for n in plan.build_order() if not plan.skips(n)]


def fetch_parent_keys(
    spark: SparkSession, target: JdbcTarget, table: str, pk: str, limit: int = 1000
) -> list:
    """ID-cache refill (run_engine.py:142-153): pushed-down limited key
    scan. The LIMIT executes server-side via the query pushdown."""
    if target.dialect == "mssql":
        query = f"SELECT TOP {limit} {pk} FROM {table} WITH (NOLOCK)"
    else:
        query = f"SELECT {pk} FROM {table} FETCH FIRST {limit} ROWS ONLY"
    df = (
        spark.read.format("jdbc")
        .option("url", target.url)
        .option("query", query)
        .options(**target.jdbc_properties())
        .load()
    )
    return [r[0] for r in df.collect()]
