"""End-to-end JDBC round trip against embedded Apache Derby (ships with
Spark): deploy DDL → generate → bulk append parent-first → read back →
verify FK closure — the reference's full run_engine.py pipeline shape
against a real relational database instead of MSSQL.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from synthetic_data_transfer_to_relational_database_spark.plans.executor import GenerationPlan
from synthetic_data_transfer_to_relational_database_spark.plans.model import (
    ColumnSpec,
    FKSpec,
    TableSpec,
    wire_fk_rules,
)
from synthetic_data_transfer_to_relational_database_spark.sinks.deploy import deploy_statements
from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
    JdbcTarget,
    execute_statements,
    fetch_parent_keys,
    read_table,
    write_table,
)


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return JdbcTarget(url=f"jdbc:derby:{db};create=true", dialect="derby")


def _schema() -> dict[str, TableSpec]:
    tables = {
        "Musteri": TableSpec(
            name="Musteri",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("Unvan", "string", nullable=False, length=100),
            ],
            pk=["Id"],
            fks=[],
        ),
        "Siparis": TableSpec(
            name="Siparis",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("MusteriId", "uuid", nullable=False, length=36),
                ColumnSpec("Tutar", "decimal(18,2)", nullable=True, precision=18, scale=2),
            ],
            pk=["Id"],
            fks=[FKSpec(["MusteriId"], "Musteri", ["Id"])],
        ),
    }
    wire_fk_rules(tables)
    return tables


DDL = [
    "CREATE TABLE Musteri (Id VARCHAR(36) NOT NULL PRIMARY KEY, Unvan VARCHAR(100) NOT NULL)",
    """CREATE TABLE Siparis (Id VARCHAR(36) NOT NULL PRIMARY KEY,
       MusteriId VARCHAR(36) NOT NULL REFERENCES Musteri(Id),
       Tutar DECIMAL(18,2))""",
]


def test_deploy_error_containment(spark, derby):
    log = deploy_statements(spark, derby, DDL + ["CREATE GARBAGE SYNTAX"])
    assert [err for _, err in log[:2]] == [None, None]
    assert log[2][1] is not None  # bad batch reported, run not aborted


def test_bulk_load_fk_closure_roundtrip(spark, derby):
    tables = _schema()
    plan = GenerationPlan(
        spark, tables, seed=7, row_counts={"Musteri": 50, "Siparis": 400}
    )
    built = plan.run(materialize=True)

    # parent-first load order comes from the same toposort the planner used
    for name in plan.build_order():
        write_table(built[name], derby, name, batchsize=200, num_partitions=4)

    # read back with a real FK join on the database copy (Derby enforced
    # the FK constraint during the append — a violation would have failed
    # the write; this verifies the data survived the round trip intact)
    # Derby folds unquoted identifiers to upper case; Spark resolution is
    # case-insensitive so F.col("MUSTERIID") vs generated "MusteriId" is fine
    musteri = read_table(spark, derby, "Musteri")
    siparis = read_table(spark, derby, "Siparis")
    assert musteri.count() == 50
    assert siparis.count() == 400
    parent_ids = musteri.select(F.col("ID").alias("PARENT_ID"))
    dangling = siparis.join(
        parent_ids, F.col("MUSTERIID") == F.col("PARENT_ID"), "left_anti"
    )
    assert dangling.count() == 0

    # decimal fidelity through JDBC
    types = {k.upper(): v for k, v in siparis.dtypes}
    assert types["TUTAR"] == "decimal(18,2)"


def test_fetch_parent_keys_limit_pushdown(spark, derby):
    keys = fetch_parent_keys(spark, derby, "Musteri", "Id", limit=10)
    assert len(keys) == 10
    assert all(isinstance(k, str) and len(k) == 36 for k in keys)


def test_parallel_partitioned_read(spark, derby):
    # numeric partition column fan-out: 4 range queries
    execute_statements(
        spark,
        derby,
        [
            "CREATE TABLE NumTab (n INT NOT NULL PRIMARY KEY, v VARCHAR(10))",
        ],
    )
    df = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("n"), F.lit("x").alias("v")
    )
    write_table(df, derby, "NumTab", num_partitions=4)
    back = read_table(
        spark, derby, "NumTab", partition_column="n", lower_bound=0, upper_bound=1000, num_partitions=4
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000


def test_identity_readback_against_prepopulated_parent(spark, derby):
    """Live-DB append path: the parent table ALREADY has rows (identities
    1..5 assigned by the DB before we arrive), we append 20 generated rows
    (identities 6..25), and the child must sample from the REAL fetched
    key set 1..25 — not the executor's assumed 1..n sequence."""
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        load_plan_to_live_db,
    )

    execute_statements(
        spark,
        derby,
        [
            """CREATE TABLE Kategori (
                 Id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
                 Ad VARCHAR(50) NOT NULL)""",
            """CREATE TABLE Urun (
                 Id VARCHAR(36) NOT NULL PRIMARY KEY,
                 KategoriId INT NOT NULL REFERENCES Kategori(Id),
                 Ad VARCHAR(50) NOT NULL)""",
        ]
        + [f"INSERT INTO Kategori (Ad) VALUES ('pre-{i}')" for i in range(5)],
    )

    tables = {
        "Kategori": TableSpec(
            name="Kategori",
            columns=[
                ColumnSpec("Id", "int", nullable=False, identity=True),
                ColumnSpec("Ad", "string", nullable=False, length=50),
            ],
            pk=["Id"],
        ),
        "Urun": TableSpec(
            name="Urun",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("KategoriId", "int", nullable=False),
                ColumnSpec("Ad", "string", nullable=False, length=50),
            ],
            pk=["Id"],
            fks=[FKSpec(["KategoriId"], "Kategori", ["Id"])],
        ),
    }
    wire_fk_rules(tables)
    plan = GenerationPlan(spark, tables, seed=3, row_counts={"Kategori": 20, "Urun": 120})
    load_plan_to_live_db(plan, derby, batchsize=100)

    # read-back happened and saw the pre-populated identities
    fetched = plan.parent_keys_override["Kategori"]["Id"]
    assert sorted(fetched) == list(range(1, 26))

    urun = read_table(spark, derby, "Urun")
    assert urun.count() == 120
    sampled = {r[0] for r in urun.select("KATEGORIID").collect()}
    assert sampled <= set(range(1, 26))
    # the assumed-1..n path could never emit keys > 20: seeing them proves
    # children sampled the fetched live keys (P(miss all 5) ≈ (20/25)^120)
    assert max(sampled) > 20


def test_execute_transaction_rolls_back_atomically(spark, derby):
    """The streaming sink's publish step rests on execute_transaction
    being all-or-nothing: a failing statement mid-transaction must undo
    the statements before it and re-raise."""
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        execute_transaction,
        query_values,
    )

    execute_statements(
        spark, derby, ["CREATE TABLE TxProbe (N BIGINT NOT NULL PRIMARY KEY)"],
        continue_on_error=False,
    )
    execute_transaction(spark, derby, ["INSERT INTO TxProbe VALUES (1)"])
    with pytest.raises(Exception):
        execute_transaction(
            spark,
            derby,
            [
                "INSERT INTO TxProbe VALUES (2)",   # would succeed alone
                "INSERT INTO TxProbe VALUES (1)",   # PK violation -> rollback
            ],
        )
    vals = sorted(int(v) for v in query_values(spark, derby, "SELECT N FROM TxProbe"))
    assert vals == [1]  # the committed row only; 2 was rolled back


@pytest.mark.skipif(
    not __import__("os").environ.get("SDT_MSSQL_URL"),
    reason="live MSSQL dialect test: set SDT_MSSQL_URL "
    "(jdbc:sqlserver://...;user=...;password=...) to run — no SQL Server "
    "in the sandbox; Derby cannot exercise sp_msforeachtable or GO-batch "
    "replay (the documented dialect gap, reference run_engine.py:227-228)",
)
def test_mssql_dialect_live_constraint_gate_and_load(spark):
    """Against a real SQL Server (env-gated): deploy the mini schema,
    verify the sp_msforeachtable NOCHECK/CHECK bracket actually toggles
    (an FK-violating insert succeeds inside the bracket, fails outside),
    bulk-append through write_table, and read the rows back."""
    import os

    target = JdbcTarget(url=os.environ["SDT_MSSQL_URL"], dialect="mssql")
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        constraint_gate_statements,
        query_values,
    )

    execute_statements(
        spark, target, ["DROP TABLE Siparis", "DROP TABLE Musteri"],
        continue_on_error=True,
    )
    results = execute_statements(spark, target, DDL, continue_on_error=False)
    assert all(err is None for _, err in results)

    # inside the bracket an orphan FK row must be accepted (the
    # reference's load mode), outside it must be rejected
    execute_statements(
        spark, target, constraint_gate_statements(target, [], enable=False)
    )
    orphan = (
        "INSERT INTO Siparis (Id, MusteriId, Tutar) "
        "VALUES ('o1', 'no-such-parent', 1.00)"
    )
    assert execute_statements(spark, target, [orphan])[0][1] is None
    execute_statements(spark, target, ["DELETE FROM Siparis"])
    execute_statements(
        spark, target, constraint_gate_statements(target, [], enable=True)
    )
    assert execute_statements(spark, target, [orphan])[0][1] is not None

    plan = GenerationPlan(
        spark, _schema(), seed=7, row_counts={"Musteri": 50, "Siparis": 200}
    )
    built = plan.run(materialize=False)
    write_table(built["Musteri"], target, "Musteri")
    write_table(built["Siparis"], target, "Siparis")
    assert query_values(spark, target, "SELECT COUNT(*) FROM Siparis") == [200]
    orphans = query_values(
        spark,
        target,
        "SELECT COUNT(*) FROM Siparis s "
        "LEFT JOIN Musteri m ON m.Id = s.MusteriId WHERE m.Id IS NULL",
    )
    assert orphans == [0]


def test_ensure_database_fresh_derby(spark, tmp_path):
    """K2 (apply_mssql.py:27-43): first call creates, second is a no-op."""
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        ensure_database,
        query_values,
    )

    db = tmp_path / "k2db"
    target = JdbcTarget(url=f"jdbc:derby:{db}", dialect="derby")
    assert ensure_database(spark, target, "k2db") is True
    assert ensure_database(spark, target, "k2db") is False
    # the created database is usable through the normal executor path
    ok = execute_statements(
        spark, target, ["CREATE TABLE T (N INT)", "INSERT INTO T VALUES (7)"],
        continue_on_error=False,
    )
    assert all(err is None for _, err in ok)
    assert query_values(spark, target, "SELECT N FROM T") == [7]


def test_ensure_database_mssql_statement_text(spark, monkeypatch):
    """mssql path replays the reference's sys.databases probe +
    bracketed CREATE, and skips the CREATE when the probe hits."""
    from synthetic_data_transfer_to_relational_database_spark.sinks import jdbc as jdbc_mod
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        ensure_database,
        ensure_database_statements,
    )

    check, create = ensure_database_statements("LINKDB")
    assert check == "SELECT database_id FROM sys.databases WHERE name = 'LINKDB'"
    assert create == "CREATE DATABASE [LINKDB]"

    seen = {"probes": [], "creates": []}

    def fake_query_values(spark_, target_, sql):
        seen["probes"].append(sql)
        return [] if len(seen["probes"]) == 1 else [1]

    def fake_execute(spark_, target_, statements, continue_on_error=True):
        seen["creates"].extend(statements)
        return [(s, None) for s in statements]

    monkeypatch.setattr(jdbc_mod, "query_values", fake_query_values)
    monkeypatch.setattr(jdbc_mod, "execute_statements", fake_execute)
    master = JdbcTarget(url="jdbc:sqlserver://h;databaseName=master", dialect="mssql")
    assert ensure_database(spark, master, "LINKDB") is True  # absent -> created
    assert ensure_database(spark, master, "LINKDB") is False  # present -> no-op
    assert seen["probes"] == [check, check]
    assert seen["creates"] == [create]


def test_deploy_script_create_db_bracket(spark, tmp_path):
    """deploy_script(create_db=True) ensures the database exists before
    replaying the dump — a fresh Derby path needs no manual create."""
    from synthetic_data_transfer_to_relational_database_spark.sinks.deploy import deploy_script
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import query_values

    script = tmp_path / "dump.sql"
    script.write_text(
        "CREATE TABLE K2T (N INT)\nGO\nINSERT INTO K2T VALUES (42)\nGO\n",
        encoding="utf-16",
    )
    db = tmp_path / "deploydb"
    target = JdbcTarget(url=f"jdbc:derby:{db}", dialect="derby")
    log = deploy_script(spark, target, str(script), create_db=True)
    assert all(err is None for _, err in log)
    assert query_values(spark, target, "SELECT N FROM K2T") == [42]


def test_erasure_delete_child_first_with_live_constraints(spark, tmp_path):
    """End-to-end GDPR purge: generate + load the mini ERP schema into a
    FRESH Derby db with ACTIVE FK constraints, run the FK-ordered
    child-first DELETE plan for a customer cohort, and verify the cohort
    is gone, unrelated rows survive, and referential integrity held
    throughout (no constraint-disable bracket needed)."""
    from synthetic_data_transfer_to_relational_database_spark.plans.erasure import (
        erasure_delete_statements,
    )
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        ensure_database,
        query_values,
    )

    db = tmp_path / "erasuredb"
    target = JdbcTarget(url=f"jdbc:derby:{db}", dialect="derby")
    ensure_database(spark, target, "erasuredb")
    assert all(
        err is None for _, err in execute_statements(spark, target, DDL)
    )
    tables = _schema()
    plan = GenerationPlan(
        spark, tables, seed=3, row_counts={"Musteri": 40, "Siparis": 300}
    )
    built = plan.run(materialize=False)
    write_table(built["Musteri"], target, "Musteri")
    write_table(built["Siparis"], target, "Siparis")

    victims = query_values(
        spark, target, "SELECT Id FROM Musteri FETCH FIRST 5 ROWS ONLY"
    )
    in_list = ", ".join(f"'{v}'" for v in victims)
    stmts = erasure_delete_statements(tables, "Musteri", f"Id IN ({in_list})")
    # child-first: Siparis DELETE precedes Musteri DELETE
    assert [s.split()[2] for s in stmts] == ["Siparis", "Musteri"]
    log = execute_statements(spark, target, stmts, continue_on_error=False)
    assert all(err is None for _, err in log)

    assert query_values(
        spark, target, f"SELECT COUNT(*) FROM Musteri WHERE Id IN ({in_list})"
    ) == [0]
    assert query_values(
        spark, target,
        f"SELECT COUNT(*) FROM Siparis WHERE MusteriId IN ({in_list})",
    ) == [0]
    # unrelated rows survive and closure still holds
    assert query_values(spark, target, "SELECT COUNT(*) FROM Musteri") == [35]
    orphans = query_values(
        spark, target,
        "SELECT COUNT(*) FROM Siparis s LEFT JOIN Musteri m ON m.Id = s.MusteriId "
        "WHERE m.Id IS NULL",
    )
    assert orphans == [0]


def test_erasure_statements_transitive_chain():
    """Three-level chain (grandchild -> child -> root): predicates nest
    with unique aliases and the order is leaf-first."""
    from synthetic_data_transfer_to_relational_database_spark.plans.erasure import (
        erasure_delete_statements,
    )

    tables = {
        "C": TableSpec(
            name="C",
            columns=[ColumnSpec("Id", "int", nullable=False)],
            pk=["Id"],
            fks=[],
        ),
        "O": TableSpec(
            name="O",
            columns=[
                ColumnSpec("Id", "int", nullable=False),
                ColumnSpec("Cid", "int", nullable=False),
            ],
            pk=["Id"],
            fks=[FKSpec(["Cid"], "C", ["Id"])],
        ),
        "L": TableSpec(
            name="L",
            columns=[
                ColumnSpec("Id", "int", nullable=False),
                ColumnSpec("Oid", "int", nullable=False),
            ],
            pk=["Id"],
            fks=[FKSpec(["Oid"], "O", ["Id"])],
        ),
    }
    stmts = erasure_delete_statements(tables, "C", "Id % 7 = 0")
    assert [s.split()[2] for s in stmts] == ["L", "O", "C"]
    l_stmt = stmts[0]
    # grandchild reaches the root through two nested EXISTS levels with
    # distinct aliases
    assert l_stmt.count("EXISTS") == 2
    aliases = set(re.findall(r"FROM \w+ (e\d+)", l_stmt))
    assert len(aliases) == 2


def test_erasure_self_fk_severs_before_delete(spark, tmp_path):
    """A nullable self-FK is severed (UPDATE ... SET NULL) before the
    cohort DELETE, so surviving rows pointing at doomed rows never
    violate the live constraint; a NOT NULL self-FK refuses to plan."""
    from synthetic_data_transfer_to_relational_database_spark.plans.erasure import (
        erasure_delete_statements,
    )
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        ensure_database,
        query_values,
    )

    def emp_schema(nullable: bool) -> dict[str, TableSpec]:
        tables = {
            "Calisan": TableSpec(
                name="Calisan",
                columns=[
                    ColumnSpec("Id", "uuid", nullable=False, length=36),
                    ColumnSpec("YoneticiId", "uuid", nullable=nullable, length=36),
                ],
                pk=["Id"],
                fks=[FKSpec(["YoneticiId"], "Calisan", ["Id"])],
            )
        }
        wire_fk_rules(tables)
        return tables

    with pytest.raises(ValueError, match="NOT NULL"):
        erasure_delete_statements(emp_schema(False), "Calisan", "1 = 1")

    db = tmp_path / "selffk"
    target = JdbcTarget(url=f"jdbc:derby:{db}", dialect="derby")
    ensure_database(spark, target, "selffk")
    ddl = [
        "CREATE TABLE Calisan (Id VARCHAR(36) NOT NULL PRIMARY KEY, "
        "YoneticiId VARCHAR(36) REFERENCES Calisan(Id))"
    ]
    assert all(err is None for _, err in execute_statements(spark, target, ddl))
    plan = GenerationPlan(spark, emp_schema(True), seed=5, row_counts={"Calisan": 60})
    built = plan.run(materialize=False)
    # parent-pointer rows must insert before referencing rows isn't
    # guaranteed within one bulk append; insert with the constraint
    # satisfied by writing managers first (NULL-manager rows), then rest
    rows = built["Calisan"].collect()
    ins = "INSERT INTO Calisan (Id, YoneticiId) VALUES ('%s', %s)"
    # manager-first insert order: rounds of rows whose manager is in
    stmts, inserted, pending = [], set(), list(rows)
    while pending:
        ready = [
            r for r in pending
            if r["YoneticiId"] is None or r["YoneticiId"] in inserted
        ]
        if not ready:
            break  # rows whose manager chain leads outside: skip
        for r in ready:
            stmts.append(
                ins % (r["Id"], "NULL" if r["YoneticiId"] is None else f"'{r['YoneticiId']}'")
            )
            inserted.add(r["Id"])
        pending = [r for r in pending if r["Id"] not in inserted]
    log = execute_statements(spark, target, stmts, continue_on_error=True)
    loaded = [s for s, err in log if err is None]
    assert len(loaded) >= 30  # enough rows with live self-references

    victims = query_values(
        spark, target,
        "SELECT Id FROM Calisan WHERE YoneticiId IS NULL FETCH FIRST 3 ROWS ONLY",
    )
    in_list = ", ".join(f"'{v}'" for v in victims)
    plan_stmts = erasure_delete_statements(
        emp_schema(True), "Calisan", f"Id IN ({in_list})"
    )
    assert plan_stmts[0].startswith("UPDATE Calisan SET YoneticiId = NULL")
    assert plan_stmts[1].startswith("DELETE FROM Calisan")
    log2 = execute_statements(spark, target, plan_stmts, continue_on_error=False)
    assert all(err is None for _, err in log2)
    assert query_values(
        spark, target, f"SELECT COUNT(*) FROM Calisan WHERE Id IN ({in_list})"
    ) == [0]
    # no dangling manager pointers anywhere
    assert query_values(
        spark, target,
        "SELECT COUNT(*) FROM Calisan c LEFT JOIN Calisan m ON m.Id = c.YoneticiId "
        "WHERE c.YoneticiId IS NOT NULL AND m.Id IS NULL",
    ) == [0]


def test_erasure_refuses_cross_table_fk_cycle():
    from synthetic_data_transfer_to_relational_database_spark.plans.erasure import (
        erasure_delete_statements,
    )

    tables = {
        "X": TableSpec(
            name="X",
            columns=[
                ColumnSpec("Id", "int", nullable=False),
                ColumnSpec("Yid", "int", nullable=True),
            ],
            pk=["Id"],
            fks=[FKSpec(["Yid"], "Y", ["Id"])],
        ),
        "Y": TableSpec(
            name="Y",
            columns=[
                ColumnSpec("Id", "int", nullable=False),
                ColumnSpec("Xid", "int", nullable=True),
            ],
            pk=["Id"],
            fks=[FKSpec(["Xid"], "X", ["Id"])],
        ),
    }
    with pytest.raises(ValueError, match="cycle"):
        erasure_delete_statements(tables, "X", "Id % 2 = 0")


def test_parallel_live_load_preserves_fk_closure(spark, tmp_path):
    """load_plan_to_live_db(parallelism=4): level-mates append
    concurrently against live FK constraints; closure and row counts
    match the serial path."""
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        ensure_database,
        load_plan_to_live_db,
        query_values,
    )

    db = tmp_path / "parload"
    target = JdbcTarget(url=f"jdbc:derby:{db}", dialect="derby")
    ensure_database(spark, target, "parload")
    ddl = [
        "CREATE TABLE Musteri (Id VARCHAR(36) NOT NULL PRIMARY KEY, "
        "Unvan VARCHAR(100) NOT NULL)",
        "CREATE TABLE Siparis (Id VARCHAR(36) NOT NULL PRIMARY KEY, "
        "MusteriId VARCHAR(36) NOT NULL REFERENCES Musteri(Id), "
        "Tutar DECIMAL(18,2))",
        "CREATE TABLE Fatura (Id VARCHAR(36) NOT NULL PRIMARY KEY, "
        "MusteriId VARCHAR(36) NOT NULL REFERENCES Musteri(Id))",
    ]
    assert all(err is None for _, err in execute_statements(spark, target, ddl))

    tables = _schema()
    tables["Fatura"] = TableSpec(
        name="Fatura",
        columns=[
            ColumnSpec("Id", "uuid", nullable=False, length=36),
            ColumnSpec("MusteriId", "uuid", nullable=False, length=36),
        ],
        pk=["Id"],
        fks=[FKSpec(["MusteriId"], "Musteri", ["Id"])],
    )
    wire_fk_rules(tables)
    plan = GenerationPlan(
        spark, tables, seed=21,
        row_counts={"Musteri": 40, "Siparis": 200, "Fatura": 150},
    )
    # Siparis and Fatura share a level -> loaded concurrently
    assert plan.build_levels() == [["Musteri"], ["Fatura", "Siparis"]]
    order = load_plan_to_live_db(plan, target, parallelism=4)
    assert order[0] == "Musteri"
    assert query_values(spark, target, "SELECT COUNT(*) FROM Siparis") == [200]
    assert query_values(spark, target, "SELECT COUNT(*) FROM Fatura") == [150]
    for child in ("Siparis", "Fatura"):
        orphans = query_values(
            spark, target,
            f"SELECT COUNT(*) FROM {child} c LEFT JOIN Musteri m "
            "ON m.Id = c.MusteriId WHERE m.Id IS NULL",
        )
        assert orphans == [0]


def test_erasure_requalify_preserves_string_literals():
    """ADVICE r6: a root predicate whose string literal contains
    '<table>.' (e.g. name LIKE 'C.%' on root table C) must keep its
    literal bytes when embedded in a child's EXISTS — only column
    references outside quotes are re-qualified."""
    from synthetic_data_transfer_to_relational_database_spark.plans.erasure import (
        erasure_delete_statements,
    )

    tables = {
        "C": TableSpec(
            name="C",
            columns=[
                ColumnSpec("Id", "int", nullable=False),
                ColumnSpec("Name", "string"),
            ],
            pk=["Id"],
            fks=[],
        ),
        "O": TableSpec(
            name="O",
            columns=[
                ColumnSpec("Id", "int", nullable=False),
                ColumnSpec("Cid", "int", nullable=False),
            ],
            pk=["Id"],
            fks=[FKSpec(["Cid"], "C", ["Id"])],
        ),
    }
    stmts = erasure_delete_statements(
        tables, "C", "C.Name LIKE 'C.%' AND C.Id > 0"
    )
    child = stmts[0]
    assert "LIKE 'C.%'" in child, child          # literal untouched
    assert re.search(r"e\d+\.Name LIKE", child)  # column ref requalified
    assert re.search(r"e\d+\.Id > 0", child)


def test_sql_states_walks_java_cause_chain():
    """_sql_states: pulls SQLStates from the py4j java_exception cause
    chain (bounded against self-referencing chains), empty for plain
    Python errors — the probe only treats XJ004 as 'database absent'."""
    from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
        _sql_states,
    )

    class JExc:
        def __init__(self, state, cause=None):
            self._state, self._cause = state, cause

        def getSQLState(self):
            return self._state

        def getCause(self):
            return self._cause

    class PyExc(Exception):
        def __init__(self, j):
            self.java_exception = j

    chain = JExc(None, JExc("XJ040", JExc("XJ004")))
    assert _sql_states(PyExc(chain)) == {"XJ040", "XJ004"}
    assert _sql_states(ValueError("boom")) == set()
    loop = JExc("08001")
    loop._cause = loop  # self-referencing cause must terminate
    assert _sql_states(PyExc(loop)) == {"08001"}
