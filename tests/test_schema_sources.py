"""Schema-source parity: JSONL description scan (S3) and live JDBC
catalog introspection (S4-S9) must both produce TableSpecs the planner
can run — including the reference's rule-precedence ordering (FK >
description > name > type default).
"""

from __future__ import annotations

import pytest

from synthetic_data_transfer_to_relational_database_spark.plans.executor import GenerationPlan
from synthetic_data_transfer_to_relational_database_spark.plans.rules import infer_table_rules
from synthetic_data_transfer_to_relational_database_spark.sinks.deploy import deploy_statements
from synthetic_data_transfer_to_relational_database_spark.sinks.jdbc import (
    JdbcTarget,
    read_table,
    write_table,
)
from synthetic_data_transfer_to_relational_database_spark.sources.jdbc_catalog import (
    introspect_catalog,
)
from synthetic_data_transfer_to_relational_database_spark.sources.jsonl_schema import (
    parse_jsonl_schema,
)

JSONL = """\
{"table_name": "Musteri", "columns": [{"column_name": "Id", "data_type": "uniqueidentifier", "nullable": false}, {"column_name": "Kolon1", "data_type": "nvarchar(100)", "description_tr": "M\\u00fc\\u015fteri e-posta adresi"}, {"column_name": "Bakiye", "data_type": "numeric(25,6)", "description_tr": "G\\u00fcncel bakiye tutar\\u0131"}, {"column_name": "Kayit", "data_type": "date", "description_tr": "Kay\\u0131t tarihi"}], "foreign_keys": []}
not valid json at all
{"table_name": "Siparis", "columns": [{"column_name": "Id", "data_type": "uniqueidentifier", "nullable": false}, {"column_name": "MusteriId", "data_type": "uniqueidentifier", "description_tr": "M\\u00fc\\u015fteri e-posta adresi (yanl\\u0131\\u015f a\\u00e7\\u0131klama)"}], "foreign_keys": [{"column": "MusteriId", "references": "Musteri.Id"}]}
"""


def test_jsonl_parse_and_rule_tiers(tmp_path):
    p = tmp_path / "schema.jsonl"
    p.write_text(JSONL, encoding="utf-8")
    tables = parse_jsonl_schema(p)
    assert set(tables) == {"Musteri", "Siparis"}  # bad line skipped

    m = tables["Musteri"]
    rules = infer_table_rules(m)
    # tier 2: description wins over the meaningless column name
    assert rules["Kolon1"] == "email"
    # description 'tutar' on a decimal column -> bounded pyfloat
    assert rules["Bakiye"].startswith("pyfloat")
    assert rules["Kayit"] == "date_this_decade"

    s = tables["Siparis"]
    rules_s = infer_table_rules(s)
    # FK precedence beats the (deliberately wrong) email description
    assert rules_s["MusteriId"] == "foreign_key:Musteri.Id"


DDL = [
    """CREATE TABLE CatParent (
         Id INT NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
         Kod VARCHAR(10) NOT NULL,
         Bakiye DECIMAL(18,2))""",
    """CREATE TABLE CatChild (
         Id VARCHAR(36) NOT NULL PRIMARY KEY,
         ParentId INT REFERENCES CatParent(Id),
         Eposta VARCHAR(100))""",
]


@pytest.fixture(scope="module")
def derby_cat(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_cat") / "catdb"
    t = JdbcTarget(url=f"jdbc:derby:{db};create=true", dialect="derby")
    log = deploy_statements(spark, t, DDL)
    assert all(err is None for _, err in log)
    return t


def test_catalog_introspection(spark, derby_cat):
    tables = introspect_catalog(spark, derby_cat, schema_pattern="APP")
    assert {"CATPARENT", "CATCHILD"} <= set(tables)

    parent = tables["CATPARENT"]
    by_name = {c.name: c for c in parent.columns}
    assert by_name["ID"].identity is True  # excluded from generation
    assert by_name["BAKIYE"].dtype == "decimal(18,2)"
    assert parent.pk == ["ID"]

    child = tables["CATCHILD"]
    assert len(child.fks) == 1
    fk = child.fks[0]
    assert fk.parent_table == "CATPARENT" and fk.columns == ["PARENTID"]
    # FK rule wired through to the column
    assert child.column("PARENTID").rule == "foreign_key:CATPARENT.ID"


def test_catalog_roundtrip_generate_load(spark, derby_cat):
    """The reference's full live-DB loop: introspect -> infer rules ->
    generate -> dependency-ordered load -> verify in the database."""
    tables = {
        k: v
        for k, v in introspect_catalog(spark, derby_cat, schema_pattern="APP").items()
        if k in ("CATPARENT", "CATCHILD")
    }
    for t in tables.values():
        infer_table_rules(t)
    plan = GenerationPlan(
        spark, tables, seed=3, row_counts={"CATPARENT": 20, "CATCHILD": 100}
    )
    built = plan.run(materialize=True)

    # identity PK is database-assigned: the generator must NOT emit it
    assert "ID" not in built["CATPARENT"].columns

    for name in plan.build_order():
        write_table(built[name], derby_cat, name, num_partitions=2)

    assert read_table(spark, derby_cat, "CATPARENT").count() == 20
    child_back = read_table(spark, derby_cat, "CATCHILD")
    assert child_back.count() == 100
    # IDENTITY(1,1) values are known up front (idx+1), so generated FKs
    # land exactly on Derby's assigned keys — Derby enforced this on
    # append; double-check the domain here (nullable FK ⇒ some nulls)
    non_null = child_back.filter("PARENTID IS NOT NULL")
    assert non_null.count() > 0
    assert non_null.filter("PARENTID < 1 OR PARENTID > 20").count() == 0


def test_introspected_catalog_emits_deployable_ddl(spark, derby_cat):
    """Close the loop the reference leaves open: a LIVE catalog (S4-S7
    via DatabaseMetaData) -> TableSpecs -> T-SQL DDL whose re-parse is a
    fixpoint — including the deployability corrections (PK NOT NULL,
    out-of-range lengths -> nvarchar(max), external-parent FKs
    skipped)."""
    from synthetic_data_transfer_to_relational_database_spark.sources.ddl import (
        parse_create_table,
        parse_foreign_keys,
        schema_to_ddl,
    )

    tables = {
        k: v
        for k, v in introspect_catalog(spark, derby_cat, schema_pattern="APP").items()
        if k in ("CATPARENT", "CATCHILD")
    }
    batches = schema_to_ddl(tables)
    creates = [b for b in batches if b.startswith("CREATE TABLE")]
    alters = [b for b in batches if b.startswith("ALTER TABLE")]
    assert len(creates) == 2 and len(alters) == 1
    # parent must precede child (FK dependency order)
    assert "CATPARENT" in creates[0] and "CATCHILD" in creates[1]

    reparsed = {s.name: s for s in (parse_create_table(b) for b in creates)}
    for name, orig in tables.items():
        back = reparsed[name]
        assert back.pk == orig.pk
        for a, b in zip(orig.columns, back.columns):
            assert a.name == b.name and a.dtype == b.dtype, (name, a.name)
            assert a.identity == b.identity
            # PK members are corrected NOT NULL; others keep nullability
            expected_null = a.nullable and a.name not in orig.pk
            assert b.nullable == expected_null, (name, a.name)
    (child, fk), = parse_foreign_keys(alters)
    assert child == "CATCHILD" and fk.parent_table == "CATPARENT"
