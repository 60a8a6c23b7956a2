"""Live JDBC catalog introspection (reference S4-S9).

The reference reads INFORMATION_SCHEMA / sys.foreign_keys with raw MSSQL
SQL (run_engine.py:85-153) and SQLAlchemy reflection (fill_db.py:42-56).
Here we use ``java.sql.DatabaseMetaData`` through the driver JVM — the
engine-agnostic catalog API, so the same code introspects Derby (tests),
SQL Server, or Postgres.

Driver-side metadata work: catalogs are never data-sized.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.model import ColumnSpec, FKSpec, TableSpec, wire_fk_rules
from ..sinks.jdbc import JdbcTarget

# java.sql.Types code -> canonical dtype
_JDBC_TYPES: dict[int, str] = {
    12: "string", 1: "string", -9: "string", -15: "string", 2005: "string",  # VARCHAR/CHAR/N*/CLOB
    4: "int", 5: "short", -6: "short", -5: "long",
    2: "decimal", 3: "decimal",  # NUMERIC / DECIMAL
    6: "double", 8: "double", 7: "float",
    16: "boolean", -7: "boolean",
    91: "date", 93: "timestamp", 92: "time",
    -2: "binary", -3: "binary", -4: "binary", 2004: "binary",  # *BINARY/BLOB
}


def introspect_catalog(
    spark: SparkSession,
    target: JdbcTarget,
    schema_pattern: str | None = None,
) -> dict[str, TableSpec]:
    """Full catalog scan: tables (S4), columns + identity/generated (S5),
    primary keys (S7), imported foreign keys (S6) — one DatabaseMetaData
    session, no per-table SQL."""
    gw = spark._sc._gateway  # noqa: SLF001
    jvm = gw.jvm
    if target.driver:
        jvm.java.lang.Class.forName(target.driver)
    conn = jvm.java.sql.DriverManager.getConnection(target.url)
    tables: dict[str, TableSpec] = {}
    try:
        meta = conn.getMetaData()

        types_arr = gw.new_array(jvm.java.lang.String, 1)  # py4j needs String[]
        types_arr[0] = "TABLE"
        rs = meta.getTables(None, schema_pattern, "%", types_arr)
        names: list[tuple[str, str]] = []  # (schema, table)
        while rs.next():
            names.append((rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")))
        rs.close()

        for schem, name in names:
            spec = TableSpec(name=name)

            cols = meta.getColumns(None, schem, name, "%")
            while cols.next():
                code = cols.getInt("DATA_TYPE")
                base = _JDBC_TYPES.get(code, "string")
                size = cols.getInt("COLUMN_SIZE")
                digits = cols.getInt("DECIMAL_DIGITS")
                is_dec = base == "decimal"
                spec.columns.append(
                    ColumnSpec(
                        name=cols.getString("COLUMN_NAME"),
                        dtype=f"decimal({size},{digits})" if is_dec else base,
                        nullable=cols.getString("IS_NULLABLE") != "NO",
                        length=size if base == "string" else None,
                        precision=size if is_dec else None,
                        scale=digits if is_dec else None,
                        identity=cols.getString("IS_AUTOINCREMENT") == "YES",
                        computed=cols.getString("IS_GENERATEDCOLUMN") == "YES",
                        unsafe=base == "binary",
                    )
                )
            cols.close()

            pks = meta.getPrimaryKeys(None, schem, name)
            pk_cols: list[tuple[int, str]] = []
            while pks.next():
                pk_cols.append((pks.getShort("KEY_SEQ"), pks.getString("COLUMN_NAME")))
            pks.close()
            spec.pk = [c for _, c in sorted(pk_cols)]

            fks = meta.getImportedKeys(None, schem, name)
            fk_map: dict[str, list[tuple[int, str, str, str]]] = {}
            while fks.next():
                fk_name = fks.getString("FK_NAME") or f"fk_{len(fk_map)}"
                fk_map.setdefault(fk_name, []).append(
                    (
                        fks.getShort("KEY_SEQ"),
                        fks.getString("FKCOLUMN_NAME"),
                        fks.getString("PKTABLE_NAME"),
                        fks.getString("PKCOLUMN_NAME"),
                    )
                )
            fks.close()
            for fk_name, parts in fk_map.items():
                parts.sort()
                spec.fks.append(
                    FKSpec(
                        columns=[p[1] for p in parts],
                        parent_table=parts[0][2],
                        parent_columns=[p[3] for p in parts],
                        name=fk_name,
                    )
                )

            tables[name] = spec
    finally:
        conn.close()

    wire_fk_rules(tables)
    return tables


def fetch_parent_key_cache(
    spark: SparkSession,
    target: JdbcTarget,
    tables: dict[str, TableSpec],
    limit: int = 1000,
) -> dict[str, list]:
    """The reference's ID cache (run_engine.py:46,142-153): up to `limit`
    live PK values per FK-referenced parent table."""
    from ..sinks.jdbc import fetch_parent_keys

    parents = {fk.parent_table for t in tables.values() for fk in t.fks}
    cache: dict[str, list] = {}
    for p in sorted(parents):
        spec = tables.get(p)
        if spec is None or not spec.pk:
            continue
        cache[p] = fetch_parent_keys(spark, target, p, spec.pk[0], limit=limit)
    return cache
