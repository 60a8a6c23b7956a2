"""Local replica of the driver's DuckDB-oracle comparison (strict version).

The driver compares row-count + schema + order-insensitive value-hash at
sf=0.01. We compare at least as strictly here: sort columns by name, sort
rows by all columns, then require EXACT equality cell-by-cell (floats must
be bit-identical — the query-design rules in operators/_registry.py make
that achievable). If this harness passes, the driver's hash comparison
passes too.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

from synthetic_data_transfer_to_relational_database_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Normalize a cell to a comparable canonical value."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        # scale differences (Spark decimal(28,2) vs DuckDB decimal(38,2))
        # are representation-only; compare numerically.
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))  # repr is exact for doubles
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _key(row):
    return tuple((x is None, x) for x in (repr(c) for c in row))


def rows_of_spark(df):
    cols = sorted(df.columns)
    return [tuple(_norm(r[c]) for c in cols) for r in df.collect()], cols


def rows_of_duck(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [tuple(_norm(r[i]) for i in order) for r in data], sorted(cols)


def compare(spark_df, con, sql, name=""):
    s_rows, s_cols = rows_of_spark(spark_df)
    d_rows, d_cols = rows_of_duck(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"
    s_sorted = sorted(s_rows, key=_key)
    d_sorted = sorted(d_rows, key=_key)
    n_bad = 0
    first_bad = None
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            n_bad += 1
            if first_bad is None:
                first_bad = (i, a, b)
    assert n_bad == 0, (
        f"{name}: {n_bad}/{len(s_rows)} mismatched rows; first at {first_bad[0]}:\n"
        f"  spark={first_bad[1]}\n  duck ={first_bad[2]}"
    )
