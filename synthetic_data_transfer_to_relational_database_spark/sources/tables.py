"""Parquet source layer for the driver testdata (TESTDATA.md).

Scans go straight through ``spark.read.parquet`` so Catalyst keeps
predicate pushdown, column pruning and partition pruning. Nothing here
materializes: at 100 TB these are just logical scan nodes.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_ts_unit(sf_dir: str) -> str:
    """Parquet time unit of events.ts ('ns' or 'us') from the file footer.

    The driver has shipped both generations of the events table: parquet
    TIMESTAMP(NANOS) (Spark 4 refuses to read it as a timestamp) and plain
    TIMESTAMP(MICROS) with no UTC adjustment (Spark reads TIMESTAMP_NTZ).
    Sources adapt per file rather than assuming one layout; the footer
    read is cached on (path, mtime) — every events-backed query calls
    this, and the answer is a property of an immutable file.
    """
    return parquet_ts_unit(os.path.join(sf_dir, "events.parquet"))


def parquet_ts_unit(path: str) -> str:
    """Per-file form of the same cached sniff — the ONE implementation of
    the ts-annotation rule (the streaming mixed-annotation guard reuses
    it; a future change to the rule happens here only)."""
    return _events_ts_unit_cached(path, os.stat(path).st_mtime_ns)


@functools.lru_cache(maxsize=64)
def _events_ts_unit_cached(path: str, mtime_ns: int) -> str:
    import pyarrow.parquet as pq

    field = pq.read_schema(path).field("ts")
    return getattr(field.type, "unit", "us")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table.

    ``events.ts`` is normalized to session-TZ TimestampType regardless of
    the file's physical annotation:

    - TIMESTAMP(NANOS): read as raw nanos (legacy conf) and floor to
      microseconds with integer division — exactly the truncation DuckDB
      applies to the same file, so oracle comparisons stay bit-identical.
      (Float division would corrupt: epoch-ns ≈ 1.7e18 > 2^53.)
    - TIMESTAMP(MICROS, no UTC adjustment): Spark reads TIMESTAMP_NTZ;
      cast to timestamp is value-identical because the session TZ is
      pinned to UTC (session.py).
    """
    if name == "events":
        from pyspark.sql import functions as F

        if events_ts_unit(sf_dir) == "ns":
            # The legacy conf is consulted at READ/RESOLUTION time only
            # (the relation's schema is fixed once resolved; later
            # actions do not re-check it — verified by the layout
            # tests), so it is scoped to this call and restored: left
            # set session-wide it would silently read any OTHER nanos
            # parquet in the session as longs.
            prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try:
                df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            finally:
                if prev is None:
                    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
                else:
                    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
