"""Parquet source layer for the driver testdata (TESTDATA.md).

Scans go straight through ``spark.read.parquet`` so Catalyst keeps
predicate pushdown, column pruning and partition pruning. Nothing here
materializes: at 100 TB these are just logical scan nodes.
"""

from __future__ import annotations

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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    read as a timestamp. We read it as raw nanos (legacy conf) and floor
    to microseconds with integer division — exactly the truncation DuckDB
    1.0 applies when it reads the same file, so oracle comparisons stay
    bit-identical. (Float division would corrupt: epoch-ns ≈ 1.7e18 > 2^53.)
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
