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


def zorder_value(cols: list[str], bits: int = 16) -> "Column":
    """Z-order (Morton) key over numeric columns: rank each column into
    ``bits`` levels, interleave the bits. Rows close in EVERY dimension
    get close z-values, so sorting by z clusters multi-dimensional
    neighborhoods into the same parquet row groups — min/max skipping
    then prunes on ANY of the columns, not just the leading sort key.
    Pure expression (percent_rank window per column + bit arithmetic)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import functools

    n = len(cols)
    # the interleaved key must fit in 64 bits: JVM shiftleft wraps shift
    # amounts mod 64, which would silently collide z-values beyond that
    bits = min(bits, 64 // n)
    interleaved = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        # quantize to [0, 2^bits): percent_rank is order-preserving and
        # scale-free, so columns of any numeric range interleave fairly
        q = F.floor(F.percent_rank().over(Window.orderBy(c)) * ((1 << bits) - 1)).cast("long")
        # bit j of q lands at position j*n + i (unrolled: shift amounts
        # must be Python ints for shiftleft/shiftrightunsigned)
        spread = functools.reduce(
            lambda a, b: a.bitwiseOR(b),
            [
                F.shiftleft(F.shiftrightunsigned(q, j).bitwiseAND(F.lit(1)), j * n + i)
                for j in range(bits)
            ],
        )
        interleaved = interleaved.bitwiseOR(spread)
    return interleaved


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by z-order over ``zorder_cols``:
    range-repartition by the z-value (ordered files), sort within
    partitions, write. Readers filtering on ANY z-order column skip row
    groups via parquet min/max stats — the data-skipping layout Delta's
    OPTIMIZE ZORDER produces, expressed with open Spark primitives.

    Note: the per-column percent_rank quantization runs one global-window
    pass per column at write time — acceptable for a write-once layout
    job; at 100 TB swap it for approxQuantile-derived range bounds
    (same z-value semantics, sampled cutpoints, no global window)."""
    from pyspark.sql import functions as F

    z = df.withColumn("__z", zorder_value(zorder_cols))
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
