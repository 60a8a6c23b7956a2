"""foreachBatch sink: stream → arbitrary batch writers with exactly-once
bookkeeping.

The production pattern for sinks Structured Streaming lacks natively
(JDBC upserts, partitioned parquet with custom layout): each micro-batch
arrives as a plain DataFrame plus a monotonically increasing batch_id.
Spark guarantees at-least-once delivery per batch_id after recovery, so
idempotence = skip batch_ids already recorded. We persist the ledger as a
single-row parquet per batch under ``<path>/_batch_ledger/`` — the same
recipe works on any cluster filesystem.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _ledger_path(path: str) -> str:
    return os.path.join(path, "_batch_ledger")


def committed_batch_ids(spark: SparkSession, path: str) -> set[int]:
    try:
        return {r[0] for r in spark.read.parquet(_ledger_path(path)).select("batch_id").collect()}
    except AnalysisException:  # first run: ledger doesn't exist yet.
        # Deliberately narrow: a transient read failure must PROPAGATE —
        # treating it as "no batches committed" would re-append everything.
        return set()


def write_stream_to_parquet(
    sdf: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    available_now: bool = True,
    output_mode: str = "update",
) -> StreamingQuery:
    """Drain/attach a stream into a partitioned parquet dataset via
    foreachBatch, idempotent across batch replays. Default update mode:
    each batch delivers changed rows (aggregations without watermark are
    legal); map-only streams can use append."""
    spark = sdf.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(spark, path):
            # replayed batch after recovery — already written. Spark 4
            # validates that foreachBatch processes every partition
            # (STATE_STORE_COMMIT_VALIDATION), so drain through the noop
            # sink instead of returning early.
            batch_df.write.format("noop").mode("overwrite").save()
            return
        # Each batch OVERWRITES its own batch_id-scoped subdirectory: a
        # crash after the data write but before the ledger append replays
        # into the same directory instead of double-appending, so
        # data-write + ledger-append need not be atomic together.
        writer = batch_df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(os.path.join(path, "data", f"batch_id={batch_id}"))
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode("append").parquet(
            _ledger_path(path)
        )

    writer = sdf.writeStream.outputMode(output_mode).foreachBatch(write_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    # batch_id is the per-batch directory key, not part of the row schema.
    return spark.read.parquet(os.path.join(path, "data")).drop("batch_id")
