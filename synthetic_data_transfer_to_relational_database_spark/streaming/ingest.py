"""Streaming corpus ingest with incremental near-dup rejection: the
daily-crawl shape — every arriving micro-batch of documents is deduped
against the ENTIRE previously-accepted corpus (via the persisted
bucketed LSH index) and against itself, survivors land in the corpus
parquet AND their signatures extend the index, so batch N+1 dedups
against batches 1..N without ever re-signing or re-shuffling them.

Composes three existing primitives: ``dedup.build_lsh_index`` /
``dedup.dedup_incremental`` (operators/dedup.py) and the idempotent
batch-ledger recipe (streaming/batch_sink.py). The index side of the
join never shuffles (bucketed by (band, band_sig) — plan-locked in
tests/test_llm_ops.py); each batch pays only its own signature cost.

Replay semantics: committed batch_ids drain through the noop sink. A
crash between the survivor write and the ledger append replays the
batch; the survivor write is batch-id-scoped overwrite (harmless), the
index append however re-appends signatures — duplicate index rows cost
space, never correctness (candidate pairs are dropDuplicates'd and a
doc already in the corpus rejects its replayed twin anyway). Compact
the index offline if replays accumulate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import build_lsh_index, dedup_incremental
from ..sinks.parquet_layout import read_bucketed, write_bucketed
from .batch_sink import _ledger_path, committed_batch_ids

_N_BUCKETS = 4


def stream_documents(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of documents parquet files
    (schema pinned from the files present at start — the
    ``stream_events`` contract). ``max_files_per_trigger=1`` makes each
    arriving file its own micro-batch, the unit the dedup ingest
    reasons about."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def bootstrap_index(spark: SparkSession, docs: DataFrame, index_table: str, path: str) -> None:
    """Create the corpus LSH index table (possibly from an empty seed
    corpus) bucketed by (band, band_sig) so every later ingest batch
    joins against it shuffle-free."""
    write_bucketed(
        build_lsh_index(docs), index_table, ["band", "band_sig"], _N_BUCKETS, path=path
    )


def write_stream_dedup_ingest(
    docs: DataFrame,
    index_table: str,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """Drain a documents stream through incremental near-dup rejection.

    Per micro-batch:

    1. cross-corpus: ``dedup_incremental(batch, index)`` — candidates
       from the bucket join against the persisted index, est_jaccard
       >= ``threshold`` rejects the batch doc;
    2. in-batch: the same machinery with the batch as its own corpus;
       the HIGHER doc_id of a duplicate pair is rejected (first-seen
       wins, deterministic);
    3. survivors append to ``<out_path>/data/batch_id=N`` (idempotent
       batch-scoped overwrite) and their signatures append to the
       bucketed index table, so subsequent batches dedup against them.
    """
    spark = docs.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(spark, out_path):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        batch_df = batch_df.persist()
        try:
            corpus_dupes = (
                dedup_incremental(batch_df, read_bucketed(spark, index_table))
                .filter(F.col("est_jaccard") >= threshold)
                .select(F.col("new_doc_id").alias("doc_id"))
            )
            in_batch_dupes = (
                dedup_incremental(batch_df, build_lsh_index(batch_df))
                .filter(
                    (F.col("est_jaccard") >= threshold)
                    & (F.col("new_doc_id") > F.col("corpus_doc_id"))
                )
                .select(F.col("new_doc_id").alias("doc_id"))
            )
            dupes = corpus_dupes.unionByName(in_batch_dupes).distinct()
            survivors = batch_df.join(dupes, "doc_id", "left_anti").persist()
            survivors.write.mode("overwrite").parquet(
                os.path.join(out_path, "data", f"batch_id={batch_id}")
            )
            write_bucketed(
                build_lsh_index(survivors),
                index_table,
                ["band", "band_sig"],
                _N_BUCKETS,
                mode="append",
            )
            spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
                "append"
            ).parquet(_ledger_path(out_path))
            survivors.unpersist()
        finally:
            batch_df.unpersist()

    writer = (
        docs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
