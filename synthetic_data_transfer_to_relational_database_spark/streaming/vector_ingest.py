"""Streaming face for the persisted IVF vector index — the day-2
symmetry the LSH corpus index already has (streaming/ingest.py): every
arriving micro-batch of embeddings refreshes the index incrementally,
so the serve path always covers the corpus up to the last drained file
without ever re-clustering or re-scanning the indexed data.

Composes the batch primitives unchanged: ``refresh_vector_index`` IS
the per-batch operation (operators/vector_index.py) — the stream adds
only delivery and replay discipline. Exactly-once lands differently
than the dedup ingest's parquet side-ledger, and deliberately so: a
refresh both appends data AND rewrites the model's counters, so a
ledger that commits separately from the counter fold could disagree
with it under a crash. Instead the replay ledger lives INSIDE the model
artifact (``meta["stream_batches"]``) and commits in the same atomic
rename-over as the counters, while the data write is a dynamic
partition overwrite of the batch's own ``ingest_batch=s<batch_id>``
scope — Structured Streaming's at-least-once foreachBatch redelivery
replays into exactly the directories the first attempt owned. Crash at
any point, replay heals: cells re-overwrite idempotently, counters fold
once, a fully-committed batch short-circuits on the ledger (drained
through the noop sink, the batch_sink.py recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.vector_index import refresh_vector_index


def stream_vectors(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of embeddings parquet files
    (vec_id, label, embedding) — schema pinned from the files present at
    start, one file per micro-batch by default (the stream_documents
    contract: the file is the unit the refresh reasons about)."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def write_stream_vector_refresh(
    vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    rebuild_factor: float = 2.0,
    available_now: bool = True,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Drain an embeddings stream through incremental index refresh.

    Per micro-batch: already-committed batch_ids (the meta ledger)
    drain through the noop sink and touch nothing; new batches run
    ``refresh_vector_index(stream_batch_id=batch_id)`` — map-side
    assignment against the CURRENT centroids, batch-scoped cells
    partition, counters + ledger in one atomic model rewrite. The index
    must exist (``build_vector_index`` first); drift accounting keeps
    accumulating across batches, so ``rebuild_recommended`` fires on the
    stream exactly when it would have on the same data arriving in
    batch.

    ``compact_every=N`` folds scope compaction into the stream (the
    ``write_stream_dedup_ingest`` pattern): every Nth committed batch,
    merge the accumulated refresh scopes into one compaction generation
    (``compact_vector_index``) so a long-running stream never re-grows
    the small-files curve. Safe inside foreachBatch — it is sequential,
    so the index's single-writer contract holds by construction, and a
    crash mid-compaction is healed by the next verify/heal (or simply
    retried N batches later)."""
    spark = vectors.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # refresh owns the replay check (one meta read, one copy of the
        # ledger logic — r13 review); a replayed batch returns without
        # touching batch_df, so drain it through the noop sink (the
        # drain_if_committed recipe — Spark 4 validates that foreachBatch
        # processes every partition)
        report = refresh_vector_index(
            spark,
            batch_df,
            index_path,
            rebuild_factor=rebuild_factor,
            stream_batch_id=batch_id,
        )
        if report.get("replayed"):
            batch_df.write.format("noop").mode("overwrite").save()
        elif compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # after a COMMITTED refresh only (a replay must stay a no-op)
            from ..operators.vector_index import compact_vector_index

            compact_vector_index(spark, index_path)

    writer = (
        vectors.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
