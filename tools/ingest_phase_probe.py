#!/usr/bin/env python
"""Decompose the ingest_corpus_4batches per-trigger cost into phases.

The r9 two-point model (tools/ingest_cost_split.py) separated fixed
(~3.1 s/trigger) from row work, but never said WHAT the fixed cost is.
This probe replays the exact bench corpus split through (a) the REAL
streaming drain (engine + pipeline) and (b) a batch-mode replica of
write_stream_dedup_ingest's write_batch with a perf_counter around every
action boundary, so the per-trigger wall decomposes into:

  ledger_guard     drain_if_committed's committed_batch_ids read
  sign+cc_edges    first eager checkpoint: batch dedup window + LSH sign
                   + in-batch pair join + distinct (one materialization)
  cc_rounds        star-contraction rounds incl. fixpoint tests
  survivors_write  reps/cross-corpus join + survivor parquet write
  index_append     bucketed signature append
  ledger_commit    mark_batch_committed
  engine_overhead  streaming drain total - sum(batch replica totals)
                   (offset/commit log, source listing, trigger sched)

Usage: python tools/ingest_phase_probe.py [sf_dir]
Prints one JSON line. Run alone on a settled rig.
"""
from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from synthetic_data_transfer_to_relational_database_spark.operators.dedup import (
        build_lsh_index,
        connected_components,
        dedup_incremental,
    )
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark
    from synthetic_data_transfer_to_relational_database_spark.sinks.parquet_layout import (
        read_bucketed,
        write_bucketed,
    )
    from synthetic_data_transfer_to_relational_database_spark.streaming.batch_sink import (
        drain_if_committed,
        mark_batch_committed,
    )
    from synthetic_data_transfer_to_relational_database_spark.streaming.ingest import (
        _N_BUCKETS,
        ensure_index,
        stream_documents,
        write_stream_dedup_ingest,
    )

    spark = get_spark("ingest-phase-probe")
    threshold = 0.5
    n_batches = 4

    def setup(tag: str):
        tmp = tempfile.mkdtemp(prefix=f"sdt_probe_{tag}_")
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        split = os.path.join(tmp, "split")
        docs.withColumn("__f", docs.doc_id % n_batches).repartition(
            n_batches, "__f"
        ).write.partitionBy("__f").mode("overwrite").parquet(split)
        for i, d in enumerate(sorted(_glob.glob(os.path.join(split, "__f=*")))):
            stage = os.path.join(tmp, f"stage{i}")
            spark.read.parquet(d).coalesce(1).write.mode("overwrite").parquet(stage)
            shutil.copy(
                _glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                os.path.join(src, f"crawl{i}.parquet"),
            )
        table = f"t_probe_{tag}_idx"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        ensure_index(spark, table, os.path.join(tmp, "idx"), docs_src=src)
        return tmp, src, table

    # ---- (a) the real streaming drain, timed whole -----------------------
    tmp_a, src_a, table_a = setup("stream")
    t0 = time.perf_counter()
    write_stream_dedup_ingest(
        stream_documents(spark, src_a),
        table_a,
        os.path.join(tmp_a, "corpus"),
        os.path.join(tmp_a, "ckpt"),
    ).awaitTermination()
    stream_total = time.perf_counter() - t0
    spark.sql(f"DROP TABLE IF EXISTS {table_a}")
    shutil.rmtree(tmp_a, ignore_errors=True)

    # ---- (b) batch-mode replica with phase timers -------------------------
    tmp_b, src_b, table_b = setup("batch")
    out_path = os.path.join(tmp_b, "corpus")
    phases: list[dict] = []
    for batch_id, crawl in enumerate(sorted(_glob.glob(os.path.join(src_b, "crawl*.parquet")))):
        ph: dict = {"batch_id": batch_id}
        batch_df = spark.read.parquet(crawl)
        t = time.perf_counter()
        assert not drain_if_committed(spark, batch_df, out_path, batch_id)
        ph["ledger_guard"] = time.perf_counter() - t

        one_per_id = Window.partitionBy("doc_id").orderBy("text")
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(one_per_id))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .persist()
        )
        banded = build_lsh_index(batch).persist()
        survivors = None
        try:
            edges = (
                dedup_incremental(None, banded, new_index=banded)
                .filter(F.col("est_jaccard") >= threshold)
                .filter(F.col("new_doc_id") < F.col("corpus_doc_id"))
                .select(
                    F.col("new_doc_id").alias("src"),
                    F.col("corpus_doc_id").alias("dst"),
                )
            )
            t = time.perf_counter()
            n_edges = edges.count()  # materializes batch+banded+pair join
            ph["sign_and_edges"] = time.perf_counter() - t
            ph["n_edges"] = n_edges

            t = time.perf_counter()
            comp = connected_components(edges).select(
                F.col("node").alias("doc_id"), F.col("label").alias("__rep")
            )
            reps = (
                batch.select("doc_id")
                .join(comp, "doc_id", "left")
                .filter(
                    F.coalesce(F.col("__rep"), F.col("doc_id")) == F.col("doc_id")
                )
                .select("doc_id")
            )
            ph["cc_rounds"] = time.perf_counter() - t
            rep_banded = banded.join(reps, "doc_id", "left_semi")
            corpus_dupes = (
                dedup_incremental(
                    None, read_bucketed(spark, table_b), new_index=rep_banded
                )
                .filter(F.col("est_jaccard") >= threshold)
                .select(F.col("new_doc_id").alias("doc_id"))
                .distinct()
            )
            survivor_ids = reps.join(corpus_dupes, "doc_id", "left_anti")
            survivors = batch.join(survivor_ids, "doc_id", "left_semi").persist()
            t = time.perf_counter()
            survivors.write.mode("overwrite").parquet(
                os.path.join(out_path, "data", f"batch_id={batch_id}")
            )
            ph["survivors_write"] = time.perf_counter() - t
            t = time.perf_counter()
            write_bucketed(
                banded.join(survivors.select("doc_id"), "doc_id", "left_semi"),
                table_b,
                ["band", "band_sig"],
                _N_BUCKETS,
                mode="append",
            )
            ph["index_append"] = time.perf_counter() - t
            t = time.perf_counter()
            mark_batch_committed(spark, out_path, batch_id)
            ph["ledger_commit"] = time.perf_counter() - t
        finally:
            if survivors is not None:
                survivors.unpersist()
            banded.unpersist()
            batch.unpersist()
        ph["total"] = sum(v for k, v in ph.items() if k not in ("batch_id", "n_edges"))
        phases.append(ph)
    spark.sql(f"DROP TABLE IF EXISTS {table_b}")
    shutil.rmtree(tmp_b, ignore_errors=True)

    batch_sum = sum(p["total"] for p in phases)
    print(json.dumps({
        "stream_total": round(stream_total, 3),
        "batch_replica_sum": round(batch_sum, 3),
        "engine_overhead_est": round(stream_total - batch_sum, 3),
        "phases": [
            {k: (round(v, 3) if isinstance(v, float) else v) for k, v in p.items()}
            for p in phases
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
