#!/usr/bin/env python
"""Per-invocation serve fixed cost at production widths (r16 verdict
item #1): SCALE.md r16 recorded "~60 s per invocation at dim 768" for
the wide-dim serve and attributed it to superlinear Catalyst rule
walks. This probe DECOMPOSES that cost — Python-side Column
construction (py4j round-trips) vs Catalyst plan processing vs
execution — and measures the two r17 fixes:

1. SQL-TEXT tree builders: ``_unrolled_dot``/``_balanced_dot`` now
   emit the expression as one SQL string parsed JVM-side. First
   decomposition run (this box, local[8], dim 768, 2k corpus, 50
   queries): the COLUMN-API build was 25.6 s of py4j, Catalyst
   (executedPlan) 0.49 s, execution 3.9 s — the "Catalyst superlinear"
   attribution was wrong; the cost was the Python build all along. The
   SQL parse measures ~3–5 ms at dims 768–1536.
2. ``VectorIndexServer``: the warm handle amortizing model read +
   centroid frame + rescore tree across successive query batches.

Method: build a dim-wide synthetic index OUTSIDE the clock; then time
(a) the legacy Column-API tree build (reconstructed inline — the
shipped builders no longer do this), (b) the shipped ``_cosine_col``
build, (c) N successive COLD one-shot serves (construct-per-call,
the pre-r17 API shape), (d) warm-handle construction + N successive
``search`` calls on one ``VectorIndexServer``, (e) the Catalyst share
via an ``eager=False`` plan's ``executedPlan()`` trigger. Each serve
call uses a distinct query batch so no result reuse hides work.

Usage: python tools/warm_serve_probe.py [--dim 768] [--corpus 2000]
           [--queries 50] [--calls 3] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--corpus", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )

    # a VANILLA session except shuffle partitions sized to the tiny
    # probe corpus (the r16 sim_search_balanced finding: 200 partitions
    # x per-task init of the interpreted wide tree measures 75 s on a
    # 500-row corpus — noise this probe must not carry)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("sdt-warm-serve-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    dim = args.dim
    out: dict = {"dim": dim, "corpus": args.corpus, "queries": args.queries}

    base = spark.range(args.corpus).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 16).cast("int").alias("label"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), d -> "
            "cast(pmod(xxhash64(id, d), 1000) as float) / 1000.0 - 0.5)"
        ).alias("embedding"),
    )
    path = tempfile.mkdtemp(prefix=f"sdt_warmserve_{dim}_")
    try:
        vi.build_vector_index(spark, base, path, centroids="by_label")

        # (a) the LEGACY Column-API build, reconstructed — what every
        # serve invocation paid before r17 (3 dots in _cosine_col)
        t0 = time.time()
        for names in (("qv", "cv"), ("qv", "qv"), ("cv", "cv")):
            terms = [
                F.col(names[0])[i].cast("double") * F.col(names[1])[i].cast("double")
                for i in range(dim)
            ]
            while len(terms) > 1:
                nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
        out["legacy_column_api_build_s"] = round(time.time() - t0, 3)

        # (b) the shipped SQL-text build (balanced: the wide-dim path)
        t0 = time.time()
        vi._cosine_col(dim, "balanced")
        out["sql_text_build_s"] = round(time.time() - t0, 4)

        def batch(i: int):
            lo, hi = i * args.queries, (i + 1) * args.queries
            return base.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))

        # (c) cold one-shot serves: construct-per-call (pre-r17 shape)
        cold = []
        for i in range(args.calls):
            t0 = time.time()
            res = vi.search_vector_index_df(
                spark, path, batch(i), top_k=5, n_probe=4, rescorer="balanced"
            )
            res.count()
            cold.append(round(time.time() - t0, 3))
            res.unpersist()
        out["cold_one_shot_s"] = cold

        # (d) warm handle: one construction + successive searches
        t0 = time.time()
        srv = vi.VectorIndexServer(spark, path, top_k=5, n_probe=4, rescorer="balanced")
        out["server_construct_s"] = round(time.time() - t0, 3)
        warm = []
        for i in range(args.calls):
            t0 = time.time()
            res = srv.search(batch(i))
            res.count()
            warm.append(round(time.time() - t0, 3))
            res.unpersist()
        out["warm_search_s"] = warm

        # (e) Catalyst's share: lazy plan, executedPlan trigger, execute
        lazy = srv.search(batch(0), eager=False)
        t0 = time.time()
        lazy._jdf.queryExecution().executedPlan()
        out["catalyst_executed_plan_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        lazy.count()
        out["execute_s"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()

    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
