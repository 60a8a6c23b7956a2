"""Decompose sim_search_index's Lloyd-literal cost (r19 item #1).

The r18 unroll (`_dot_sql_lit` inside `_lloyd_refine` + `_argmin_assign_lit`)
regressed the bench entry 4.4 -> 5.1-7.4 s while the steady-state
production-shape A/B showed ~2x. Hypothesis (r18 verdict): each of the 3
Lloyd iterations plus the assign builds a projection with UNIQUE centroid
literals, so the driver pays parse + analyze + codegen-build + janino
compile per iteration per invocation, and the 500-row sf0.1 corpus never
amortizes it.

This probe splits the per-iteration cost of the literal arm:
  expr_build  - Python string construction
  parse       - F.expr() py4j + ANTLR
  analyze     - force queryExecution().analyzed()
  execute     - the collect (includes optimize+codegen+janino+run)
and A/Bs three arms on the real bench corpus, same JVM, N reps each:
  lit   - current HEAD behavior (unrolled literals)
  fold  - pre-r18 behavior (_LIT_UNROLL_MAX_DIM forced to 0)
plus the full sim_search_index entry per arm.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/lloyd_cost_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synthetic_data_transfer_to_relational_database_spark.session import get_spark  # noqa: E402
from synthetic_data_transfer_to_relational_database_spark.operators import similarity as S  # noqa: E402
from synthetic_data_transfer_to_relational_database_spark.operators import vector_index as V  # noqa: E402
from synthetic_data_transfer_to_relational_database_spark.operators.relational import table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROBE_REPS", "3"))


def timed_lloyd(e, cvs, iters=3):
    """_lloyd_refine body with per-phase perf_counter (literal arm only
    meaningful; fold arm reports the same phases for its own expr)."""
    import math

    n_dims = len(cvs[0])
    out = []
    for it in range(iters):
        t0 = time.perf_counter()
        if n_dims <= S._LIT_UNROLL_MAX_DIM:
            sql = "array(" + ",".join(S._dot_sql_lit("embedding", c) for c in cvs) + ")"
            t1 = time.perf_counter()
            cs = F.expr(sql)
        else:
            def dot_with(c):
                return F.aggregate(
                    F.zip_with(F.col("embedding"), F.lit(c), lambda a, b: a.cast("double") * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            t1 = time.perf_counter()
            cs = F.array(*[dot_with(c) for c in cvs])
        t2 = time.perf_counter()
        scored = e.select("embedding", cs.alias("cs"))
        assigned = scored.select(
            "embedding",
            (F.array_position(F.col("cs"), F.array_max("cs")) - 1).cast("int").alias("cell"),
        )
        sums_df = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.sum(F.col("val").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
        )
        t3 = time.perf_counter()
        sums_df._jdf.queryExecution().analyzed()  # force analysis only
        t4 = time.perf_counter()
        sums = sums_df.collect()
        t5 = time.perf_counter()
        out.append(
            dict(expr_build=t1 - t0, parse=t2 - t1, df_build=t3 - t2,
                 analyze=t4 - t3, execute=t5 - t4)
        )
        acc, cnt = {}, {}
        for r in sums:
            acc.setdefault(r["cell"], [0.0] * n_dims)[r["dim"]] = r["s"]
            cnt[r["cell"]] = r["n"]
        new_cvs = []
        for i, old in enumerate(cvs):
            if i not in acc or cnt[i] == 0:
                new_cvs.append(old)
                continue
            mean = [x / cnt[i] for x in acc[i]]
            norm = math.sqrt(sum(x * x for x in mean)) or 1.0
            new_cvs.append([x / norm for x in mean])
        cvs = new_cvs
    return cvs, out


def main():
    spark = get_spark("lloyd-cost-probe")
    e = table(spark, SF_DIR, "embeddings")
    n = e.count()
    print(f"corpus rows={n}", flush=True)

    for arm in ("lit", "fold"):
        cap = 256 if arm == "lit" else 0
        S._LIT_UNROLL_MAX_DIM = cap
        V._LIT_UNROLL_MAX_DIM = cap
        for rep in range(REPS):
            seeds = S._seed_centroids(e)
            t0 = time.perf_counter()
            _, phases = timed_lloyd(e, seeds, iters=3)
            dt = time.perf_counter() - t0
            ph = {k: round(sum(p[k] for p in phases), 3) for k in phases[0]}
            print(f"[{arm}] rep{rep} lloyd_total={dt:.3f} phases(sum/3it)={ph}", flush=True)
        # full entry per arm
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"probe sim_search_index {arm} rep{rep}")
            t0 = time.perf_counter()
            df = S.sim_search_index(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"[{arm}] rep{rep} sim_search_index_entry={dt:.3f}", flush=True)
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
