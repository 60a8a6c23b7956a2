"""sf1 scaling pass for the bench heavies (r18 verdict item #5): times
ingest_corpus_4batches, the gen_full_schema pair, sim_search_index and
text_doc_pairs_jaccard at the synthesized 10× "sf1" (the
tools/sf1_spotcheck.py FK-consistent replication of sf0.1), best-of-2
per entry through the bench's own bodies (same noop-sink methodology),
at the core count given by $SPARK_GRAFT_CPUS. Run once at 32 and once
at 8 on a settled rig to make real parallelism visible above the
per-job fixed-cost floor that dominates sf0.1.

Usage:
  python tools/sf1_spotcheck_build_only.py  # or let this script build
  SPARK_GRAFT_CPUS=32 python tools/sf1_heavies_bench.py
Prints one JSON line {"cpus": N, "sf": "sf1-replica", "queries": {...}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("SDT_SF1_DIR", "/tmp/sdt_sf1")


def main() -> None:
    if not os.path.exists(os.path.join(OUT, "lineitem.parquet")):
        import duckdb

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sf1_spotcheck import build

        build(duckdb.connect())

    import bench
    from synthetic_data_transfer_to_relational_database_spark import registry
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sf1-heavies")
    queries = registry.all_queries()
    timings: dict[str, float] = {}

    def best_of_2(name, run):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", file=sys.stderr, flush=True)

    for name in ("sim_search_index", "text_doc_pairs_jaccard"):
        fn = queries[name]
        best_of_2(name, lambda fn=fn: bench._materialize(fn(spark, OUT)))

    # ingest: one timed drain per invocation (the bench's own body)
    def run_ingest():
        drain, _ = bench._ingest_corpus(spark, OUT, with_maintain=False)
        timings.setdefault("ingest_corpus_4batches", drain)
        timings["ingest_corpus_4batches"] = min(
            timings["ingest_corpus_4batches"], round(drain, 3)
        )

    for _ in range(2):
        run_ingest()
        spark.catalog.clearCache()
    print(f"ingest_corpus_4batches: {timings['ingest_corpus_4batches']}",
          file=sys.stderr, flush=True)

    # the gen pair has no sf input; at "sf1 scale" run 10x rows/table
    for key, skew in (("gen_full_schema_10x", 0.0), ("gen_full_schema_skew_10x", 1.0)):
        t0 = time.perf_counter()
        bench._gen_full_schema(spark, fk_skew=skew, rows=100_000)
        timings[key] = round(time.perf_counter() - t0, 3)
        print(f"{key}: {timings[key]}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()

    spark.stop()
    print(json.dumps({"cpus": cpus, "sf": "sf1-replica", "queries": timings}))


if __name__ == "__main__":
    main()
