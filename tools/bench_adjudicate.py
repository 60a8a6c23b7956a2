#!/usr/bin/env python
"""Scoped repeat-run of named bench entries under the OFFICIAL method,
for adjudicating above-band single-run deltas (SCALE.md "Bench noise
band" rule: a per-query delta beyond the A/A band must be re-run alone
before being called a regression).

Method mirrors bench.py exactly — noop-sink materialization, one
flagship warm-up per JVM, best-of-2 within the JVM, clearCache between
entries, TWO subprocess JVM samples, per-query min across samples — but
runs ONLY the queries named on the command line, so the repeat is not
co-tenant with 27 other entries.

Usage:
    python tools/bench_adjudicate.py text_doc_pairs_jaccard sim_search_pq

Special name: ``window_rank_scalable_forced`` runs window_rank with
``spark.sdt.rank.smallInputBytes=0`` (same forcing as bench.py).

``gen_full_schema`` / ``gen_full_schema_skew`` are adjudicable too
(r13 verdict asked for exactly this): they are SINGLE-PASS series in
the official bench, so here they are timed once per JVM instead of
best-of-2, and the output marks those entries ``single_pass`` in
``methods``. COMPARABILITY CAVEAT (recorded honestly): the official
bench times the gen entries at the END of the full suite — a JVM
deeply JIT/codegen-warmed by ~30 prior entries — while this scoped
run warms with one flagship query, so scoped gen values read
systematically HIGH vs the official series (the ~10 s warm
plan-construction fixed cost is the most warm-up-sensitive thing in
the bench). Treat a scoped gen figure as an UPPER BOUND: it can clear
a suspected regression (scoped ≥ official on untouched code ⇒
machine-state), but never condemn one on its own.

Appends one ``{"kind": "adjudication", ...}`` line to
BENCH_samples_history.jsonl so the datapoint is citable next to the
official series, and prints the merged JSON to stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# gen pipeline entries: single-pass by official method (bench.py times
# them once per run); value = the fk_skew bench.py passes
_PIPELINE_GEN = {"gen_full_schema": 0.0, "gen_full_schema_skew": 1.0}


def run_sample(sf_dir: str, names: list[str]) -> dict:
    import bench  # _materialize reused so the sink/method can't drift

    from synthetic_data_transfer_to_relational_database_spark import registry
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("sdt-bench-adjudicate")
    queries = registry.all_queries()
    _materialize = bench._materialize
    _materialize(queries["revenue_by_nation"](spark, sf_dir))  # warm-up

    timings: dict[str, float] = {}
    for name in names:
        forced = name == "window_rank_scalable_forced"
        single_pass = name in _PIPELINE_GEN
        if name == "gen_1m_rows":
            # best-of-2 in the official bench too (bench.py run_best_of_2)
            run = lambda: bench._gen_1m(spark)  # noqa: E731
        elif single_pass:
            skew = _PIPELINE_GEN[name]
            run = lambda skew=skew: bench._gen_full_schema(spark, fk_skew=skew)  # noqa: E731
        else:
            fn = queries["window_rank" if forced else name]
            run = lambda fn=fn: _materialize(fn(spark, sf_dir))  # noqa: E731
        if forced:
            spark.conf.set("spark.sdt.rank.smallInputBytes", "0")
        try:
            best = float("inf")
            # the official bench times the gen pipeline entries ONCE per
            # run (a warmed JVM, no best-of) — mirror that here so the
            # scoped figure is comparable to the official series
            for _ in range(1 if single_pass else 2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
        finally:
            if forced:
                spark.conf.unset("spark.sdt.rank.smallInputBytes")
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
    spark.stop()
    return {"queries": timings}


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: bench_adjudicate.py <query> [query ...]")
    # Validate BEFORE spawning JVMs: registry queries, the
    # forced-scalable alias, gen_1m_rows (best-of-2 like bench.py) and
    # the single-pass gen pipeline entries (timed once per JVM, the
    # official method). The ingest/maintain pipeline entries remain
    # non-adjudicable here (they build streaming fixtures bench.py owns);
    # re-run `python bench.py` for those.
    from synthetic_data_transfer_to_relational_database_spark import registry

    known = (
        set(registry.all_queries())
        | {"window_rank_scalable_forced", "gen_1m_rows"}
        | set(_PIPELINE_GEN)
    )
    bad = [n for n in names if n not in known]
    if bad:
        sys.exit(
            f"not adjudicable: {bad} — ingest/maintain pipeline entries "
            "are bench.py-owned fixtures; use `python bench.py`."
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if os.environ.get("SDT_BENCH_CHILD"):
        print(json.dumps(run_sample(sf_dir, names)))
        return

    samples: list[dict] = []
    for i in range(2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *names],
            env=dict(os.environ, SDT_BENCH_CHILD="1"),
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            samples.append(json.loads(line))
        else:
            print(
                f"sample {i} failed (rc={proc.returncode}):\n" + proc.stderr[-2000:],
                file=sys.stderr,
            )
    if not samples:
        sys.exit("no successful samples")

    queries = {
        n: min(s["queries"][n] for s in samples if n in s["queries"])
        for n in samples[0]["queries"]
    }
    methods = {
        n: (
            f"single_pass_x{len(samples)}jvm"
            if n in _PIPELINE_GEN
            else f"best_of_2_x{len(samples)}jvm"
        )
        for n in queries
    }
    record = {
        "ts": int(time.time()),
        "sf": sf,
        "kind": "adjudication",
        "methods": methods,
        "samples": samples,
    }
    with open(os.path.join(_REPO, "BENCH_samples_history.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(
        json.dumps(
            {"kind": "adjudication", "queries": queries, "methods": methods, "sf": sf}
        )
    )


if __name__ == "__main__":
    main()
