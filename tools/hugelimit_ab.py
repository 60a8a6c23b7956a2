#!/usr/bin/env python
"""Full-bench A/B of ``spark.sql.codegen.hugeMethodLimit`` default
(65535) vs 8000 — the deliberately-deferred decision from r15
(SCALE.md, serve rescorer): 8000 makes the unrolled serve rescorer
3.1x faster by forcing whole-stage-codegen fallback on methods the
HotSpot JIT refuses to compile anyway, but it ALSO changes stage
fallback for every generated method in the 8000–65535-byte band —
the janino-budget-pinned gen pipeline is the suspected loser. This
decides adopt-in-get_spark vs reject, with numbers.

Method: ONE warmed JVM; per entry, best-of-2 under the default conf
then best-of-2 under 8000 (the conf is read at codegen time, so
flipping it between runs re-plans the stage). The within-entry A/B
pairs are minutes apart on the same JVM, so the rig-drift that
plagues cross-run comparisons (SCALE.md r15/r16 bench notes) cancels
in the ratio. clearCache between entries, the bench.py discipline.

Usage: python tools/hugelimit_ab.py [entry ...]   # default: all
Appends {"kind": "hugelimit_ab", ...} to BENCH_samples_history.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import bench

    from synthetic_data_transfer_to_relational_database_spark import registry
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sdt-hugelimit-ab")
    queries = registry.all_queries()
    bench._materialize(queries["revenue_by_nation"](spark, sf_dir))  # warm-up

    huge = "spark.sql.codegen.hugeMethodLimit"
    default_huge = spark.conf.get(huge, "65535")
    names = sys.argv[1:] or [
        *bench.HEADLINE,
        *bench.EXTRA,
        *bench.EXTRA_R5,
        *bench.EXTRA_R6,
        *bench.EXTRA_R9,
        *bench.EXTRA_R12,
        "gen_1m_rows",
        "gen_full_schema",
        "gen_full_schema_skew",
    ]

    def best_of_2(run) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        return round(best, 3)

    out: dict[str, dict] = {}
    for name in names:
        if name == "gen_1m_rows":
            run = lambda: bench._gen_1m(spark)  # noqa: E731
        elif name in ("gen_full_schema", "gen_full_schema_skew"):
            skew = 1.0 if name.endswith("skew") else 0.0
            run = lambda skew=skew: bench._gen_full_schema(spark, fk_skew=skew)  # noqa: E731
        else:
            fn = queries[name]
            run = lambda fn=fn: bench._materialize(fn(spark, sf_dir))  # noqa: E731
        spark.conf.set(huge, default_huge)
        a = best_of_2(run)
        spark.conf.set(huge, "8000")
        b = best_of_2(run)
        spark.conf.set(huge, default_huge)
        out[name] = {
            "default": a,
            "limit8000": b,
            "ratio": round(b / a, 3) if a else None,
        }
        print(json.dumps({"entry": name, **out[name]}), flush=True)

    record = {
        "kind": "hugelimit_ab",
        "ts": int(time.time()),
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "loadavg_at_write": list(os.getloadavg()),
        "entries": out,
    }
    with open(os.path.join(_REPO, "BENCH_samples_history.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
