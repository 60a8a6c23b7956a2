"""Driver-side-only probe for the generator's analyzer fixed cost
(r19 item 2): builds every table's projection (serial, no FK parents ->
fallback expressions, which preserves the expression SHAPE of the rule
compiler output) and forces queryExecution().analyzed() — no jobs, no
writes. Times parse+build vs analysis per arm (array literals vs
split-form lexicon banks), REPS reps in one JVM.

Usage: python tools/gen_analysis_only_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROBE_REPS", "3"))


def main() -> None:
    from synthetic_data_transfer_to_relational_database_spark.functions import generators as G
    from synthetic_data_transfer_to_relational_database_spark.plans.executor import GenerationPlan
    from synthetic_data_transfer_to_relational_database_spark.sources.ddl import parse_schema_script
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("gen-analysis-probe")
    tables = parse_schema_script("/root/reference/script.sql")

    orig_arr = G._arr

    def arr_split(items: list[str]) -> str:
        key = tuple(items)
        c = G._ARR_CACHE.get(key)
        if c is None:
            if len(items) >= 16 and all(w and ";" not in w for w in items):
                c = f"split({G._qs(';'.join(items))}, ';')"
            else:
                c = "array(" + ",".join(G._qs(w) for w in items) + ")"
            G._ARR_CACHE[key] = c
        return c

    for rep in range(REPS):
        for arm, impl in (("array", orig_arr), ("split", arr_split)):
            G._arr = impl
            G._ARR_CACHE.clear()
            plan = GenerationPlan(spark, tables, seed=11, default_rows=10_000)
            t_build = t_analyze = 0.0
            n_tables = 0
            for name in plan.build_order():
                spec = plan.tables[name]
                t0 = time.perf_counter()
                df = plan._build_table(spec)
                t1 = time.perf_counter()
                df._jdf.queryExecution().analyzed()
                t2 = time.perf_counter()
                t_build += t1 - t0
                t_analyze += t2 - t1
                n_tables += 1
            print(
                f"[{arm}] rep{rep} tables={n_tables} "
                f"build(parse)={t_build:.3f} analyze={t_analyze:.3f}",
                flush=True,
            )
    G._arr = orig_arr
    G._ARR_CACHE.clear()
    spark.stop()


if __name__ == "__main__":
    main()
