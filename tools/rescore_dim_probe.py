#!/usr/bin/env python
"""Rescorer A/B at REALISTIC embedding widths (r15 verdict item #3):
the unrolled in-JVM cosine's measured 3.1x win over the HOF fold was
established at the testdata's 64-dim regime and capped by
``_UNROLL_MAX_DIM = 256`` on an UNMEASURED method-splitting concern —
but production embedding widths start at 768 (BERT/MiniLM-era) and run
to 1536/3072 (hosted-API era). This measures both rescorers at
{64, 256, 768, 1536, 3072} so the cap is set by evidence.

Method: for each dim, N synthetic (qv, cv) float-array pairs are
constructed in-plan (xxhash64-derived, the vector_refresh_probe
recipe — no parquet, no Python), then each rescorer mode's cosine
column is materialized through a sum() aggregate (dominated by the
rescorer expression, zero collect). A generation-only baseline
(qv[0] + cv[0] through the same aggregate) brackets the array-
construction cost shared by all modes so the NET rescorer cost is
attributable. Conf matrix per mode: default hugeMethodLimit (65535)
and the JIT-friendly 8000 (the eager serve's scoped value) — the r15
mechanism (fused WSCG method > HotSpot's ~8 KB JIT limit -> bytecode
interpreter) predicts unrolled@default slow and unrolled@8000 fast;
whether that survives 3x768-node projection trees is exactly the
open question. Bit-identity is re-proven AT EVERY DIM by counting
pairs where the two cosines differ (exact double equality; must be 0).

First timing per cell is recorded separately (t_first includes
analysis + codegen of the wide tree — the cost the _UNROLL_MAX_DIM
comment worried about); t_best is best-of-2 warm.

Usage: python tools/rescore_dim_probe.py [n_pairs] [dims...]
       # defaults 200000 pairs at dims 64 256 768 1536 3072
"""

from __future__ import annotations

import json
import sys
import time

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def synth_pairs(spark, n: int, dim: int):
    from pyspark.sql import functions as F

    qdims = ", ".join(
        f"cast(pmod(xxhash64(id, {d}), 1000) as float) / 1000.0 - 0.5"
        for d in range(dim)
    )
    cdims = ", ".join(
        f"cast(pmod(xxhash64(id + 7, {d}), 1000) as float) / 1000.0 - 0.5"
        for d in range(dim)
    )
    return spark.range(n).select(
        F.expr(f"array({qdims})").alias("qv"),
        F.expr(f"array({cdims})").alias("cv"),
    )


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dims = [int(a) for a in sys.argv[2:]] or [64, 256, 768, 1536, 3072]
    from pyspark.sql import functions as F

    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("sdt-rescore-dim-probe")
    huge = "spark.sql.codegen.hugeMethodLimit"
    default_huge = spark.conf.get(huge, "65535")
    # the probe measures ABOVE the shipped cap on purpose — lift it
    # in-process so the forced 'unrolled' mode builds its tree
    vi._UNROLL_MAX_DIM = max(dims)

    results: dict[str, dict] = {}
    for dim in dims:
        pairs = synth_pairs(spark, n_pairs, dim)
        cell: dict[str, object] = {"n_pairs": n_pairs}

        def timed(col, conf_value: str) -> tuple[float, float]:
            spark.conf.set(huge, conf_value)
            try:
                walls = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    pairs.select(col.alias("x")).agg(F.sum("x")).collect()
                    walls.append(time.perf_counter() - t0)
                return round(walls[0], 3), round(min(walls), 3)
            finally:
                spark.conf.set(huge, default_huge)

        base_col = F.col("qv")[0].cast("double") + F.col("cv")[0].cast("double")
        cell["gen_only"] = timed(base_col, default_huge)[1]
        for mode in ("hof", "unrolled"):
            col = vi._cosine_col(dim, mode)
            for conf_value, tag in ((default_huge, "default"), ("8000", "8000")):
                first, best = timed(col, conf_value)
                cell[f"{mode}@{tag}"] = best
                cell[f"{mode}@{tag}_first"] = first
        # the deprecated-candidate Arrow path, measured at wide dims too
        # (its per-batch Python cost is dim-proportional but vectorized;
        # if it won big at 768+ the deprecation call would be wrong)
        cell["arrow@default"] = timed(vi._cosine_col(dim, "arrow"), default_huge)[1]
        # bit-identity at this dim: zero pairs where the trees disagree
        u = vi._cosine_col(dim, "unrolled")
        h = vi._cosine_col(dim, "hof")
        diffs = (
            pairs.select(u.alias("u"), h.alias("h"))
            .filter("u IS DISTINCT FROM h")
            .count()
        )
        cell["bitwise_diffs"] = diffs
        hof, unr = cell["hof@default"], cell["unrolled@8000"]
        gen = cell["gen_only"]
        cell["net_speedup_unrolled8000_vs_hof"] = (
            round((hof - gen) / (unr - gen), 2) if unr > gen else None
        )
        results[str(dim)] = cell
        print(json.dumps({"dim": dim, **cell}), flush=True)
    print(json.dumps({"probe": "rescore_dim", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
