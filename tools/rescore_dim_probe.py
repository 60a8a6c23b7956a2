#!/usr/bin/env python
"""Rescorer A/B at REALISTIC embedding widths (r15 verdict item #3):
the unrolled in-JVM cosine's measured serve win was established at the
testdata's 64-dim regime and capped by ``_UNROLL_MAX_DIM = 256`` on an
UNMEASURED method-splitting concern — production embedding widths
start at 768. This measures both rescorers (plus the deprecated-
candidate Arrow path) across widths so the cap is set by evidence.

Findings from the first sweep (in-plan synthetic pairs, 200k):
- dim 64:  unrolled@8000 net 1.95x over hof@default — the win is real.
- dim 256: unrolled LOSES (net 0.8x) even under its enabling conf —
  the shipped 256 cap was too generous.
- dim 768: the generated projection blows janino's 64 KB method limit
  (InternalCompilerException), and deeper trees overflow driver-side
  optimizer recursion (ConstantFolding over a ~2300-node left spine) —
  a HARD failure class, not just slow. Hence this version: pairs are
  parquet-backed (the serve's actual shape, no generation expressions
  in the timed plan) and EACH DIM RUNS IN ITS OWN SUBPROCESS so a
  driver-side crash at a wide dim cannot eat the narrow-dim results.

Method per dim: write n_pairs (qv, cv) float-array rows to a temp
parquet OUTSIDE the clock; per mode x conf, time
``read.select(cosine).agg(sum)`` twice (t_first = analysis+codegen
included, t_best = warm best-of-2); bit-identity re-proven at every
dim that can build both trees (count of pairs where the two cosines
differ — must be 0).

Usage: python tools/rescore_dim_probe.py [n_pairs] [dims...]
       # defaults 200000 pairs at dims 64 96 128 192 256 768
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def run_one_dim(n_pairs: int, dim: int) -> None:
    from pyspark.sql import functions as F

    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark(f"sdt-rescore-dim-{dim}")
    huge = "spark.sql.codegen.hugeMethodLimit"
    default_huge = spark.conf.get(huge, "65535")
    vi._UNROLL_MAX_DIM = max(vi._UNROLL_MAX_DIM, dim)  # probe above the cap
    vi._BALANCED_MAX_DIM = max(vi._BALANCED_MAX_DIM, dim)

    tmp = tempfile.mkdtemp(prefix=f"sdt_rescore_{dim}_")
    try:
        qdims = ", ".join(
            f"cast(pmod(xxhash64(id, {d}), 1000) as float) / 1000.0 - 0.5"
            for d in range(dim)
        )
        cdims = ", ".join(
            f"cast(pmod(xxhash64(id + 7, {d}), 1000) as float) / 1000.0 - 0.5"
            for d in range(dim)
        )
        src = os.path.join(tmp, "pairs")
        spark.range(n_pairs).select(
            F.expr(f"array({qdims})").alias("qv"),
            F.expr(f"array({cdims})").alias("cv"),
        ).write.parquet(src)  # OUTSIDE the clock — the serve reads parquet too
        pairs = spark.read.parquet(src)
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
        cell["scan_only"] = timed(base_col, default_huge)[1]
        plans = [("hof", default_huge, "default"), ("hof", "8000", "8000"),
                 ("unrolled", default_huge, "default"), ("unrolled", "8000", "8000"),
                 ("balanced", default_huge, "default"), ("balanced", "8000", "8000"),
                 ("arrow", default_huge, "default")]
        for mode, conf_value, tag in plans:
            key = f"{mode}@{tag}"
            try:
                col = vi._cosine_col(dim, mode)
                first, best = timed(col, conf_value)
                cell[key] = best
                cell[f"{key}_first"] = first
            except BaseException as e:  # noqa: BLE001 - the cliff IS the result
                cell[key] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        try:
            u = vi._cosine_col(dim, "unrolled")
            h = vi._cosine_col(dim, "hof")
            cell["bitwise_diffs"] = (
                pairs.select(u.alias("u"), h.alias("h"))
                .filter("u IS DISTINCT FROM h")
                .count()
            )
        except BaseException as e:  # noqa: BLE001
            cell["bitwise_diffs"] = f"FAILED: {type(e).__name__}"
        hof, unr, scan = cell.get("hof@default"), cell.get("unrolled@8000"), cell["scan_only"]
        if isinstance(hof, float) and isinstance(unr, float) and unr > scan:
            cell["net_speedup_unrolled8000_vs_hof"] = round((hof - scan) / (unr - scan), 2)
        print("DIMRESULT " + json.dumps({"dim": dim, **cell}), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def run_serve_dim(n_queries: int, dim: int) -> None:
    """The SERVE-shape cell: the pair-level probe above is scan-
    dominated at small volumes (its 200k-pair sweep showed unrolled
    'losing' at every dim) while the real serve rescored ~15.6M pairs
    and read unrolled@8000 3.74x over the fold at dim 64 (r16
    serve_scale_probe run with the hof@8000 cell added) — the
    interpreted-lambda cost is per-pair and only dominates at serve
    volume. So the CAP must be set from this shape: build a real index
    at the probe dim, serve n_queries through each rescorer, noop-sink
    materialization (the serve_scale_probe method)."""
    from pyspark.sql import functions as F

    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark(f"sdt-rescore-serve-{dim}")
    huge = "spark.sql.codegen.hugeMethodLimit"
    default_huge = spark.conf.get(huge, "65535")
    vi._UNROLL_MAX_DIM = max(vi._UNROLL_MAX_DIM, dim)
    vi._BALANCED_MAX_DIM = max(vi._BALANCED_MAX_DIM, dim)

    def synth(n: int, offset: int = 0):
        dims_sql = ", ".join(
            f"cast(pmod(xxhash64(id, {d}), 1000) as float) / 1000.0 - 0.5"
            for d in range(dim)
        )
        return spark.range(n).select(
            (F.col("id") + offset).alias("vec_id"),
            F.expr("cast(pmod(xxhash64(id, 'lbl'), 8) as int)").alias("label"),
            F.expr(f"array({dims_sql})").alias("embedding"),
        )

    tmp = tempfile.mkdtemp(prefix=f"sdt_rescore_serve_{dim}_")
    try:
        idx = os.path.join(tmp, "idx")
        vi.build_vector_index(spark, synth(100_000), idx, n_cells=64)
        qdf = (
            synth(n_queries, offset=5_000_000)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
            .persist()
        )
        qdf.count()
        cell: dict[str, object] = {"n_queries": n_queries, "corpus": 100_000}

        def timed(rescorer: str, conf_value: str) -> float:
            spark.conf.set(huge, conf_value)
            try:
                walls = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    vi.search_vector_index_df(
                        spark, idx, qdf, top_k=5, n_probe=2,
                        eager=False, rescorer=rescorer,
                    ).write.format("noop").mode("overwrite").save()
                    walls.append(time.perf_counter() - t0)
                return round(min(walls), 3)
            finally:
                spark.conf.set(huge, default_huge)

        for key, mode, conf in (
            ("hof@default", "hof", default_huge),
            ("hof@8000", "hof", "8000"),
            ("unrolled@8000", "unrolled", "8000"),
            ("balanced@8000", "balanced", "8000"),
            ("balanced@default", "balanced", default_huge),
        ):
            try:
                cell[key] = timed(mode, conf)
            except BaseException as e:  # noqa: BLE001 - the cliff IS the result
                cell[key] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        hof, unr = cell.get("hof@default"), cell.get("unrolled@8000")
        if isinstance(hof, float) and isinstance(unr, float) and unr:
            cell["serve_speedup_unrolled8000_vs_hof"] = round(hof / unr, 2)
        print("DIMRESULT " + json.dumps({"dim": dim, **cell}), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--serve"]
    serve = "--serve" in sys.argv[1:]
    n_pairs = int(argv[0]) if argv else (5_000 if serve else 200_000)
    dims = [int(a) for a in argv[1:]] or [64, 96, 128, 192, 256, 768]
    if os.environ.get("SDT_DIM_CHILD"):
        (run_serve_dim if serve else run_one_dim)(n_pairs, dims[0])
        return
    results: dict[str, object] = {}
    for dim in dims:
        cmd = [sys.executable, os.path.abspath(__file__), str(n_pairs), str(dim)]
        if serve:
            cmd.append("--serve")
        proc = subprocess.run(
            cmd,
            env=dict(os.environ, SDT_DIM_CHILD="1"),
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("DIMRESULT ")), None
        )
        if line:
            results[str(dim)] = json.loads(line[len("DIMRESULT "):])
        else:
            results[str(dim)] = {
                "crashed": True,
                "rc": proc.returncode,
                "stderr_tail": proc.stderr[-400:],
            }
        print(json.dumps({str(dim): results[str(dim)]}), flush=True)
    print(json.dumps({
        "probe": "rescore_dim_serve" if serve else "rescore_dim",
        "n": n_pairs,
        "results": results,
    }))


if __name__ == "__main__":
    main()
