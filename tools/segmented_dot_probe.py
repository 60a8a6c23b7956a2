#!/usr/bin/env python
"""Segmented-dot probe past the balanced cap (r16 verdict item #6):
`_BALANCED_MAX_DIM = 1536` is a measured two-sided cap — 3072 kills the
JVM inside janino's per-statement recursion (StackOverflowError in
buildLocalVariableMap over the ~9k-statement split method). This probes
whether a TWO-LEVEL sum — k sub-trees of <= 1536 terms each, then a
k-term outer sum (sum-of-segment-dots, same neighbor-parity contract as
'balanced') — clears that wall, and at what speed vs the HOF fold.

Variants, each in its OWN SUBPROCESS (the failure class is JVM death):
- fold        : the shipped `_cosine_col(dim, 'hof')` control.
- seg1expr    : ONE expression, left-assoc sum of k balanced segment
                sub-trees. Same statement count as plain balanced in one
                generated method — expected to hit the same janino wall;
                measured, not assumed.
- segarray    : aggregate(array(seg_0..seg_k), 0.0D, (a,s)->a+s). The
                HOF is CodegenFallback, so the segment trees run
                INTERPRETED — probably fold-speed; measured.
- seg2proj    : inner projection computes the 3 x k segment-dot COLUMNS
                (each a <= 1536-term balanced tree, split per-field by
                the projection codegen), outer projection sums them.
                CollapseProject would fuse the two selects back into the
                fatal single expression, so the inner select carries a
                rand()-based barrier column (nondeterministic projections
                do not collapse; the barrier enters the result as
                `+ 0.0 * rand()` — exact zero, bits unaffected).

Adoption rule (verdict): wire a 'segmented' rescorer if a variant is
BOTH stable and >= 1.5x over the fold at 3072; otherwise record the
measured dead end in SCALE.md and move on.

Usage: python tools/segmented_dot_probe.py [n_pairs] [dims...]
       # defaults 10000 pairs at dim 3072; add 4096 for a winner
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

SEG = 1536  # the measured-good balanced width


def _balanced_terms(x: str, y: str, lo: int, hi: int) -> str:
    terms = [
        f"cast({x}[{i}] as double) * cast({y}[{i}] as double)" for i in range(lo, hi)
    ]
    while len(terms) > 1:
        paired = [f"({terms[i]} + {terms[i + 1]})" for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            paired.append(terms[-1])
        terms = paired
    return terms[0]


def _segments(x: str, y: str, dim: int) -> list[str]:
    return [_balanced_terms(x, y, lo, min(lo + SEG, dim)) for lo in range(0, dim, SEG)]


def run_variant(variant: str, n_pairs: int, dim: int, data_path: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        # 4g: at dim 3072 a 1g default heap dies on DATA long before any
        # codegen wall — deaths must be attributable to the variant
        .config("spark.driver.memory", "4g")
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .appName(f"sdt-seg-{variant}-{dim}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data_path)

    def seg_dot(x: str, y: str) -> str:
        return " + ".join(f"({s})" for s in _segments(x, y, dim))

    def seg_arr(x: str, y: str) -> str:
        inner = ", ".join(_segments(x, y, dim))
        return f"aggregate(array({inner}), 0.0D, (a, s) -> a + s)"

    out = df
    if variant == "fold":
        cos = vi._cosine_col(dim, "hof")
        out = df.select(cos)
    elif variant == "seg1expr":
        cos = (
            F.expr(seg_dot("qv", "cv"))
            / (F.sqrt(F.expr(seg_dot("qv", "qv"))) * F.sqrt(F.expr(seg_dot("cv", "cv"))))
        ).alias("cosine")
        out = df.select(cos)
    elif variant == "segarray":
        cos = (
            F.expr(seg_arr("qv", "cv"))
            / (F.sqrt(F.expr(seg_arr("qv", "qv"))) * F.sqrt(F.expr(seg_arr("cv", "cv"))))
        ).alias("cosine")
        out = df.select(cos)
    elif variant == "seg2proj":
        cols, names = [], {"qc": [], "qq": [], "cc": []}
        for tag, (x, y) in {"qc": ("qv", "cv"), "qq": ("qv", "qv"), "cc": ("cv", "cv")}.items():
            for j, s in enumerate(_segments(x, y, dim)):
                nm = f"__{tag}_{j}"
                names[tag].append(nm)
                cols.append(F.expr(s).alias(nm))
        # the barrier: a nondeterministic column stops CollapseProject
        # from fusing the projections back into one fatal expression
        inner = df.select(*cols, F.rand().alias("__bar"))
        dot = " + ".join(names["qc"])
        nq = " + ".join(names["qq"])
        nc = " + ".join(names["cc"])
        out = inner.select(
            (
                F.expr(dot) / (F.sqrt(F.expr(nq)) * F.sqrt(F.expr(nc)))
                + F.lit(0.0) * F.col("__bar")
            ).alias("cosine")
        )
    else:
        raise SystemExit(f"unknown variant {variant}")

    times = []
    for _ in range(2):
        t0 = time.time()
        row = out.agg(F.sum("cosine")).collect()[0]
        times.append(round(time.time() - t0, 2))
    print(
        "RESULT "
        + json.dumps(
            {
                "variant": variant,
                "dim": dim,
                "n_pairs": n_pairs,
                "t_first": times[0],
                "t_best": min(times),
                "sum": row[0],
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--variant":
        run_variant(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return 0
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    dims = [int(d) for d in sys.argv[2:]] or [3072]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    for dim in dims:
        tmp = tempfile.mkdtemp(prefix=f"sdt_seg_{dim}_")
        data = os.path.join(tmp, "pairs")
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "16")
            .appName("sdt-seg-gen")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(n_pairs).select(
            F.expr(
                f"transform(sequence(0, {dim - 1}), d -> "
                "cast(pmod(xxhash64(id, d), 1000) as float) / 1000.0 - 0.5)"
            ).alias("qv"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), d -> "
                "cast(pmod(xxhash64(id + 7, d), 1000) as float) / 1000.0 - 0.5)"
            ).alias("cv"),
        ).write.mode("overwrite").parquet(data)
        spark.stop()
        try:
            for variant in ("fold", "seg1expr", "segarray", "seg2proj"):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--variant",
                     variant, str(n_pairs), str(dim), data],
                    capture_output=True, text=True, timeout=1200,
                )
                for line in r.stdout.splitlines():
                    if line.startswith("RESULT "):
                        print(line)
                        break
                else:
                    tail = (r.stderr or r.stdout).strip().splitlines()[-8:]
                    print(
                        "RESULT "
                        + json.dumps(
                            {"variant": variant, "dim": dim, "died": True,
                             "rc": r.returncode, "tail": tail[-3:]}
                        )
                    )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
