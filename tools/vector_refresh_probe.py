#!/usr/bin/env python
"""Scale probe for the persisted vector index's day-2 refresh
(operators/vector_index.py) — two claims, each measured:

1. **O(batch)**: 10× the arrival batch against a FIXED index should cost
   ~10× (linear in arrivals; assignment is map-side over the batch).
2. **O(1) in index size**: the SAME batch against a 10× BIGGER index
   should cost ~1× — refresh reads only the JSON centroid model, never
   the cells data. This is the claim that matters at 100 TB: the index
   grows forever, the nightly batch doesn't.

Synthetic 64-dim hash vectors (deterministic, the ann_scale_probe
recipe). Builds happen OUTSIDE the clock; each timing is best-of-2 in
one warmed JVM (refresh is a short batch job — the fresh-JVM-per-config
rig would measure JVM startup, not refresh).

Usage: python tools/vector_refresh_probe.py [n_batch]   # default 10000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def synth_vectors(spark, n: int, id_offset: int = 0):
    from pyspark.sql import functions as F

    dims = ", ".join(
        f"cast(pmod(xxhash64(id, {d}), 1000) as float) / 1000.0 - 0.5" for d in range(64)
    )
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        F.expr("cast(pmod(xxhash64(id, 'lbl'), 8) as int)").alias("label"),
        F.expr(f"array({dims})").alias("embedding"),
    )


def main() -> None:
    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    from synthetic_data_transfer_to_relational_database_spark.operators.vector_index import (
        build_vector_index,
        refresh_vector_index,
    )
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("sdt-vector-refresh-probe")
    tmp = tempfile.mkdtemp(prefix="sdt_vrefresh_")
    try:
        idx_small = os.path.join(tmp, "idx_small")
        idx_big = os.path.join(tmp, "idx_big")
        build_vector_index(spark, synth_vectors(spark, 20_000), idx_small, n_cells=8)
        build_vector_index(spark, synth_vectors(spark, 200_000), idx_big, n_cells=8)

        def timed(path: str, batch_n: int, tag: str) -> float:
            best = float("inf")
            for i in range(2):
                batch = synth_vectors(
                    spark, batch_n, id_offset=1_000_000 * (i + 1) + hash(tag) % 1000
                )
                t0 = time.perf_counter()
                refresh_vector_index(spark, batch, path)
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        timed(idx_small, n_batch, "warm")  # JIT/codegen warm-up, discarded
        walls = {
            "batch_1x_small_index": timed(idx_small, n_batch, "a"),
            "batch_10x_small_index": timed(idx_small, n_batch * 10, "b"),
            "batch_1x_big_index": timed(idx_big, n_batch, "c"),
        }
        # r11 verdict #6: production IVF sets cells in the hundreds — the
        # map-side argmin's cost is a per-row O(k) expression with NO
        # fan-out and NO plan growth in k (the transform over __cents is
        # constant-size text; the model ships as broadcast DATA), so the
        # refresh wall should stay near-flat in k. Builds (outside the
        # clock) use one Lloyd pass — refresh cost doesn't care where the
        # centroids sit, only how many there are.
        k_walls = {}
        for k in (8, 64, 256):
            idx_k = os.path.join(tmp, f"idx_k{k}")
            build_vector_index(
                spark, synth_vectors(spark, 20_000), idx_k, n_cells=k, lloyd_iters=1
            )
            k_walls[str(k)] = timed(idx_k, n_batch, f"k{k}")
        out = {
            "n_batch": n_batch,
            "index_sizes": {"small": 20_000, "big": 200_000},
            "walls": walls,
            "batch_ratio_10x": round(
                walls["batch_10x_small_index"] / walls["batch_1x_small_index"], 2
            ),
            "index_ratio_10x_size": round(
                walls["batch_1x_big_index"] / walls["batch_1x_small_index"], 2
            ),
            "refresh_wall_by_cells": k_walls,
            "cells_ratio_32x": round(k_walls["256"] / k_walls["8"], 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
