#!/usr/bin/env python
"""Scale-linearity probe for the blocked ANN layer (SCALE.md §2).

``sim_knn_graph`` is quadratic ONLY within a block; its 100 TB story
(similarity.py docstring) is that the cell count grows with the corpus
so block size stays task-sized. This probe measures BOTH postures on
synthetic embeddings (64-dim, deterministic hash floats) at N and 10N
vectors, each scale in a fresh JVM, generation outside the clock:

- ``scaled_cells``: n_cells = N / 500 (block size pinned at ~500) —
  the production posture; expected near-linear.
- ``fixed_cells``: n_cells = 8 regardless of N — the naive posture;
  pair count grows 100× for 10× vectors, and the probe shows what that
  costs so the docstring's warning is a measurement, not a slogan.

Usage: python tools/ann_scale_probe.py [n_vectors]   # default 5000
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DIM = 64
BLOCK = 500  # target block size for the scaled posture


def build_embeddings(spark, n: int, n_cells: int, out_dir: str) -> None:
    """embeddings table shaped like the testdata: vec_id, embedding
    array<float>, label int. Components are uniform in [-1, 1], a pure
    hash of (vec_id, dim) — same distribution at every scale."""
    from pyspark.sql import functions as F

    comps = ", ".join(
        f"CAST((pmod(xxhash64(id, {k}), 2001) - 1000) / 1000.0 AS FLOAT)"
        for k in range(DIM)
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(f"array({comps})").alias("embedding"),
            (F.col("id") % n_cells).cast("int").alias("label"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )


def run_child(n: int, n_cells: int) -> float:
    import bench
    from synthetic_data_transfer_to_relational_database_spark import registry
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("sdt-ann-scale-probe")
    fn = registry.all_queries()["sim_knn_graph"]
    tmp = tempfile.mkdtemp(prefix="sdt_ann_probe_")
    try:
        warm = os.path.join(tmp, "warm")
        build_embeddings(spark, 500, 4, warm)
        bench._materialize(fn(spark, warm))  # JIT/codegen warm-up
        spark.catalog.clearCache()

        sf_dir = os.path.join(tmp, "emb")
        build_embeddings(spark, n, n_cells, sf_dir)
        t0 = time.perf_counter()
        bench._materialize(fn(spark, sf_dir))
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    if os.environ.get("SDT_PROBE_CHILD"):
        print(json.dumps({"sec": run_child(int(sys.argv[1]), int(sys.argv[2]))}))
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    configs = {
        "scaled_cells_1x": (n, max(n // BLOCK, 1)),
        "scaled_cells_10x": (10 * n, max(10 * n // BLOCK, 1)),
        "fixed_cells_1x": (n, 8),
        "fixed_cells_10x": (10 * n, 8),
    }
    walls: dict[str, float] = {}
    for key, (docs, cells) in configs.items():
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(docs), str(cells)],
            env=dict(os.environ, SDT_PROBE_CHILD="1"),
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if proc.returncode != 0 or not line:
            # a posture falling over IS a result (the fixed-cells 10×
            # run dies in spill under default heap) — record it rather
            # than aborting the probe
            walls[key] = None
            err = proc.stderr[-400:].replace("\n", " ")
            print(f"# {key} ({docs} vecs, {cells} cells): FAILED — {err}", file=sys.stderr)
            continue
        walls[key] = json.loads(line)["sec"]
        print(f"# {key} ({docs} vecs, {cells} cells): {walls[key]} s", file=sys.stderr)

    report: dict = {"n_vectors": n, "dim": DIM, "block_target": BLOCK, "walls": walls}
    for posture in ("scaled_cells", "fixed_cells"):
        a, b = walls[f"{posture}_1x"], walls[f"{posture}_10x"]
        if a is None or b is None:
            report[posture] = {"ratio_10x": None, "note": "did not finish"}
            continue
        report[posture] = {
            "ratio_10x": round(b / a, 2),
            "scaling_exponent": round(math.log10(b / a), 2),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
