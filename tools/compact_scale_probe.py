#!/usr/bin/env python
"""Scale probe for the vector index's scope compaction
(operators/vector_index.py compact_vector_index) — the r14 small-files
maintenance. Two claims, each measured:

1. **O(accumulated refresh data)**: 3x the committed refresh scopes
   (same batch size) should cost ~3x — compaction reads exactly the
   merged scopes.
2. **O(1) in build size**: a 10x BIGGER build partition with the same
   refresh scopes should cost ~1x — the build partition is never read
   or rewritten.

Plus the hygiene numbers the feature exists for: files_before ~
scopes x touched cells collapses to files_after ~ cells.

Synthetic 64-dim hash vectors (the vector_refresh_probe recipe).
Builds and refreshes happen OUTSIDE the clock; each config gets ONE
timed compaction (a compaction consumes its input scopes, so it cannot
be repeated on identical state) after a discarded warm-up config in
the same JVM.

Usage: python tools/compact_scale_probe.py [n_batch]   # default 5000
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

from vector_refresh_probe import synth_vectors  # noqa: E402 — same rig


def main() -> None:
    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    from synthetic_data_transfer_to_relational_database_spark.operators.vector_index import (
        build_vector_index,
        compact_vector_index,
        refresh_vector_index,
        verify_vector_index,
    )
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("sdt-compact-probe")
    tmp = tempfile.mkdtemp(prefix="sdt_compact_")

    def prepare(name: str, build_n: int, n_scopes: int) -> str:
        path = os.path.join(tmp, name)
        build_vector_index(spark, synth_vectors(spark, build_n), path, n_cells=16)
        for i in range(n_scopes):
            refresh_vector_index(
                spark, synth_vectors(spark, n_batch, id_offset=1_000_000 * (i + 1)), path
            )
        return path

    def timed_compact(path: str) -> tuple[float, dict]:
        t0 = time.perf_counter()
        rep = compact_vector_index(spark, path)
        return round(time.perf_counter() - t0, 3), rep

    try:
        # warm-up config: JIT/codegen, discarded
        timed_compact(prepare("warm", 10_000, 3))
        results = {}
        for name, build_n, scopes in (
            ("scopes_6_build_20k", 20_000, 6),
            ("scopes_18_build_20k", 20_000, 18),
            ("scopes_6_build_200k", 200_000, 6),
        ):
            path = prepare(name, build_n, scopes)
            wall, rep = timed_compact(path)
            assert rep["ok"] and verify_vector_index(spark, path)["ok"]
            results[name] = {
                "wall_s": wall,
                "rows_merged": rep["rows"],
                "files_before": rep["files_before"],
                "files_after": rep["files_after"],
            }
        out = {
            "n_batch": n_batch,
            "results": results,
            "scopes_ratio_3x": round(
                results["scopes_18_build_20k"]["wall_s"]
                / results["scopes_6_build_20k"]["wall_s"],
                2,
            ),
            "build_ratio_10x_size": round(
                results["scopes_6_build_200k"]["wall_s"]
                / results["scopes_6_build_20k"]["wall_s"],
                2,
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
