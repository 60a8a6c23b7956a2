"""Per-batch ingest cost split experiment (SCALE.md "Ingest cost model").

Drains the SAME sf corpus through write_stream_dedup_ingest twice — once
split into 4 crawl files, once into 8 — k samples each, best-of-k, then
solves the two-point linear model

    T(n_batches) = fixed * n_batches + per_row_work

for the fixed per-micro-batch overhead (trigger scheduling, ledger
commit, index-append bookkeeping) vs everything proportional to the row
volume (signing, in-batch cluster dedup, cross-corpus index join). Same
total rows in both runs, so the row term cancels in the difference:

    fixed     = (T8 - T4) / 4
    row_work  = T4 - 4 * fixed

Caveat recorded in SCALE.md: an 8-way split does slightly MORE
cross-batch index work (later batches join a larger index), so `fixed`
is a mild over-estimate — acceptable for the 100 TB extrapolation,
where the conclusion only needs the order of magnitude.

Usage: python tools/ingest_cost_split.py [sf_dir] [samples]
Prints one JSON line. Run it alone (no co-tenant Spark jobs): these are
wall-clock numbers with the documented +-8% JVM co-tenancy band.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from synthetic_data_transfer_to_relational_database_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("sdt-ingest-cost-split")
    # Warm-up: one throwaway drain so JIT/codegen/stream machinery costs
    # don't land in the first timed sample. Prefer the tiny sibling SF if
    # the standard testdata layout is present; otherwise warm on the
    # target corpus itself (slower warm-up, same measurement).
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.exists(os.path.join(warm, "documents.parquet")):
        warm = sf_dir
    bench._ingest_corpus(spark, warm, n_batches=2)
    result: dict = {"sf_dir": sf_dir, "samples": samples, "runs": {}}
    best: dict[int, float] = {}
    for n in (4, 8):
        times = [
            round(bench._ingest_corpus(spark, sf_dir, n_batches=n)[0], 3)
            for _ in range(samples)
        ]
        result["runs"][str(n)] = times
        best[n] = min(times)
    fixed = (best[8] - best[4]) / 4.0
    row_work = best[4] - 4.0 * fixed
    result["best"] = {str(k): v for k, v in best.items()}
    result["fixed_per_batch_sec"] = round(fixed, 3)
    result["row_work_sec"] = round(row_work, 3)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
