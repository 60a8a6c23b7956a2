#!/usr/bin/env python
"""Scale-linearity probe for the corpus-curation pipeline (SCALE.md §2).

The generator engine has a measured 1×/10× profile
(tools/gen_scale_probe.py); this gives the dedup/text layer the same
evidence. A synthetic corpus with a CONTROLLED near-duplicate density
(5% of docs are one-word perturbations of their predecessor) is
generated at N and 10N docs — deterministic text via the packed-draw
sentence generator, seeded by content id, so both scales have identical
per-doc statistics and the SAME dup fraction; only the volume changes.
Each scale runs in its own fresh JVM:

- ``dedup_minhash_lsh`` — signatures, banding, bucket-confined verify;
- ``dedup_cluster``     — blocked pair edges + star-contraction CC;
- ``text_stats``        — tokenize + explode + agg (the linear yardstick).

Corpus generation and parquet write happen OUTSIDE the clock. Reports
wall seconds, the 10×/1× ratio and implied exponent per query. A
bucket-confined pipeline should land near the linear yardstick's
ratio, NOT near 100× — that is the property the probe exists to check.

Usage: python tools/corpus_scale_probe.py [n_docs]   # default 5000
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

# SDT_PROBE_QUERIES=a,b,c scopes the probe (always include text_stats —
# the linear yardstick a ratio means nothing without); default is the
# SCALE.md §2 trio whose numbers the standing re-pin rule governs.
PROBE_QUERIES = [
    q.strip()
    for q in os.environ.get(
        "SDT_PROBE_QUERIES", "text_stats,dedup_minhash_lsh,dedup_cluster"
    ).split(",")
    if q.strip()
]
if "SDT_PROBE_QUERIES" in os.environ:
    # a lingering export must never masquerade as the standing-rule
    # trio re-pin — make the scoping visible in the run's own output
    print(f"# SCOPED by SDT_PROBE_QUERIES: {PROBE_QUERIES} (NOT the standing trio)",
          file=sys.stderr)
DUP_EVERY = 20  # every 20th doc is a near-dup of its predecessor (5%)


def build_corpus(spark, n_docs: int, out_dir: str) -> None:
    """documents table shaped like the testdata: doc_id, text, lang,
    source, n_chars. Text = 12 ten-word sentences, a pure function of
    content_id (dups share their predecessor's content and append one
    marker word — a near-dup under both trigram Jaccard and MinHash)."""
    from pyspark.sql import functions as F

    from synthetic_data_transfer_to_relational_database_spark.functions import generators as G

    cid = f"(CASE WHEN id % {DUP_EVERY} = {DUP_EVERY - 1} THEN id - 1 ELSE id END)"
    sents = ", ".join(
        G.gen_sentence(cid, 1234, f"probe_s{k}", 10) for k in range(12)
    )
    text = (
        f"CASE WHEN id % {DUP_EVERY} = {DUP_EVERY - 1}"
        f" THEN concat(concat_ws(' ', {sents}), ' kopya')"
        f" ELSE concat_ws(' ', {sents}) END"
    )
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(text).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synthetic").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def run_child(n_docs: int) -> dict:
    import bench
    from synthetic_data_transfer_to_relational_database_spark import registry
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("sdt-corpus-scale-probe")
    queries = registry.all_queries()
    tmp = tempfile.mkdtemp(prefix="sdt_corpus_probe_")
    try:
        # warm-up corpus: JIT/codegen for the probe plans, not charged
        warm = os.path.join(tmp, "warm")
        build_corpus(spark, 500, warm)
        for name in PROBE_QUERIES:
            bench._materialize(queries[name](spark, warm))
        spark.catalog.clearCache()

        sf_dir = os.path.join(tmp, "corpus")
        build_corpus(spark, n_docs, sf_dir)
        out: dict[str, float] = {}
        for name in PROBE_QUERIES:
            t0 = time.perf_counter()
            bench._materialize(queries[name](spark, sf_dir))
            out[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    if os.environ.get("SDT_PROBE_CHILD"):
        print(json.dumps(run_child(int(sys.argv[1]))))
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    walls: dict[str, dict[str, float]] = {}
    for label, docs in (("1x", n), ("10x", 10 * n)):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(docs)],
            env=dict(os.environ, SDT_PROBE_CHILD="1"),
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if proc.returncode != 0 or not line:
            sys.exit(f"{label} failed (rc={proc.returncode}):\n" + proc.stderr[-2000:])
        walls[label] = json.loads(line)
        print(f"# {label} ({docs} docs): {walls[label]}", file=sys.stderr)

    report: dict = {"n_docs": n, "walls": walls}
    for q in PROBE_QUERIES:
        a, b = walls["1x"][q], walls["10x"][q]
        report[q] = {
            "ratio_10x": round(b / a, 2),
            "scaling_exponent": round(math.log10(b / a), 2),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
