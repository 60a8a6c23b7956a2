"""Opt-in persistent-metastore smoke for ensure_index (streaming/ingest).

The repo's session factory uses the in-memory catalog, so ensure_index's
"exists" fast path is only reachable within one process there; with a
persistent Hive metastore the table definition OUTLIVES the process and
a restarted ingest must degrade to "exists" (the documented path,
ensure_index docstring) instead of re-registering or — fatally —
re-bootstrapping over the accumulated index.

Each phase runs in its own subprocess because
spark.sql.catalogImplementation is fixed at SparkContext creation: the
shared test session can't flip to hive, and two different catalogs can't
coexist in one JVM. Opt-in (SDT_HIVE_SMOKE=1): two extra JVM startups
(~1 min) against the derby-backed metastore under a temp dir.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

_PHASE = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession

    base, phase = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"sdt-hive-smoke-{phase}")
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", f"{base}/warehouse")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={base}/metastore_db;create=true",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .enableHiveSupport()
        .getOrCreate()
    )
    sys.path.insert(0, %(repo)r)
    from synthetic_data_transfer_to_relational_database_spark.streaming.ingest import (
        ensure_index,
    )

    table, idx_path = "t_hive_smoke_idx", f"{base}/idx"
    if phase == "bootstrap":
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog", "en", "s", 44)],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        how = ensure_index(spark, table, idx_path, docs_src=docs)
    else:
        how = ensure_index(spark, table, idx_path)
    out = {"how": how, "rows": spark.table(table).count()}
    print("RESULT:" + json.dumps(out))
    spark.stop()
    """
)


@pytest.mark.skipif(
    not os.environ.get("SDT_HIVE_SMOKE"),
    reason="persistent-metastore smoke: set SDT_HIVE_SMOKE=1 to run — it "
    "starts two extra JVMs against a derby-backed Hive metastore (~1 min)",
)
def test_ensure_index_exists_path_survives_process_restart(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _PHASE % {"repo": repo}

    def run(phase: str) -> dict:
        import json

        # cwd=tmp_path keeps the phase JVMs' derby.log out of the repo
        proc = subprocess.run(
            [sys.executable, "-c", script, str(tmp_path), phase],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = next(
            ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")
        )
        return json.loads(line[len("RESULT:") :])

    first = run("bootstrap")
    assert first["how"] == "bootstrapped"
    assert first["rows"] > 0  # the seed doc's signatures are in the index

    # NEW process, same metastore: the catalog remembers the table, so
    # ensure_index must take the exists fast path — not re-register,
    # and above all not re-bootstrap over the live index — and the
    # table must still resolve to the same data.
    second = run("exists")
    assert second["how"] == "exists"
    assert second["rows"] == first["rows"]
