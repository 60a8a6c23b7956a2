"""Persisted IVF vector index (operators/vector_index.py): the day-2
vector-index story — build / refresh / verify / serve — pinned against
the oracle-paired ``embedding_index_refresh`` contract and the exact
brute-force answer."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from synthetic_data_transfer_to_relational_database_spark.operators import similarity
from synthetic_data_transfer_to_relational_database_spark.operators.vector_index import (
    build_vector_index,
    read_meta,
    refresh_vector_index,
    search_vector_index,
    verify_vector_index,
)


def _splits(spark, sf_dir):
    """The embedding_index_refresh 80/20 hash split, verbatim."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bk = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("vref:"), F.col("vec_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10
    )
    e2 = e.select("vec_id", "label", "embedding", bk.alias("bk"))
    return e2.filter(F.col("bk") < 8).drop("bk"), e2.filter(F.col("bk") >= 8).drop("bk")


def test_refresh_matches_oracle_paired_batch_face(spark, sf_dir, tmp_path):
    """THE semantics bridge: by_label build over the base split +
    refresh with the new split must reproduce the oracle-paired
    embedding_index_refresh query EXACTLY — per-cell n_base, n_added,
    n_label_match, sum_d2_milli. The persisted face and the driver-gated
    contract cannot drift apart while this holds."""
    base, new = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    meta = build_vector_index(spark, base, idx, centroids="by_label")
    report = refresh_vector_index(spark, new, idx)
    want = {
        r.cell_label: r
        for r in similarity.QUERIES["embedding_index_refresh"](spark, sf_dir).collect()
    }
    assert set(meta["cells"]) == {str(k) for k in want}
    # the shared semantics is the ARRIVAL ASSIGNMENT: per cell, the
    # refresh must reproduce the query's n_added / n_label_match /
    # sum_d2_milli bit-for-bit. (n_base differs by design: the query
    # counts base vectors by TRUE LABEL, the index stores them by
    # NEAREST CENTROID — a base vector can sit nearer another label's
    # centroid, and an IVF files it where it is served from.)
    for lbl, w in want.items():
        got = report["cells"].get(lbl, {"n_added": 0, "n_label_match": 0, "sum_d2_milli": 0})
        assert (got["n_added"], got["n_label_match"], got["sum_d2_milli"]) == (
            w.n_added,
            w.n_label_match,
            w.sum_d2_milli,
        ), f"cell {lbl}"
    assert report["n_added"] == new.count()
    # counters fold: post-refresh meta = build counts + adds, totals exact
    meta2 = read_meta(idx)
    for lbl in want:
        assert meta2["cells"][str(lbl)]["n"] == meta["cells"][str(lbl)]["n"] + report[
            "cells"
        ].get(lbl, {}).get("n_added", 0)
    assert sum(c["n"] for c in meta["cells"].values()) == base.count()
    assert verify_vector_index(spark, idx)["ok"]


def test_refresh_reads_no_index_data(spark, sf_dir, tmp_path):
    """The O(batch) property, proven destructively: after the cells
    dataset is DELETED, refresh still succeeds (it reads only the JSON
    model and appends new partitions) — and verify then reports the
    missing base data instead of pretending all is well."""
    base, new = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, base, idx, centroids="by_label")
    shutil.rmtree(f"{idx}/cells")
    report = refresh_vector_index(spark, new, idx)
    assert report["n_added"] == new.count()
    v = verify_vector_index(spark, idx)
    assert not v["ok"] and v["mismatched_cells"], v


def test_verify_detects_orphan_cells(spark, sf_dir, tmp_path):
    base, _ = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, base, idx, centroids="by_label")
    # an orphan cell partition nothing in the model knows about
    base.limit(3).select(
        F.lit(999).alias("cell_id"),
        "vec_id",
        "label",
        "embedding",
        F.lit(0.0).alias("d2"),
        F.lit("rogue").alias("ingest_batch"),
    ).write.mode("append").partitionBy("cell_id", "ingest_batch").parquet(f"{idx}/cells")
    v = verify_vector_index(spark, idx)
    assert not v["ok"] and v["orphan_cells"] == [999]


def test_search_all_probes_equals_brute_force(spark, sf_dir, tmp_path):
    """With every cell probed, the persisted serve path must equal the
    exact brute-force sim_search answer row-for-row (same fold
    expressions, same tiebreak) — bucketing changes recall, never
    scores; at full probe it changes nothing at all."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, e, idx, centroids="kmeans", n_cells=8)
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in e.filter(F.col("vec_id") < 10).collect()
    ]
    got = {
        (r.query_id, r.rn): (r.vec_id, round(r.cosine, 12))
        for r in search_vector_index(spark, idx, queries, top_k=5, n_probe=8).collect()
    }
    want = {
        (r.query_id, r.rn): (r.vec_id, round(r.cosine, 12))
        for r in similarity.QUERIES["sim_search"](spark, sf_dir).collect()
    }
    assert got == want


def test_search_restart_and_recall_floor(spark, sf_dir, tmp_path):
    """Process-restart story: serving needs only the path (no catalog,
    no session state). And at n_probe=2 of 8 the pruned serve keeps a
    sane recall vs exact — the scan reading 2 cell directories instead
    of 8 is the at-scale point of the layout."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, e, idx, centroids="kmeans", n_cells=8)
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in e.filter(F.col("vec_id") < 10).collect()
    ]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.QUERIES["sim_search"](spark, sf_dir).collect()
    }
    # "restart": nothing passed but the path — read_meta + serve fresh
    assert read_meta(idx)["mode"] == "kmeans"
    got = {
        (r.query_id, r.vec_id)
        for r in search_vector_index(spark, idx, queries, top_k=5, n_probe=2).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"n_probe=2 recall@5 = {recall:.3f}"


def test_dimension_drift_fails_loudly(spark, sf_dir, tmp_path):
    """zip_with NULL-pads mismatched arrays — without the dim guard a
    wrong-dim batch would be assigned by silently-truncated distances.
    Both the refresh and the serve face must refuse instead."""
    import pytest

    base, _ = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, base, idx, centroids="by_label")
    bad = base.limit(5).select(
        "vec_id", "label", F.expr("slice(embedding, 1, 32)").alias("embedding")
    )
    with pytest.raises(ValueError, match="does not match the index's 64"):
        refresh_vector_index(spark, bad, idx)
    with pytest.raises(ValueError, match="index expects 64"):
        search_vector_index(spark, idx, [(0, [0.0] * 32)])


def test_build_guards_model_size(spark, sf_dir, tmp_path):
    """r11 verdict #5: the centroid model is a driver-held JSON artifact
    — refuse cell counts that assume a distributed model store."""
    import pytest

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="exceeds the 10000 cap"):
        build_vector_index(spark, e, str(tmp_path / "vidx"), n_cells=10_001)
    # and a corpus smaller than n_cells fails with the corpus message,
    # not a biased partial seed set
    small = e.limit(4)
    with pytest.raises(ValueError, match="exceeds the corpus"):
        build_vector_index(spark, small, str(tmp_path / "vidx2"), n_cells=8)


def test_uri_paths_round_trip_through_hadoop_fs(spark, sf_dir, tmp_path):
    """r12 verdict #3: the index is object-store-complete — a non-local
    URI (file:// here, the same Hadoop FileSystem API an hdfs:// or
    s3a:// path rides) must survive the whole build→refresh→verify→
    search loop, the model rewrite must stay atomic (FileContext
    rename-over: no .tmp remnant), and the answers must equal the plain
    local-path index byte-for-byte."""
    import os

    base, new = _splits(spark, sf_dir)
    local = str(tmp_path / "vidx_local")
    uri = "file://" + str(tmp_path / "vidx_uri")
    build_vector_index(spark, base, local, centroids="by_label")
    build_vector_index(spark, base, uri, centroids="by_label")
    r_local = refresh_vector_index(spark, new, local)
    r_uri = refresh_vector_index(spark, new, uri)
    assert r_uri == r_local
    assert verify_vector_index(spark, uri)["ok"]
    # atomic rename-over left no temp artifact, and the model parses back
    assert not os.path.exists(str(tmp_path / "vidx_uri" / "_centroids.json.tmp"))
    assert read_meta(uri, spark) == read_meta(local)
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in base.filter(F.col("vec_id") < 5).collect()
    ]
    got = sorted(map(tuple, search_vector_index(spark, uri, queries, top_k=3, n_probe=2).collect()))
    want = sorted(map(tuple, search_vector_index(spark, local, queries, top_k=3, n_probe=2).collect()))
    assert got == want


def test_build_works_on_offset_ids_and_meta_write_is_atomic(spark, sf_dir, tmp_path):
    """r11 advice pair: (a) seeds come from the first n rows BY RANK, so
    a corpus whose vec_ids don't start at 0 builds fine; (b) the model
    rewrite goes through a temp file + os.replace — no .tmp remnant, and
    the model parses back after a refresh rewrote it."""
    import os

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    shifted = e.select((F.col("vec_id") + 10_000).alias("vec_id"), "label", "embedding")
    idx = str(tmp_path / "vidx")
    meta = build_vector_index(spark, shifted, idx, centroids="kmeans", n_cells=8)
    assert len(meta["centroids"]) == 8
    report = refresh_vector_index(
        spark,
        e.select((F.col("vec_id") + 90_000).alias("vec_id"), "label", "embedding").limit(20),
        idx,
    )
    assert report["n_added"] == 20
    assert not os.path.exists(f"{idx}/_centroids.json.tmp")
    assert read_meta(idx)["n_vectors"] == meta["n_vectors"] + 20
    assert verify_vector_index(spark, idx)["ok"]


def test_sim_search_index_key_equals_brute_force_exactly(spark, sf_dir):
    """The registered oracle-paired key (r11 verdict #2): the
    build→persist→serve loop must reproduce sim_search EXACTLY — same
    rows, same double bits — because it shares the brute-force oracle."""
    got = sorted(map(tuple, similarity.QUERIES["sim_search_index"](spark, sf_dir).collect()))
    want = sorted(map(tuple, similarity.QUERIES["sim_search"](spark, sf_dir).collect()))
    assert got == want


def test_cells_write_layout_refresh_single_file_build_sharded(spark, sf_dir, tmp_path):
    """The write-layout guard, split by face (r12 advice):

    REFRESH appends exactly ONE file per touched cell — without the
    cell_id repartition a dynamic-partition write emits one file per
    (task, cell), tasks × k tiny files per refresh (measured 17.2 s vs
    4.5 s at k=256 on the probe), the file-count explosion that
    compounds daily at 100 TB.

    BUILD keeps write parallelism instead: funneling the full corpus
    through k tasks caps the initial write at the cell count and makes
    one unbounded file per cell, so builds shard each cell's write by a
    vec_id hash — ≤ write_shards files per cell, never (task, cell)
    explosion."""
    import glob

    base, new = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, base, idx, centroids="by_label", write_shards=4)
    built = {
        d: len(glob.glob(f"{d}/ingest_batch=build/*.parquet"))
        for d in glob.glob(f"{idx}/cells/cell_id=*")
    }
    assert built and all(1 <= n <= 4 for n in built.values()), built
    refresh_vector_index(spark, new, idx)
    # the refresh landed in its own scope (r1), exactly one file per
    # touched cell, and touched nothing in the build scope
    assert built == {
        d: len(glob.glob(f"{d}/ingest_batch=build/*.parquet"))
        for d in glob.glob(f"{idx}/cells/cell_id=*")
    }
    refreshed = {
        d: len(glob.glob(f"{d}/ingest_batch=r1/*.parquet"))
        for d in glob.glob(f"{idx}/cells/cell_id=*")
    }
    assert all(n <= 1 for n in refreshed.values()), refreshed
    assert sum(refreshed.values()) > 0
    assert verify_vector_index(spark, idx)["ok"]


def test_search_df_path_equals_list_path(spark, sf_dir, tmp_path):
    """r12 verdict #4: the DataFrame-native serve must be row-identical
    to the list-path serve on the same query set — at FULL probe (exact)
    and at a PRUNED probe (same probe-cell ranking: identical IEEE d2
    fold and d2-then-cell_id tiebreak, so the same cells are scanned and
    the same candidates scored)."""
    from synthetic_data_transfer_to_relational_database_spark.operators.vector_index import (
        search_vector_index_df,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, e, idx, centroids="kmeans", n_cells=8)
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in e.filter(F.col("vec_id") < 10).collect()
    ]
    qdf = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    for n_probe in (8, 2):
        got = sorted(
            map(tuple, search_vector_index_df(spark, idx, qdf, top_k=5, n_probe=n_probe).collect())
        )
        want = sorted(
            map(tuple, search_vector_index(spark, idx, queries, top_k=5, n_probe=n_probe).collect())
        )
        assert got == want, f"n_probe={n_probe}"


def test_null_embeddings_and_empty_corpus_fail_loudly(spark, sf_dir, tmp_path):
    """Self-review hardening: a NULL embedding (or an empty build corpus)
    must raise BEFORE the partitioned write — the map-side argmin would
    otherwise assign cell_id NULL and land rows in a
    __HIVE_DEFAULT_PARTITION__ directory no centroid owns, then crash the
    counter fold with int(None)."""
    import pytest
    from pyspark.sql import functions as F

    base, new = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    with pytest.raises(ValueError, match="empty corpus"):
        build_vector_index(spark, base.limit(0), idx, centroids="by_label")
    build_vector_index(spark, base, idx, centroids="by_label")
    poisoned = new.limit(5).select(
        "vec_id",
        "label",
        F.when(F.col("vec_id") % 2 == 0, F.col("embedding")).alias("embedding"),
    )
    with pytest.raises(ValueError, match="embedding is NULL"):
        refresh_vector_index(spark, poisoned, idx)
    with pytest.raises(ValueError, match="embedding is NULL"):
        build_vector_index(spark, poisoned, str(tmp_path / "vidx2"), centroids="by_label")
    # the failed refresh wrote nothing: the index still verifies
    assert verify_vector_index(spark, idx)["ok"]


def test_crashed_plain_refresh_never_shares_a_scope(spark, sf_dir, tmp_path, monkeypatch):
    """r13 review: plain refreshes RESERVE their ingest scope in a meta
    write before any data lands. A crashed attempt (scope reserved,
    cells written, counter fold lost) must therefore never share a
    partition with the NEXT batch — the next refresh takes a fresh
    scope, the orphan is named by verify (the heal target), and
    deleting it restores ok."""
    import glob

    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )

    base, new = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, base, idx, centroids="by_label")
    meta = read_meta(idx)
    cents = [(int(c["cell_id"]), c["cv"]) for c in meta["centroids"]]
    # simulate the crash window: reservation + data write, no fold
    meta["refresh_seq"] = 1
    vi._write_meta(idx, meta, spark)
    vi._write_cells(vi._assign(spark, new.limit(30), cents), idx, "r1")
    v = verify_vector_index(spark, idx)
    assert not v["ok"] and v["uncommitted_scopes"] == ["r1"]
    # the NEXT batch (different data) lands in r2 — no mixing with r1
    report = refresh_vector_index(spark, new.limit(10), idx)
    assert report["n_added"] == 10
    assert glob.glob(f"{idx}/cells/cell_id=*/ingest_batch=r2")
    v2 = verify_vector_index(spark, idx)
    assert not v2["ok"] and v2["uncommitted_scopes"] == ["r1"]
    # heal = delete exactly the named orphan scopes, nothing else
    healed = vi.heal_vector_index(spark, idx)
    assert healed == {"removed_scopes": ["r1"], "ok": True}
    assert not glob.glob(f"{idx}/cells/cell_id=*/ingest_batch=r1")
    assert glob.glob(f"{idx}/cells/cell_id=*/ingest_batch=r2")
    assert verify_vector_index(spark, idx)["ok"]


def test_stream_ledger_is_bounded_and_trimmed_batches_stay_committed(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r13 review: the per-batch reports in the model JSON are trimmed
    to the newest _LEDGER_KEEP; a trimmed batch is still provably
    committed via the stream_max_committed high-water mark, so its
    replay is a no-op (never a double-append)."""
    from synthetic_data_transfer_to_relational_database_spark.operators import (
        vector_index as vi,
    )

    monkeypatch.setattr(vi, "_LEDGER_KEEP", 2)
    base, new = _splits(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    build_vector_index(spark, base, idx, centroids="by_label")
    slices = [new.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    for i, s in enumerate(slices):
        refresh_vector_index(spark, s, idx, stream_batch_id=i)
    meta = read_meta(idx)
    assert sorted(meta["stream_batches"]) == ["1", "2"]  # batch 0 trimmed
    assert meta["stream_max_committed"] == 2
    n = meta["n_vectors"]
    # replay of the TRIMMED batch: no-op by the high-water mark
    rep = refresh_vector_index(spark, slices[0], idx, stream_batch_id=0)
    assert rep["replayed"] and rep.get("trimmed") and rep["n_added"] == 0
    assert read_meta(idx)["n_vectors"] == n
    assert verify_vector_index(spark, idx)["ok"]
