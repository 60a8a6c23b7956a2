"""Round-5 scale refinements, each asserted semantically:

- text_doc_pairs_jaccard's candidate cap is least(6% * n_docs,
  spark.sdt.pairs.maxTokenDf) — the absolute term must BIND when set.
- graph triangles use degree-ordered orientation — the triangle SET must
  be identical to the id-ordered form (pure refinement, not a semantics
  change), checked against a brute-force enumeration on a hub-skewed
  graph.
- events_anomaly_mad / orders_rfm percentiles are cost-dispatched:
  exact below spark.sdt.percentile.smallInputBytes, percentile_approx
  above — the forced-approx branch is tolerance-tested, not just 'runs'.
"""

from __future__ import annotations

import bisect

import pandas as pd
import pytest
from pyspark.sql import functions as F

from synthetic_data_transfer_to_relational_database_spark.operators.events import (
    QUERIES as EVENTS_QUERIES,
)
from synthetic_data_transfer_to_relational_database_spark.operators.relational2 import (
    QUERIES as REL2_QUERIES,
    oriented_triangles,
)
from synthetic_data_transfer_to_relational_database_spark.operators.text import (
    QUERIES as TEXT_QUERIES,
)
from synthetic_data_transfer_to_relational_database_spark.sources.tables import table


@pytest.fixture()
def forced_approx(spark):
    spark.conf.set("spark.sdt.percentile.smallInputBytes", "0")
    yield
    spark.conf.unset("spark.sdt.percentile.smallInputBytes")


def _write_docs(tmp_path, docs) -> str:
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "synthetic"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    return str(tmp_path)


def test_doc_pairs_absolute_df_cap_binds(spark, tmp_path):
    """A token under the RELATIVE cap (5 of 100 docs < 6%) but over the
    ABSOLUTE cap (conf 3) must generate no candidate pairs; an
    uncapped near-dup pair must still survive. Same corpus, default
    conf: the hot-token pairs reappear — proving the absolute term, not
    corpus shape, is what excluded them."""
    docs = [(i, f"w{i}a w{i}b w{i}c") for i in range(93)]  # all-unique filler
    docs += [(100 + i, "hot") for i in range(5)]  # identical 1-token docs, df(hot)=5
    docs += [(200, "x1 x2 x3 x4"), (201, "x1 x2 x3 x9")]  # jaccard 0.6 pair
    sf_dir = _write_docs(tmp_path, docs)

    spark.conf.set("spark.sdt.pairs.maxTokenDf", "3")
    try:
        pairs = {
            (r.doc_a, r.doc_b)
            for r in TEXT_QUERIES["text_doc_pairs_jaccard"](spark, sf_dir).collect()
        }
    finally:
        spark.conf.unset("spark.sdt.pairs.maxTokenDf")
    assert (200, 201) in pairs
    assert not any(100 <= a < 105 for a, _ in pairs), "capped token leaked pairs"

    # default conf (1e4): the relative cap alone (6% of 100 = 6 >= 5)
    # admits the hot token, so the identical docs pair up
    spark.catalog.clearCache()
    pairs_default = {
        (r.doc_a, r.doc_b)
        for r in TEXT_QUERIES["text_doc_pairs_jaccard"](spark, sf_dir).collect()
    }
    assert (100, 101) in pairs_default and (200, 201) in pairs_default


def test_triangles_degree_order_matches_bruteforce_on_hub_graph(spark):
    """Degree-ordered wedge-close on a hub-skewed graph (one node joined
    to everything + embedded triangles): the result must equal the
    brute-force triangle set, with each triangle emitted once and
    canonically a < b < c by ID — i.e. the orientation refinement
    changes fan-out, never the answer."""
    edges = [(0, i) for i in range(1, 30)]  # hub 0
    edges += [(1, 2), (3, 4), (4, 5), (3, 5), (10, 11), (11, 12)]
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {
        tuple(sorted((a, b, c)))
        for a in adj
        for b in adj[a]
        for c in adj[b]
        if a < b < c and c in adj[a]
    }
    df = spark.createDataFrame(edges, "u long, v long")
    got = [(r.a, r.b, r.c) for r in oriented_triangles(df).collect()]
    assert len(got) == len(set(got)), "triangle emitted more than once"
    assert set(got) == want
    assert all(a < b < c for a, b, c in got)
    spark.catalog.clearCache()


def test_triangles_same_set_as_id_orientation(spark, sf_dir):
    """On the real co-occurrence graph the degree-ordered plan's triangle
    set is bit-equal to the id-ordered wedge-close it replaced."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    la = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    lb = li.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("v"))
    edges = (
        la.join(lb, (F.col("k") == F.col("k2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    id_ordered = {
        (r.a, r.b, r.c)
        for r in e1.join(e2, F.col("b2") == F.col("b"))
        .join(e3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
        .select("a", "b", "c")
        .collect()
    }
    got = {(r.a, r.b, r.c) for r in REL2_QUERIES["graph_triangles"](spark, sf_dir).collect()}
    assert got == id_ordered
    spark.catalog.clearCache()


def test_anomaly_mad_approx_branch_rank_bounded(spark, sf_dir_mid, forced_approx):
    """Forced onto the percentile_approx branch (threshold 0), the
    per-type med/mad must be actual data values whose rank sits within
    the sketch's guaranteed n/10000 window of the true median rank, and
    the flagged set must be exactly what the approx stats imply (the
    dispatch changes the estimator, never the flagging logic)."""
    out = EVENTS_QUERIES["events_anomaly_mad"](spark, sf_dir_mid).collect()
    e = table(spark, sf_dir_mid, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    groups: dict[str, list] = {}
    for r in e.collect():
        groups.setdefault(r.event_type, []).append((r.event_id, r.cents))

    # reconstruct each type's (med, mad) from the output rows themselves
    stats = {r.event_type: (r.median_cents, r.mad_cents) for r in out}
    flagged = {(r.event_id, r.event_type) for r in out}
    for etype, (med, mad) in stats.items():
        vals = sorted(c for _, c in groups[etype])
        n = len(vals)
        tol = n / 10000 + 1
        lo, hi = bisect.bisect_left(vals, med), bisect.bisect_right(vals, med)
        assert lo < hi, f"{etype}: approx median {med} not a data value"
        assert lo - tol <= 0.5 * (n - 1) <= (hi - 1) + tol
        devs = sorted(abs(c - med) for _, c in groups[etype])
        dlo, dhi = bisect.bisect_left(devs, mad), bisect.bisect_right(devs, mad)
        assert dlo < dhi, f"{etype}: approx MAD {mad} not a deviation value"
        assert dlo - tol <= 0.5 * (n - 1) <= (dhi - 1) + tol

    want = set()
    for etype, rows in groups.items():
        if etype not in stats:
            # a type can legitimately flag nothing; its stats are then
            # invisible — nothing to check for it
            continue
        med, mad = stats[etype]
        if mad <= 0:
            continue
        for eid, c in rows:
            if abs((c - med) / (1.4826 * mad)) > 3.5:
                want.add((eid, etype))
    assert flagged == want


def test_orders_rfm_approx_branch_segments_coherent(spark, sf_dir_mid, forced_approx):
    """Forced onto the approx branch, RFM segments must stay monotone in
    monetary value, cover all four tiers, and agree with the exact-
    quartile assignment on >= 99% of customers (accuracy 10000 on ~10k
    customers keeps the sketch within a handful of ranks)."""
    rows = REL2_QUERIES["orders_rfm"](spark, sf_dir_mid).collect()
    by_money = sorted(rows, key=lambda r: r.monetary_cents)
    segs = [r.m_segment for r in by_money]
    assert sorted(set(segs)) == [1, 2, 3, 4]
    assert segs == sorted(segs), "segments not monotone in monetary value"

    monies = [r.monetary_cents for r in by_money]
    n = len(monies)

    def quantile_cont(p: float) -> float:
        idx = p * (n - 1)
        f, c = int(idx), min(int(idx) + 1, n - 1)
        return monies[f] + (idx - f) * (monies[c] - monies[f])

    q1, q2, q3 = quantile_cont(0.25), quantile_cont(0.5), quantile_cont(0.75)

    def exact_seg(m: float) -> int:
        return 4 if m >= q3 else 3 if m >= q2 else 2 if m >= q1 else 1

    agree = sum(1 for r in by_money if r.m_segment == exact_seg(r.monetary_cents))
    assert agree / n >= 0.99, f"only {agree}/{n} match exact quartile segments"


def test_rollup_hierarchy_cascade_consistent(spark, sf_dir_mid):
    """Every resolution must total identically (the cascade re-aggregates
    exactly), and coarser levels must have no more rows than finer."""
    rows = EVENTS_QUERIES["events_rollup_hierarchy"](spark, sf_dir_mid).collect()
    by_res: dict[str, list] = {}
    for r in rows:
        by_res.setdefault(r.resolution, []).append(r)
    assert set(by_res) == {"hour", "day", "month"}
    totals = {
        res: (sum(r.n_events for r in rs), sum(r.value_cents for r in rs))
        for res, rs in by_res.items()
    }
    assert totals["hour"] == totals["day"] == totals["month"]
    assert len(by_res["month"]) <= len(by_res["day"]) <= len(by_res["hour"])
    spark.catalog.clearCache()


def test_sketch_union_estimate_within_bound(spark, sf_dir_mid):
    """The two-level HLL union's estimate must sit within lgK=12's
    ~1.6%·3σ relative error of the exact per-type distinct-user count,
    and the day-sketch count must equal the exact day count (the
    pre-aggregation grain is real, not incidental)."""
    got = {r.event_type: r for r in EVENTS_QUERIES["agg_sketch_union"](spark, sf_dir_mid).collect()}
    e = table(spark, sf_dir_mid, "events")
    exact = {
        r.event_type: (r.users, r.days)
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.countDistinct(F.date_trunc("day", "ts")).alias("days"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for etype, (users, days) in exact.items():
        est = got[etype].approx_users
        assert abs(est - users) <= max(3, 0.05 * users), (etype, est, users)
        assert got[etype].n_day_sketches == days


def test_containment_finds_excerpt_jaccard_misses(spark, tmp_path):
    """A 4-token doc fully contained in a 40-token doc: containment must
    report it at 1.0 in the inner→outer direction while the symmetric
    Jaccard op (threshold 0.5) stays silent — the case the directional
    measure exists for. Brute-force verified on the whole corpus."""
    import random

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(300)]
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.sample(vocab, 12))))
    big = rng.sample(vocab, 40)
    docs.append((100, " ".join(big)))
    docs.append((101, " ".join(big[:4])))  # pure excerpt
    sf_dir = _write_docs(tmp_path, docs)

    cont = {
        (r.inner_doc, r.outer_doc): r.containment
        for r in TEXT_QUERIES["text_containment"](spark, sf_dir).collect()
    }
    jacc = {
        (r.doc_a, r.doc_b)
        for r in TEXT_QUERIES["text_doc_pairs_jaccard"](spark, sf_dir).collect()
    }
    assert cont[(101, 100)] == 1.0
    assert (100, 101) not in jacc and (101, 100) not in jacc

    # brute force both directions over candidate-eligible pairs
    tok = {i: set(t.split()) for i, t in docs}
    df: dict[str, int] = {}
    for ts in tok.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    cap = len(tok) * 0.06
    want = {}
    ids = sorted(tok)
    for a in ids:
        for b in ids:
            if a == b or not any(df[t] <= cap for t in tok[a] & tok[b]):
                continue
            c = len(tok[a] & tok[b]) / len(tok[a])
            if c >= 0.7:
                want[(a, b)] = c
    assert cont == want
    spark.catalog.clearCache()


def test_corpus_split_deterministic_proportions(spark, sf_dir_mid):
    """The hash split must assign every doc exactly once, reproduce
    identically across runs, and land within 2 points of 90/5/5."""
    q = TEXT_QUERIES["corpus_split"]
    a = {r.doc_id: r.split for r in q(spark, sf_dir_mid).collect()}
    b = {r.doc_id: r.split for r in q(spark, sf_dir_mid).collect()}
    assert a == b
    n = len(a)
    d = table(spark, sf_dir_mid, "documents")
    assert n == d.count()
    from collections import Counter

    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac.get("val", 0) - 0.05) < 0.02
    assert abs(frac.get("test", 0) - 0.05) < 0.02


def test_skew_profile_top10_is_distributed_topk(spark, sf_dir_mid):
    """The heavy-key ranking must be a TakeOrderedAndProject (distributed
    partial top-k) — a global unpartitioned row_number window over the
    full key frame would single-partition billions of keys."""
    df = REL2_QUERIES["skew_profile"](spark, sf_dir_mid)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert [r.rnk for r in rows] == list(range(1, 11))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    # stats columns are identical on every row (one broadcast stats row)
    assert len({(r.n_keys, r.n_rows, r.max_cnt) for r in rows}) == 1
    assert rows[0].cnt == rows[0].max_cnt


def test_pq_matches_python_reimplementation_and_recall(spark, sf_dir):
    """sim_search_pq pinned EXACTLY against a pure-Python PQ sharing the
    trained codebook (encode → ADC → top-k must agree pair-for-pair),
    plus a recall floor vs exact L2 — the quality the 64× compression
    buys must be real, not incidental."""
    from synthetic_data_transfer_to_relational_database_spark.operators.similarity import (
        _N_QUERIES,
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _TOP_K,
        QUERIES as SIM_QUERIES,
        pq_train,
    )

    e = table(spark, sf_dir, "embeddings")
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.select("vec_id", "embedding").collect()
    }
    codebook = pq_train(e)
    assert len(codebook) == _PQ_M and all(len(cb) == _PQ_K for cb in codebook)

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def encode(v):
        return [
            min(range(_PQ_K), key=lambda c: (sq(v[j * _PQ_D:(j + 1) * _PQ_D], codebook[j][c]), c))
            for j in range(_PQ_M)
        ]

    codes = {i: encode(v) for i, v in vecs.items()}
    want = {}
    for qid in range(_N_QUERIES):
        qv = vecs[qid]
        lut = [[sq(qv[j * _PQ_D:(j + 1) * _PQ_D], c) for c in codebook[j]] for j in range(_PQ_M)]
        scored = [
            (sum(lut[j][codes[i][j]] for j in range(_PQ_M)), i)
            for i in vecs
            if i != qid
        ]
        scored.sort()
        want[qid] = [(i, d) for d, i in scored[:_TOP_K]]

    got_rows = SIM_QUERIES["sim_search_pq"](spark, sf_dir).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.query_id, r.rn)):
        got.setdefault(r.query_id, []).append((r.vec_id, r.approx_dist))
    assert set(got) == set(want)
    for qid in want:
        assert [i for i, _ in got[qid]] == [i for i, _ in want[qid]], qid
        for (gi, gd), (wi, wd) in zip(got[qid], want[qid]):
            assert abs(gd - wd) < 1e-9

    # recall@5 vs exact L2: PQ must beat random by a wide margin
    hits = total = 0
    for qid in range(_N_QUERIES):
        qv = vecs[qid]
        exact = sorted((sq(qv, v), i) for i, v in vecs.items() if i != qid)
        exact_top = {i for _, i in exact[:_TOP_K]}
        hits += len(exact_top & {i for i, _ in got[qid]})
        total += _TOP_K
    assert hits / total >= 0.3, f"recall@{_TOP_K} = {hits/total:.2f}"


def test_pq_persisted_index_matches_inline_plan(spark, sf_dir, tmp_path):
    """build_pq_index → pq_search_indexed must reproduce sim_search_pq
    row-for-row: the persisted index (16-byte codes + 4 KB codebook
    JSON) is the same model, serving from parquet instead of re-deriving
    — and the index dataset must not contain embeddings at all."""
    from synthetic_data_transfer_to_relational_database_spark.operators.similarity import (
        _N_QUERIES,
        QUERIES as SIM_QUERIES,
        build_pq_index,
        pq_search_indexed,
    )

    e = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "pq_index")
    build_pq_index(e, path)
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"vec_id", "label", "codes"}

    queries = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    got = sorted(
        tuple(r) for r in pq_search_indexed(spark, path, queries).collect()
    )
    want = sorted(tuple(r) for r in SIM_QUERIES["sim_search_pq"](spark, sf_dir).collect())
    assert got == want


def test_ivfpq_matches_python_reimplementation(spark, sf_dir):
    """sim_search_ivfpq pinned exactly against a pure-Python IVF×PQ
    sharing both trained models: same cell assignment (argmax dot,
    first-index ties), same 2-cell probing, same ADC scoring, same
    top-k — proving the composition prunes, never corrupts."""
    from synthetic_data_transfer_to_relational_database_spark.operators.similarity import (
        _N_PROBE,
        _N_QUERIES,
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _TOP_K,
        QUERIES as SIM_QUERIES,
        _lloyd_refine,
        _seed_centroids,
        pq_train,
    )

    e = table(spark, sf_dir, "embeddings")
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.select("vec_id", "embedding").collect()
    }
    cvs = _lloyd_refine(e, _seed_centroids(e), iters=3)
    codebook = pq_train(e)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def cell_of(v):
        scores = [dot(v, c) for c in cvs]
        return max(range(len(cvs)), key=lambda i: (scores[i], -i))

    def encode(v):
        return [
            min(range(_PQ_K), key=lambda c: (sq(v[j * _PQ_D:(j + 1) * _PQ_D], codebook[j][c]), c))
            for j in range(_PQ_M)
        ]

    cells = {i: cell_of(v) for i, v in vecs.items()}
    codes = {i: encode(v) for i, v in vecs.items()}
    want = {}
    for qid in range(_N_QUERIES):
        qv = vecs[qid]
        scores = [dot(qv, c) for c in cvs]
        probed = set(sorted(range(len(cvs)), key=lambda ci: (-scores[ci], ci))[:_N_PROBE])
        lut = [[sq(qv[j * _PQ_D:(j + 1) * _PQ_D], c) for c in codebook[j]] for j in range(_PQ_M)]
        cand = [
            (sum(lut[j][codes[i][j]] for j in range(_PQ_M)), i)
            for i in vecs
            if i != qid and cells[i] in probed
        ]
        cand.sort()
        want[qid] = [i for _, i in cand[:_TOP_K]]

    got = {}
    for r in sorted(
        SIM_QUERIES["sim_search_ivfpq"](spark, sf_dir).collect(),
        key=lambda r: (r.query_id, r.rn),
    ):
        got.setdefault(r.query_id, []).append(r.vec_id)
    assert got == want


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """text_bpe_train pinned exactly against a pure-Python BPE reference
    (Sennrich-style): same word-frequency weighting, same argmax tie
    order (count desc, then lexicographic), same greedy left-to-right
    merge application — all 10 (left, right, merged, pair_freq) rows
    must agree."""
    import re
    from collections import Counter

    d = table(spark, sf_dir, "documents")
    freqs = Counter()
    for r in d.select("text").collect():
        t = (r.text or "").strip()
        if t:
            freqs.update(re.split(r"\s+", t))

    vocab = {tuple(list(w) + ["</w>"]): f for w, f in freqs.items()}
    want = []
    for _ in range(10):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        m = l + r
        want.append((l, r, m, cnt))
        new_vocab = Counter()
        for syms, f in vocab.items():
            out, prev = [], None
            for x in syms:
                if prev == l and x == r:
                    out[-1] = m
                    prev = m
                else:
                    out.append(x)
                    prev = x
            new_vocab[tuple(out)] += f
        vocab = new_vocab

    got = [
        (r.left, r.right, r.merged, r.pair_freq)
        for r in sorted(
            TEXT_QUERIES["text_bpe_train"](spark, sf_dir).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert got == want
    assert len(got) == 10
    assert all("</w>" not in m or m.endswith("</w>") for _, _, m, _ in got)


def test_rollup_hierarchy_scans_raw_once(spark, sf_dir_mid):
    """The cascade's load-bearing claim: day aggregates the CACHED hour
    level and month the cached day level, so the physical plan contains
    exactly ONE parquet scan of events — without the caches each union
    branch would re-derive from raw (three full scans at 100 TB)."""
    spark.catalog.clearCache()
    df = EVENTS_QUERIES["events_rollup_hierarchy"](spark, sf_dir_mid)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # every union branch's immediate input is a CACHE scan — the raw
    # parquet scan appears only inside the hour cache's build plan
    # (materialized once). Cached relations print their build plans
    # nested, so counting FileScans textually is unreliable; assert the
    # branch-level property directly.
    lines = plan.splitlines()
    # hour/day tags print as Projects; month's tag folds into its
    # aggregate's output attributes, so its marker is the last line
    # mentioning the resolution attribute. Each branch must reach an
    # InMemoryTableScan BEFORE any FileScan below it.
    markers = [
        next(i for i, ln in enumerate(lines) if "hour AS resolution" in ln),
        next(i for i, ln in enumerate(lines) if "day AS resolution" in ln),
        max(i for i, ln in enumerate(lines) if "resolution#" in ln),
    ]
    for idx in markers:
        for ln in lines[idx + 1 :]:
            if "InMemoryTableScan" in ln:
                break
            assert "FileScan" not in ln, (lines[idx], ln)
        else:
            raise AssertionError(f"branch at line {idx} reads no cache:\n{plan}")
    spark.catalog.clearCache()


def test_q6_pushdown_and_pruning(spark, sf_dir_mid):
    """lineitem_discount_revenue's whole point is the scan: shipdate/
    discount/quantity predicates must reach the parquet scan as
    PushedFilters and only the four needed columns may be read."""
    df = REL2_QUERIES["lineitem_discount_revenue"](spark, sf_dir_mid)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan.split("PushedFilters")[1], scan
    schema = scan.split("ReadSchema:")[1]
    read_cols = [c.split(":")[0] for c in schema.split("struct<")[1].split(",")]
    assert sorted(c.strip(" >") for c in read_cols) == [
        "l_discount", "l_extendedprice", "l_quantity", "l_shipdate",
    ], schema
