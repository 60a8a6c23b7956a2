"""Aggregates every operator module's QUERIES/ORACLE dicts for the driver
contract (__spark_entry__.py). Import side-effect free; modules register
via the decorator in operators/_registry.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    dedup,
    events,
    generator_ops,
    multimodal,
    relational,
    relational2,
    relational3,
    scalars,
    similarity,
    streaming_ops,
    text,
)

_MODULES = [
    relational,
    dedup,
    similarity,
    multimodal,
    generator_ops,
    streaming_ops,
    relational2,
    relational3,
    scalars,
    events,
    text,
]

# Registration order is also the driver's sweep order, and the driver's
# per-round budget stops at 50 queries. The catalog is larger, so the
# window is rotated each round to keep the UNION of CORRECTNESS_r* rows
# complete. Rotation rule (documented in README "Catalog freshness"):
# new/changed queries first, then oldest-evidence first. Round-9 window
# (the r8 round shipped no rotation, so the r5-evidence basket is the
# oldest live tier):
#   1) the four queries NEW this round — the last classic TPC-H shapes
#      feasible on this schema (no partsupp table, so Q2/Q9/Q11/Q16/Q20
#      are permanently out of reach): returned_item_report (Q10),
#      top_supplier_revenue (Q15, tie-safe max-over-aggregate),
#      bracket_revenue (Q19, OR-of-ANDs pushdown), waiting_suppliers
#      (Q21, LeftSemi + LeftAnti) — operators/relational3.py.
#   2) the three queries whose shared substrate (connected_components'
#      empty-edge fast path) changed in r7 but could not be rotated in
#      that round because the window was full of r4-evidence keys:
#      dedup_cluster, dedup_semantic, dedup_embedding.
#   3) 43 of the 47 keys whose newest driver evidence is r5 — the agg
#      scalars/sketches, basket_pairs, the corpus curation pack, the
#      events analytics pack, join_asof, lineitem revenue/growth,
#      multimodal dyn_batch/phash, orders cohort/rfm, pivot/unpivot,
#      sampling, sim_knn_graph/pq/ivfpq, skew_profile, snapshot merge,
#      stream interval-join, the text safety pack, window frames/ranks.
# Spilled to the r10 window for lack of slots (3 of the 47 r5-evidence
# keys — all rows-only-by-design entries whose driver check is the
# weaker row-count form and whose semantics are pinned by local
# Python-reference/invariant tests): graph_pagerank,
# stream_jdbc_exactly_once, text_bpe_train. They are the
# oldest-evidence priority for the next rotation.
_SWEEP_FIRST = [
    # -- 1) new in r9 (TPC-H Q10/Q15/Q19/Q21 shapes) -------------------
    "returned_item_report",
    "top_supplier_revenue",
    "bracket_revenue",
    "waiting_suppliers",
    # -- 2) substrate changed in r7 (connected_components fast path) ---
    "dedup_cluster",
    "dedup_semantic",
    "dedup_embedding",
    # -- 3) oldest evidence (r5), refresh ------------------------------
    "agg_approx_percentile",
    "agg_mode",
    "agg_sketch_union",
    "basket_pairs",
    "corpus_diff",
    "corpus_dup_ngrams",
    "corpus_length_histogram",
    "corpus_quantile_filter",
    "corpus_split",
    "data_quality_profile",
    "events_anomaly_mad",
    "events_attribution",
    "events_forecast_baseline",
    "events_gap_islands",
    "events_gapfill",
    "events_retention_cohorts",
    "events_rolling_active",
    "events_rollup_hierarchy",
    "events_user_paths",
    "join_asof",
    "lineitem_discount_revenue",
    "lineitem_yoy_growth",
    "multimodal_dyn_batch",
    "multimodal_phash_dedup",
    "orders_cohort_ltv",
    "orders_rfm",
    "pivot_wide",
    "sample_hash",
    "scalar_null",
    "sim_knn_graph",
    "sim_search_ivfpq",
    "sim_search_pq",
    "skew_profile",
    "snapshot_merge_upsert",
    "stream_interval_join",
    "text_containment",
    "text_contamination",
    "text_doc_pairs_jaccard",
    "text_pii_scan",
    "unpivot_long",
    "window_first_last",
    "window_rank",
    "window_ranks_pct",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    missing = [n for n in _SWEEP_FIRST if n not in merged]
    if missing:
        raise ValueError(f"sweep window names not registered: {missing}")
    if len(set(_SWEEP_FIRST)) != len(_SWEEP_FIRST):
        raise ValueError("duplicate names in sweep window")
    rest = [n for n in merged if n not in set(_SWEEP_FIRST)]
    return {n: merged[n] for n in [*_SWEEP_FIRST, *rest]}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
