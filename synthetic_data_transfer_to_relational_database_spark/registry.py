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
# new/changed queries first, then oldest-evidence first. Round-12 window:
#   1) new/changed this round: sim_search_index (the persisted-index
#      build→serve loop, NEW, pairs with the sim_search oracle),
#      text_ngram_lm_score (corpus bigram-LM quality scorer, NEW), and
#      embedding_index_refresh (CHANGED — its argmin was rewritten to the
#      map-side array form; re-sweeping proves output identity under the
#      driver's hash).
#   2) 47 of the 50 keys whose newest driver evidence is r9 — the oldest
#      tier after r11 closed the r8 basket. Three r9-evidence keys spill
#      one round to make room for the new registrations (the same
#      documented trade as r7): scalar_null, pivot_wide, unpivot_long —
#      chosen because their operators are single-expression projections
#      untouched since r9 — and they lead the r13 window.
# Out-of-window change note (the r7 documentation rule):
# sim_search_ivf_lloyd (rows-only, r10 evidence) is touched by the r12
# _seed_centroids rank-based rewrite, but its output is PROVEN identical
# on the registered input — the rank seeds equal the old vec_id<8
# predicate seeds on contiguous ids (asserted element-for-element at
# sf0.01 before the change landed), and the recall-floor tests re-ran
# green. sim_search_ivfpq/sim_search_pq share that path and ARE in this
# window.
_SWEEP_FIRST = [
    # -- 1) new/changed this round (r12) -------------------------------
    "sim_search_index",
    "text_ngram_lm_score",
    "embedding_index_refresh",
    # -- 2) the r9-evidence tier (47 of 50 keys; spill documented above)
    "agg_approx_percentile",
    "agg_mode",
    "agg_sketch_union",
    "basket_pairs",
    "bracket_revenue",
    "corpus_diff",
    "corpus_dup_ngrams",
    "corpus_length_histogram",
    "corpus_quantile_filter",
    "corpus_split",
    "data_quality_profile",
    "dedup_cluster",
    "dedup_embedding",
    "dedup_semantic",
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
    "returned_item_report",
    "sample_hash",
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
    "top_supplier_revenue",
    "waiting_suppliers",
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
