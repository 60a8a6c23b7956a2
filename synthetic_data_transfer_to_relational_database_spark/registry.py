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
# new/changed queries first, then oldest-evidence first. Round-15 window
# (54 candidates for 50 slots — the r14-verdict window math):
#   1) the r14 spill (the only keys at r11 evidence — the documented r14
#      trade): scan_project, filter_pred. They lead, per the r14 verdict.
#   2) the two keys newly REGISTERED this round (implemented + tested +
#      oracle-staged in r14): corpus_decontaminate, text_ngram_lm_backoff
#      — the r7 corollary puts new keys in the window the round they
#      register, and these were the only operators with zero driver
#      evidence.
#   3) 46 of the 50 keys whose newest driver evidence is r12 — the
#      oldest tier after r14 closed the r11 basket. The three keys whose
#      machinery changed in r14 (sim_search_index, text_ngram_lm_score,
#      embedding_index_refresh) lead this tier. Four r12-evidence keys
#      spill one round to r16 (same documented trade as r7/r12/r13/r14):
#      sample_hash, corpus_split, window_first_last, agg_mode — chosen
#      because they are the simplest deterministic-filter / single-
#      window / single-aggregation keys in the tier, untouched since
#      registration, each re-verified strict-green locally via
#      driver_sim this round (r15) before the window landed.
_SWEEP_FIRST = [
    # -- 1) the r14 spill (r11 evidence) --------------------------------
    "scan_project",
    "filter_pred",
    # -- 2) newly registered this round ---------------------------------
    "corpus_decontaminate",
    "text_ngram_lm_backoff",
    # -- 3) the r12-evidence tier (46 of 50 keys; spill documented above)
    "sim_search_index",
    "text_ngram_lm_score",
    "embedding_index_refresh",
    "agg_approx_percentile",
    "agg_sketch_union",
    "basket_pairs",
    "bracket_revenue",
    "corpus_diff",
    "corpus_dup_ngrams",
    "corpus_length_histogram",
    "corpus_quantile_filter",
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
