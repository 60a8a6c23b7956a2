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
# new/changed queries first, then oldest-evidence first. Round-18 window
# (per the r17 verdict #1: the 11 r14-spills lead, then r15-tier fill):
#   1) keys whose CODE changed this round: join_anti and set_except were
#      de-vacuized (r17 verdict #3 — both used to hash-match on EMPTY
#      results at sf0.01, so their oracle evidence was trivial; the new
#      predicates return 30 / 121 rows while keeping the left_anti /
#      subtract shapes), and the four vector_index-riding keys
#      (sim_search_warm, sim_search_index, embedding_index_refresh,
#      sim_search_balanced) ride this round's vector_index.py changes
#      (all four r17-ADVICE fixes: in-place rebuilds carry commit_epoch
#      forward — the ABA fence hole; the warm handle's cached tree is
#      built from the RESOLVED mode; 'auto' resolution threads the
#      handle's own session; the per-search fence reads only the epoch,
#      and the one-shot wrapper skips its first fence — plus the new
#      repin()). Changed machinery leads the window even on fresh
#      evidence — the r7 corollary.
#   2) the remaining nine r14-evidence spills owed from the r17 trade:
#      join_inner, join_left, join_semi, set_union, set_intersect,
#      sort_limit, window_lag, window_ntile, scalar_array (each
#      re-verified strict-green via driver_sim in r17 by both builder
#      and judge, and again in r18 before this window landed).
#   3) 35 of the 48 keys whose newest driver evidence is r15 — the
#      oldest tier once the r14 basket closes above. Thirteen
#      r15-evidence keys spill one round to r19 (same documented trade
#      as r7/r12…r17): scan_project, filter_pred, window_rank,
#      window_ranks_pct, bracket_revenue, lineitem_discount_revenue,
#      lineitem_yoy_growth, top_supplier_revenue, waiting_suppliers,
#      returned_item_report, agg_approx_percentile, basket_pairs,
#      corpus_length_histogram — chosen because they are the simplest
#      deterministic scan / filter / single-window / report keys in the
#      tier, untouched since their last green, each re-verified
#      strict-green locally via driver_sim this round (r18) before the
#      window landed.
_SWEEP_FIRST = [
    # -- 1) machinery changed this round ---------------------------------
    "join_anti",
    "set_except",
    "sim_search_warm",
    "sim_search_index",
    "embedding_index_refresh",
    "sim_search_balanced",
    # -- 2) the r17 spill (r14 evidence) ---------------------------------
    "join_inner",
    "join_left",
    "join_semi",
    "set_union",
    "set_intersect",
    "sort_limit",
    "window_lag",
    "window_ntile",
    "scalar_array",
    # -- 3) the r15-evidence tier (35 of 48 keys; spill documented above)
    "agg_sketch_union",
    "corpus_decontaminate",
    "corpus_diff",
    "corpus_dup_ngrams",
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
    "multimodal_dyn_batch",
    "multimodal_phash_dedup",
    "orders_cohort_ltv",
    "orders_rfm",
    "sim_knn_graph",
    "sim_search_ivfpq",
    "sim_search_pq",
    "skew_profile",
    "snapshot_merge_upsert",
    "stream_interval_join",
    "text_containment",
    "text_contamination",
    "text_doc_pairs_jaccard",
    "text_ngram_lm_backoff",
    "text_ngram_lm_score",
    "text_pii_scan",
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
