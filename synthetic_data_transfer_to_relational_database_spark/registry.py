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
# new/changed queries first, then oldest-evidence first. Round-19 window
# (per the r18 verdict #8: freshness floor moves past r17):
#   1) keys whose RESULT-BEARING CODE changed this round (the r7
#      corollary — changed machinery leads even on fresh evidence):
#      text_doc_pairs_jaccard / text_containment (verification rewritten
#      to array_intersect over grouped token sets), vector_norms (local
#      folds unrolled), the persisted-index serves sim_search_index /
#      sim_search_warm / sim_search_balanced / embedding_index_refresh
#      (ride the _lit_build_path size dispatch AND the _unrolled_dot
#      delegation to similarity._dot_sql_cols), sim_search_ivf_lloyd /
#      sim_search_ivfpq (ride _ivf_serve/_lloyd_refine dispatch,
#      rows-only), and gen_synthetic_orders / fk_sample_join (ride the
#      generator's split()-literal array rendering). The dedup keys'
#      only r19 diff is a warn-on-misconfig branch — bookkeeping, not
#      result-bearing — so they queue by evidence age instead.
#   2) the 13 r15-evidence keys spilled r17→r18, owed first by
#      oldest-evidence-first: scan_project, filter_pred, window_rank,
#      window_ranks_pct, bracket_revenue, lineitem_discount_revenue,
#      lineitem_yoy_growth, top_supplier_revenue, waiting_suppliers,
#      returned_item_report, agg_approx_percentile, basket_pairs,
#      corpus_length_histogram.
#   3) 26 of the 43 remaining r17-window keys (two rounds stale),
#      leading with the families the r18 verdict named
#      (agg_approx_distinct, events, scalars, topk/pivot/unpivot,
#      sim_centroid_pandas, text_fingerprint). Seventeen spill one
#      round (the documented r7/r12…r18 trade): corpus_pack_sequences,
#      corpus_token_budget_scalable, customer_distribution,
#      join_broadcast, join_range, market_share, multimodal_bytes,
#      multimodal_features, nation_volume_shipping, orders_big_volume,
#      orders_late_priority, orders_shipping_priority, rag_retrieve,
#      revenue_by_nation, small_qty_revenue, stream_tumbling,
#      text_tfidf_top — the simplest deterministic scan / join / report
#      keys in the tier (plus the two bench-timed-every-round entries
#      revenue_by_nation / stream_tumbling whose rows the bench itself
#      exercises), untouched since their last green, each re-verified
#      strict-green locally via driver_sim this round (r19) before the
#      window landed.
_SWEEP_FIRST = [
    # -- 1) machinery changed this round ---------------------------------
    "text_doc_pairs_jaccard",
    "text_containment",
    "vector_norms",
    "sim_search_index",
    "sim_search_warm",
    "sim_search_balanced",
    "embedding_index_refresh",
    "sim_search_ivf_lloyd",
    "sim_search_ivfpq",
    "gen_synthetic_orders",
    "fk_sample_join",
    # -- 2) the owed r15-evidence spill (oldest tier) ---------------------
    "scan_project",
    "filter_pred",
    "window_rank",
    "window_ranks_pct",
    "bracket_revenue",
    "lineitem_discount_revenue",
    "lineitem_yoy_growth",
    "top_supplier_revenue",
    "waiting_suppliers",
    "returned_item_report",
    "agg_approx_percentile",
    "basket_pairs",
    "corpus_length_histogram",
    # -- 3) the r17-window tier (26 of 43; spill documented above) --------
    "agg_approx_distinct",
    "events_funnel",
    "events_session",
    "events_sliding",
    "events_tumbling",
    "scalar_date",
    "scalar_json",
    "scalar_math",
    "scalar_null",
    "scalar_string",
    "topk_per_group",
    "pivot_wide",
    "unpivot_long",
    "sim_centroid_pandas",
    "text_fingerprint",
    "agg_distinct",
    "agg_hash",
    "agg_rollup",
    "dedup_incremental",
    "dedup_key_norm",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_search",
    "sim_search_lsh",
    "window_frame",
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
