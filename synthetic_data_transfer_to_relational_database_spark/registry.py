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
# new/changed queries first, then oldest-evidence first. Round-14 window:
#   1) the r13 spill (the only keys at r10 evidence — the documented r13
#      trade): orders_shipping_priority, orders_late_priority,
#      orders_big_volume. They lead, per the r13 verdict.
#   2) 47 of the 49 keys whose newest driver evidence is r11 — the
#      oldest tier after r13 closed the r10 basket. Two r11-evidence
#      keys spill one round to r15 (same documented trade as r7/r12/r13):
#      scan_project, filter_pred — chosen because they are the two
#      simplest single-statement scan/filter queries in the tier,
#      untouched since they were registered, each re-verified
#      strict-green locally via driver_sim this round (r14) before the
#      window landed.
# No NEW oracle-paired keys register in r14: the window is over-full
# with owed evidence (52 candidates for 50 slots), and the r7 corollary
# says new keys must enter the window the round they register.
_SWEEP_FIRST = [
    # -- 1) the r13 spill (r10 evidence) --------------------------------
    "orders_shipping_priority",
    "orders_late_priority",
    "orders_big_volume",
    # -- 2) the r11-evidence tier (47 of 49 keys; spill documented above)
    "agg_approx_distinct",
    "agg_distinct",
    "agg_hash",
    "agg_rollup",
    "corpus_pack_sequences",
    "corpus_token_budget_scalable",
    "customer_distribution",
    "dedup_incremental",
    "dedup_key_norm",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "events_funnel",
    "events_session",
    "events_sliding",
    "events_tumbling",
    "fk_sample_join",
    "gen_synthetic_orders",
    "join_anti",
    "join_broadcast",
    "join_inner",
    "join_left",
    "join_range",
    "join_semi",
    "market_share",
    "multimodal_bytes",
    "multimodal_features",
    "nation_volume_shipping",
    "rag_retrieve",
    "revenue_by_nation",
    "scalar_array",
    "scalar_json",
    "set_except",
    "set_intersect",
    "set_union",
    "sim_centroid_pandas",
    "sim_search",
    "sim_search_lsh",
    "small_qty_revenue",
    "sort_limit",
    "stream_tumbling",
    "text_fingerprint",
    "text_tfidf_top",
    "topk_per_group",
    "vector_norms",
    "window_lag",
    "window_ntile",
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
