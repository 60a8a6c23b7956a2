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
# new/changed queries first, then oldest-evidence first. Round-17 window
# (61 candidates for 50 slots — the r16-verdict window math, 7 r13-spills
# + 50 r14-tier keys, PLUS the three keys riding this round's
# vector_index.py changes and one newly registered key):
#   1) sim_search_warm, newly REGISTERED this round (two successive
#      query batches through ONE VectorIndexServer handle, oracle-paired
#      with the brute-force KNN SQL — driver evidence that handle reuse
#      is exact), plus the three keys riding operators/vector_index.py,
#      which r17 changed (SQL-text rescore-tree builders replacing the
#      Column-API forms — bit-identity re-pinned; the VectorIndexServer
#      warm handle, with search_vector_index_df now delegating through
#      it; the lock-first forced-rescorer conf scope): sim_search_index,
#      embedding_index_refresh, sim_search_balanced. Changed machinery
#      leads the window even on fresh (r16) evidence — the r7 corollary.
#   2) the seven r13-evidence spills owed from the r16 trade:
#      scalar_math, scalar_string, scalar_date, scalar_null,
#      pivot_wide, unpivot_long, window_frame (each re-verified
#      strict-green via driver_sim in r16 by both builder and judge,
#      and again in r17 before this window landed).
#   3) 39 of the 50 keys whose newest driver evidence is r14 — the
#      oldest tier after r16 closed the r13 basket (bar the spills
#      above). Eleven r14-evidence keys spill one round to r18 (same
#      documented trade as r7/r12/r13/r14/r15/r16): set_union,
#      set_intersect, set_except, join_inner, join_left, join_semi,
#      join_anti, sort_limit, window_lag, window_ntile, scalar_array —
#      chosen because they are the simplest deterministic single-join /
#      set-op / single-window / scalar-function keys in the tier,
#      untouched since registration, each re-verified strict-green
#      locally via driver_sim this round (r17) before the window landed.
_SWEEP_FIRST = [
    # -- 1) newly registered + machinery changed this round (vector_index.py)
    "sim_search_warm",
    "sim_search_index",
    "embedding_index_refresh",
    "sim_search_balanced",
    # -- 2) the r16 spill (r13 evidence) ---------------------------------
    "scalar_math",
    "scalar_string",
    "scalar_date",
    "scalar_null",
    "pivot_wide",
    "unpivot_long",
    "window_frame",
    # -- 3) the r14-evidence tier (39 of 50 keys; spill documented above)
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
    "join_broadcast",
    "join_range",
    "market_share",
    "multimodal_bytes",
    "multimodal_features",
    "nation_volume_shipping",
    "orders_big_volume",
    "orders_late_priority",
    "orders_shipping_priority",
    "rag_retrieve",
    "revenue_by_nation",
    "scalar_json",
    "sim_centroid_pandas",
    "sim_search",
    "sim_search_lsh",
    "small_qty_revenue",
    "stream_tumbling",
    "text_fingerprint",
    "text_tfidf_top",
    "topk_per_group",
    "vector_norms",
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
