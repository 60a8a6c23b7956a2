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
# new/changed queries first, then oldest-evidence first. Round-7 window:
#   1) the four queries NEW this round — the remaining classic TPC-H
#      shapes feasible on this schema: nation_volume_shipping (Q7),
#      market_share (Q8), customer_distribution (Q13, the left-join
#      zero-order histogram), small_qty_revenue (Q17, decorrelated
#      per-part threshold) — operators/relational3.py.
#   2) the three queries whose implementation (or code under it)
#      CHANGED this round: window_ntile (now rides the scalable-rank
#      dispatch — the r6 verdict's low-cardinality-window item),
#      fk_sample_join and gen_synthetic_orders (the executor's
#      _array_literal string rendering changed: quote doubling +
#      backslash fallback). sim_search_lsh also changed (multi-table
#      amplification, recall 0.04 -> 0.90) but is already in tier 3.
#   3) the 43 keys whose newest driver evidence is r4 (the r6 verdict's
#      rotation ask — core joins/aggs/sets, events windows/funnel,
#      scan/filter/sort, the ANN serve family, multimodal bytes/
#      features, corpus packing, stream_tumbling, revenue_by_nation,
#      text_fingerprint/tfidf, topk/window_lag). After this sweep no
#      key's newest evidence is older than r5 and the r1..r7 union
#      stays complete.
# Not rotated in despite an r7 code touch: dedup_cluster/_semantic/
# _embedding sit on connected_components, which gained an empty-edge
# fast path late in r7. The change is output-identical (unit-locked,
# incl. the new empty/self-loop test) and all three were re-verified
# strict-green locally post-change (tools/driver_sim full-catalog run,
# 126/126); evicting three r4-evidence keys for them would leave those
# keys permanently stale instead.
_SWEEP_FIRST = [
    # -- 1) new in r7 -------------------------------------------------
    "nation_volume_shipping",
    "market_share",
    "customer_distribution",
    "small_qty_revenue",
    # -- 2) changed in r7 ---------------------------------------------
    "window_ntile",
    "fk_sample_join",
    "gen_synthetic_orders",
    # -- 3) oldest evidence (r4), refresh -----------------------------
    "agg_approx_distinct",
    "agg_distinct",
    "agg_hash",
    "agg_rollup",
    "corpus_pack_sequences",
    "corpus_token_budget_scalable",
    "dedup_exact",
    "dedup_key_norm",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "events_funnel",
    "events_session",
    "events_sliding",
    "events_tumbling",
    "filter_pred",
    "join_anti",
    "join_broadcast",
    "join_inner",
    "join_left",
    "join_range",
    "join_semi",
    "multimodal_bytes",
    "multimodal_features",
    "rag_retrieve",
    "revenue_by_nation",
    "scalar_array",
    "scalar_json",
    "scan_project",
    "set_except",
    "set_intersect",
    "set_union",
    "sim_centroid_pandas",
    "sim_search",
    "sim_search_ivf_lloyd",
    "sim_search_lsh",
    "sort_limit",
    "stream_tumbling",
    "text_fingerprint",
    "text_tfidf_top",
    "topk_per_group",
    "vector_norms",
    "window_lag",
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
