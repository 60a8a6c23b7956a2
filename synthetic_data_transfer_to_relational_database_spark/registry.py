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
# new/changed queries first, then oldest-evidence first. Round-13 window:
#   1) the r12 spill (the only keys at r9 evidence — the documented r12
#      trade): scalar_null, pivot_wide, unpivot_long. They lead, per the
#      r12 verdict.
#   2) 47 of the 50 keys whose newest driver evidence is r10 — the
#      oldest tier after r12 closed the r9 basket. Three r10-evidence
#      keys spill one round to r14 (same documented trade as r7/r12):
#      orders_shipping_priority, orders_big_volume, orders_late_priority
#      — chosen because they are single-statement TPC-H-style
#      filter+agg queries over orders/lineitem, untouched since they
#      were registered, each re-verified strict-green locally via
#      driver_sim this round (r13) before the window landed.
# No NEW oracle-paired keys register in r13: the window is over-full
# with owed evidence (53 candidates for 50 slots), and the r7 corollary
# says new keys must enter the window the round they register.
# Out-of-window change notes (the r7 documentation rule) — r13 touched
# three r12-evidence keys, each re-verified strict hash-green locally
# via driver_sim after the change:
#   sim_search_index — reuses one per-process index scratch dir instead
#     of a fresh mkdtemp per invocation (r12 advice), and rides the
#     vector_index build-path write sharding; serve math untouched.
#   text_ngram_lm_score — the exploded bigram frame is cache()d so its
#     three consumers share one tokenize pass (r12 advice); plan values
#     and the shuffle_hash hints unchanged (plan test re-ran green).
#   embedding_index_refresh — untouched code, re-swept alongside the
#     two above as shared-machinery assurance.
_SWEEP_FIRST = [
    # -- 1) the r12 spill (r9 evidence) ---------------------------------
    "scalar_null",
    "pivot_wide",
    "unpivot_long",
    # -- 2) the r10-evidence tier (47 of 50 keys; spill documented above)
    "above_order_avg",
    "agg_cube",
    "agg_gsets",
    "agg_median",
    "agg_string",
    "basket_rules",
    "corpus_curation_pipeline",
    "corpus_mixture",
    "corpus_quality_resample",
    "customer_idle_rich",
    "dedup_edit_distance",
    "dedup_exact",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "events_ab_test",
    "graph_pagerank",
    "graph_triangles",
    "join_full_outer",
    "join_salted",
    "lineitem_pricing_summary",
    "lineitem_priority_mix",
    "multimodal_frame_sample",
    "part_promo_revenue_share",
    "sample_stratified",
    "scalar_date",
    "scalar_math",
    "scalar_string",
    "sim_centroid_by_label",
    "sim_centroid_scalable",
    "sim_classifier_udf",
    "sim_search_ivf_lloyd",
    "stream_dedup",
    "stream_jdbc_exactly_once",
    "stream_session",
    "stream_sliding",
    "stream_user_profile",
    "text_bpe_train",
    "text_lang_id",
    "text_oov_rate",
    "text_quality",
    "text_repetition",
    "text_stats",
    "text_term_freq",
    "text_token_bpe",
    "udf_surface",
    "user_erasure_audit",
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
