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
# new/changed queries first, then oldest-evidence first. Round-6 window:
#   1) the twelve queries NEW this round: the TPC-H-shaped
#      decision-support pack (lineitem_pricing_summary Q1,
#      orders_shipping_priority Q3, orders_late_priority Q4,
#      lineitem_priority_mix Q12, part_promo_revenue_share Q14,
#      orders_big_volume Q18, customer_idle_rich Q22 —
#      operators/relational3.py), window_ntile (quartile assignment),
#      dedup_keep_best (keep-longest survivor policy),
#      dedup_edit_distance (bucket-confined Levenshtein verify),
#      text_oov_rate (top-1000-vocab OOV quality signal),
#      corpus_quality_resample (tiered content-stable downsampling).
#   2) the four queries whose implementation CHANGED this round:
#      graph_triangles (edge-frame cache restored in
#      oriented_triangles), user_erasure_audit (erasure_audit refactor +
#      cohortMod conf), events_ab_test (assignment salt conf),
#      fk_sample_join (the generator's literal-memo / single-parse
#      parent-key array rewrite runs under it).
#   3) basket_rules — registered in r5 after the window froze; the ONLY
#      key with zero external CORRECTNESS rows (r5 verdict ran it green
#      via driver_sim; this supplies the missing driver row).
#   4) the 30 keys whose newest driver evidence is r3 (the r5 verdict's
#      rotation ask): scalar_string/date/math, text_stats,
#      text_term_freq/lang_id/quality/token_bpe/repetition,
#      corpus_mixture/curation_pipeline, udf_surface,
#      stream_sliding/_session/_user_profile/_dedup,
#      dedup_minhash_lsh/_embedding/_cluster, join_salted,
#      join_full_outer, window_frame, agg_string/median,
#      sample_stratified, multimodal_frame_sample, gen_synthetic_orders,
#      sim_centroid_by_label/_scalable, sim_classifier_udf. After this
#      sweep every registered key's newest evidence is r4 or later and
#      the r1∪…∪r6 union covers the whole catalog.
#   5) three r4-evidence keys fill the remaining slots (oldest-first
#      tier): above_order_avg, agg_cube, agg_gsets. The other r4 keys
#      (all green, code unchanged since their sweep) rotate through r7.
_SWEEP_FIRST = [
    # -- 1) new in r6 -------------------------------------------------
    "lineitem_pricing_summary",
    "orders_shipping_priority",
    "orders_late_priority",
    "lineitem_priority_mix",
    "part_promo_revenue_share",
    "orders_big_volume",
    "customer_idle_rich",
    "window_ntile",
    "dedup_keep_best",
    "dedup_edit_distance",
    "text_oov_rate",
    "corpus_quality_resample",
    # -- 2) changed in r6 ---------------------------------------------
    "graph_triangles",
    "user_erasure_audit",
    "events_ab_test",
    "fk_sample_join",
    # -- 3) never externally swept ------------------------------------
    "basket_rules",
    # -- 4) oldest evidence (r3), refresh -----------------------------
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "text_stats",
    "text_term_freq",
    "text_lang_id",
    "text_quality",
    "text_token_bpe",
    "text_repetition",
    "corpus_mixture",
    "corpus_curation_pipeline",
    "udf_surface",
    "stream_sliding",
    "stream_session",
    "stream_user_profile",
    "stream_dedup",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "dedup_cluster",
    "join_salted",
    "join_full_outer",
    "window_frame",
    "agg_string",
    "agg_median",
    "sample_stratified",
    "multimodal_frame_sample",
    "gen_synthetic_orders",
    "sim_centroid_by_label",
    "sim_centroid_scalable",
    "sim_classifier_udf",
    # -- 5) oldest r4 keys, refresh -----------------------------------
    "above_order_avg",
    "agg_cube",
    "agg_gsets",
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
