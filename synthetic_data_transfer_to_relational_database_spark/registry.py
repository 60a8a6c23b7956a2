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
# new/changed queries first, then oldest-evidence first. Round-16 window
# (57 candidates for 50 slots — the r15-verdict window math plus the two
# keys whose machinery changed this round and one newly registered key):
#   1) sim_search_balanced, newly REGISTERED this round (the wide-dim
#      balanced-rescorer serve — rows-only by the summation-order rule,
#      invariant-pinned in tests/test_vector_index.py), plus the two
#      keys riding operators/vector_index.py, which r16 changed
#      (commit_epoch ABA-fence term, guarded mismatch release, locked
#      eager-serve conf scope, the balanced rescorer itself):
#      sim_search_index, embedding_index_refresh. New/changed machinery
#      leads the window even on fresh (r15) evidence — the r7
#      corollary.
#   2) the four r12-evidence spills owed from the r15 trade:
#      sample_hash, corpus_split, window_first_last, agg_mode (each
#      pre-verified strict-green twice in r15, builder + judge, and
#      again via driver_sim in r16 before this window landed).
#   3) 43 of the 50 keys whose newest driver evidence is r13 — the
#      oldest tier after r15 closed the r12 basket (bar the spills
#      above). Seven r13-evidence keys spill one round to r17 (same
#      documented trade as r7/r12/r13/r14/r15): scalar_math,
#      scalar_string, scalar_date, scalar_null, pivot_wide,
#      unpivot_long, window_frame — chosen because they are the
#      simplest deterministic scalar-function / single-reshape /
#      single-window keys in the tier, untouched since registration,
#      each re-verified strict-green locally via driver_sim this round
#      (r16) before the window landed (and all 136 oracle-paired keys
#      swept strict-green this round regardless).
_SWEEP_FIRST = [
    # -- 1) newly registered + machinery changed this round -------------
    "sim_search_balanced",
    "sim_search_index",
    "embedding_index_refresh",
    # -- 2) the r15 spill (r12 evidence) ---------------------------------
    "sample_hash",
    "corpus_split",
    "window_first_last",
    "agg_mode",
    # -- 3) the r13-evidence tier (43 of 50 keys; spill documented above)
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
