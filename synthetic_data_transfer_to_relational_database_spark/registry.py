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
    scalars,
    events,
    text,
]

# Registration order is also the driver's sweep order, and the driver's
# per-round budget stops at 50 queries. The catalog is larger, so the
# window is rotated each round to keep the UNION of CORRECTNESS_r* rows
# complete. Window contents (this order):
#   1) every query with NO driver evidence yet — the 23 entries added in
#      late r2 / r3 (streaming incl. the stream-stream interval join,
#      corpus curation, PII/TF-IDF/contamination, salted join, stratified
#      sample, dynamic batching, frame sampling, generator demo, approx
#      percentile, scalable centroid, sequence packing, repetition
#      signals, snapshot diff, conversion funnel);
#   2) the 18 queries whose only green row is from round 1 (the r2 window
#      rotation left them out);
#   3) 9 r2-green sentinels: every query whose implementation or oracle
#      changed this round (dedup_cluster, dedup_embedding, fk_sample_join
#      via the executor, sim_centroid_by_label as the new twin's exact
#      pair, window_rank's cost-based dispatch, sim_classifier_udf's
#      float64-cast oracle) plus flagship regression guards. entry()
#      smoke-runs revenue_by_nation every round regardless, so it cedes
#      its window slot.
# Everything past position 50 is r1∪r2-green and unchanged this round.
# All 77 oracle-paired queries are locally strict-green via
# tools/driver_sim.py regardless of window position.
_SWEEP_FIRST = [
    # -- 1) no driver evidence yet ------------------------------------
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_user_profile",
    "stream_interval_join",
    "corpus_mixture",
    "corpus_token_budget_scalable",
    "corpus_curation_pipeline",
    "text_tfidf_top",
    "text_contamination",
    "text_pii_scan",
    "sample_stratified",
    "join_salted",
    "multimodal_dyn_batch",
    "multimodal_frame_sample",
    "gen_synthetic_orders",
    "agg_approx_percentile",
    "sim_centroid_scalable",
    "corpus_pack_sequences",
    "text_repetition",
    "corpus_diff",
    "events_funnel",
    # -- 2) green in round 1 only -------------------------------------
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "scalar_json",
    "text_stats",
    "udf_surface",
    "join_asof",
    "join_full_outer",
    "agg_string",
    "pivot_wide",
    "sample_hash",
    "window_ranks_pct",
    "agg_median",
    "events_gap_islands",
    "text_term_freq",
    "text_lang_id",
    "text_quality",
    "text_token_bpe",
    # -- 3) r2-green sentinels (changed code + flagship guards) -------
    "dedup_cluster",
    "dedup_embedding",
    "sim_centroid_by_label",
    "fk_sample_join",
    "sim_classifier_udf",
    "window_frame",
    "events_session",
    "dedup_minhash_lsh",
    "window_rank",
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
