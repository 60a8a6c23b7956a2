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
# new/changed queries first, then oldest-evidence first. Round-10 window
# is the FINAL stale basket — after this sweep every key's newest driver
# evidence is ≥ r8, and the r11 window is entirely free. NO new oracle
# queries are registered in r10 (they would evict basket keys; see the
# r7 corollary in README "Catalog freshness"). The basket, oldest first:
#   1) the two RENAMED r2 lineages, per the r9 verdict's basket
#      definition: dedup_exact (née dedup_exact_digest) and
#      sim_search_ivf_lloyd (née sim_search_ivf). Both already carry r8
#      evidence under their current names (CORRECTNESS_r08), so these
#      two slots are a deliberate re-sweep that lets the README
#      legacy-key note retire the r2 rows as pure history — not a
#      staleness claim about the current names.
#   2) the three r5 rows-only spills flagged by the r9 rotation comment:
#      graph_pagerank, stream_jdbc_exactly_once, text_bpe_train (all
#      rows-only-by-design; the driver records the weaker row-count
#      check, semantics pinned by local Python-reference tests).
#   3) all 45 keys whose newest driver evidence is r6 — the agg cube/
#      grouping-sets/median/string pack, basket_rules, the corpus
#      mixture/resample/pipeline trio, relational classics (above_order
#      _avg, customer_idle_rich, lineitem pricing/priority, orders
#      volume/late/shipping, part promo share), dedup edit-distance/
#      keep-best/minhash, events_ab_test, graph_triangles, joins
#      (full-outer, salted), multimodal frame-sample, stratified
#      sampling, the scalar-function surfaces, sim centroids/classifier,
#      the streaming dedup/session/sliding/profile pack, the text
#      curation pack (lang_id … token_bpe), udf_surface,
#      user_erasure_audit, window_frame.
_SWEEP_FIRST = [
    # -- 1) renamed r2 lineages, first sweep under current names -------
    "dedup_exact",
    "sim_search_ivf_lloyd",
    # -- 2) r5 rows-only spills (oldest live evidence) -----------------
    "graph_pagerank",
    "stream_jdbc_exactly_once",
    "text_bpe_train",
    # -- 3) the full r6-evidence tier (45 keys) ------------------------
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
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "events_ab_test",
    "graph_triangles",
    "join_full_outer",
    "join_salted",
    "lineitem_pricing_summary",
    "lineitem_priority_mix",
    "multimodal_frame_sample",
    "orders_big_volume",
    "orders_late_priority",
    "orders_shipping_priority",
    "part_promo_revenue_share",
    "sample_stratified",
    "scalar_date",
    "scalar_math",
    "scalar_string",
    "sim_centroid_by_label",
    "sim_centroid_scalable",
    "sim_classifier_udf",
    "stream_dedup",
    "stream_session",
    "stream_sliding",
    "stream_user_profile",
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
