"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + extensions),
keyed by name; each callable is ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twin for each query (omitted
only for genuinely non-SQL-expressible ops, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from amazon_climate_data_etl_spark.operators import (
    climate,
    curation,
    dedup,
    events,
    joins,
    relational,
    similarity,
    textops,
)
from amazon_climate_data_etl_spark.operators._portable import portable_sql_rounds
from amazon_climate_data_etl_spark.sources import multimodal

_MODULES = (
    dedup,
    similarity,
    events,
    multimodal,
    curation,
    textops,
    climate,
    joins,
    relational,
)

# Registry order is load-bearing: the driver's correctness gate checks the
# FIRST 50 registered queries. _PRIORITY front-loads (a) every query that has
# never been through the driver's hash gate — the dedup/similarity/events/
# multimodal families plus the queries added after the round-2 snapshot —
# then (b) the climate + joins families (reference-parity core), then (c) a
# representative relational slice. Families with two rounds of green driver
# history (most of relational, the older textops entries) absorb the tail
# cut; all of them remain covered by the local DuckDB-parity suite.
_PRIORITY = (
    # never driver-checked: dedup
    "exact_dedup", "dedup_components", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash_fingerprints", "simhash_near_pairs",
    # never driver-checked: similarity
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_label_stats", "embedding_cosine_neardup",
    "semantic_lexical_neardup",
    # never driver-checked: events
    "tumbling_hourly", "sliding_windows", "session_windows",
    "event_dedup_first", "json_props_stats", "asof_join_purchases",
    "pivot_daily_activity", "user_funnel_conversion",
    # never driver-checked: multimodal (rows-only)
    "media_feature_summary", "media_frame_pipeline",
    # new this round: curation + quality/vocab/clustering/retention
    "contamination_overlap", "pack_sequences", "stratified_sample_stats",
    "source_mixture_plan", "source_domain_divergence",
    "unigram_logprob_quality", "vocab_coverage", "kmeans_cluster_profile",
    "user_retention_cohorts", "bm25_search", "source_quota_cap",
    "neardup_keep_corpus", "q6_forecast_revenue", "q14_promo_revenue",
    "q10_returned_items", "bigram_logprob_quality", "corpus_filter_funnel",
    "ann_recall_eval", "table_quality_audit",
    # never driver-checked: round-2-tail textops/joins additions
    "doc_repetition_scores", "tfidf_top_terms", "doc_fingerprints",
    "range_band_join",
    # reference-parity core with green history: climate + joins (the
    # twice-green tail — spot check, enrich chain, semi/anti, q3/q5 —
    # absorbs the cut for the never-checked queries above, per the
    # round-2 review's guidance; all remain in the local parity suite)
    "climate_annual",
    "grid_snap_join", "nn_join_sorted_1d",
    "salted_skew_join",
    # relational representative (flagship)
    "q1_pricing_summary",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary — scan → pushed filter → 2-phase hash agg → sort (the
    reference's annual-pipeline spine, SURVEY.md §3)."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _ordered(merged: dict) -> dict:
    """Priority names first (driver gate window), then the rest in module
    order. Names absent from ``merged`` are skipped (the oracle map lacks
    the rows-only queries)."""
    out = {n: merged[n] for n in _PRIORITY if n in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    return _ordered(merged)


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        # rewrite round(x, n) into the decimal-stable form so the DuckDB
        # oracle rounds bit-identically to the Spark side (_portable.py)
        merged.update({k: portable_sql_rounds(v) for k, v in mod.ORACLE.items()})
    return _ordered({k: v for k, v in merged.items()})
