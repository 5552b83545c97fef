"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (Q1 shape) on sf0.001, smoke-checked.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data tier); each takes (spark, sf_dir).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query. Omitted only for
                ops that are engine-specific by nature (xxhash64-based
                LSH/winnowing candidates, HLL / KLL sketch estimates)
                → rows-only check.

The real inventory lives in tada_spark/queries.py (CATALOG).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tada_spark.queries import CATALOG, q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


#: The driver verifies the FIRST 50 queries() entries per round; the
#: catalog has more. Rolling-freshness goal: every oracle-able catalog
#: entry green in the union of the last three driver rounds. r06 order:
#: (a) the 16 entries whose newest green is r03 — they expire from the
#: rolling r04∪r05∪r06 union unless re-earned THIS round; (b) the 29
#: round-5 additions deliberately deferred from the full r05 window
#: (each already local-gate green at sf0.001/0.01/0.1 and hash-stable
#: at local[5]) — their FIRST driver rows; (c) the round-6 additions.
#: Everything else is green in r04∪r05 and stays union-covered through
#: r07; the r04-latest cohort (the 50 entries re-earned in r04) are the
#: r07 leads, together with the six round-6 entries added after this
#: window filled (kl_divergence_sources, stream_static_enrich,
#: ab_chi2_events, corr_value_hour_events, ols_trend_priority,
#: image_resize_real — each
#: local-gate green at sf0.001/0.01/0.1 and hash-stable at local[5]).
#:
#: Capacity note: the catalog (155 oracle-able entries) now exceeds the
#: 3-round union capacity (3 × 50 = 150), so a small tail (~5 entries)
#: necessarily rotates on a FOUR-round cycle. Policy: oldest-green
#: first (LRU), new entries earn their first row the round after they
#: land, and every round runs the FULL local gate at HEAD at all three
#: scales (recorded in the closing-validation commits) — so each entry
#: is either driver-green within 3 rounds or full-gate-green at HEAD
#: the same round, always both within 4.
_DRIVER_PRIORITY = [
    # (a) newest green is r03 — re-earn now or fall out of the union
    "filter_compound",
    "filter_by_value_canon",
    "where_price_tier",
    "ordered_range_rows",
    "ffill_user_value",
    "sessionize_events",
    "moving_avg_trailing",
    "debounce_events",
    "pivot_multi_agg_flag",
    "top2_orders_per_customer",
    "quantiles_price_by_status",
    "winsorize_value_per_user",
    "ntile_quartile_customers",
    "embedding_centroids",
    "pii_scrub_docs",
    "multimodal_audio_features",
    # (b) round-5 additions earning their first driver row
    "inverted_index_terms",
    "bm25_search_docs",
    "sq8_ann_topk",
    "remove_duplicate_spans_docs",
    "curation_report_langs",
    "source_overlap_matrix",
    "validate_expectations_orders",
    "temperature_resample_docs",
    "stream_trending_types",
    "snapshot_diff_docs",
    "dedup_threshold_sweep_docs",
    "bpe_merge_docs",
    "embedding_outliers_labels",
    "jsonl_pipeline_golden",
    "funnel_conversion_events",
    "cohort_retention_events",
    "dense_resample_events",
    "cdc_merge_orders",
    "event_transition_matrix",
    "scd2_history_orders",
    "zorder_layout_orders",
    "daily_ingest_pipeline",
    "fuzzy_join_names",
    "robust_outliers_events",
    "stream_dedup_watermarked",
    "assoc_rules_events",
    "time_grouping_sets_events",
    "incremental_agg_update",
    "near_dup_triangles",
    # (c) round-6 additions (no driver row yet), plus tfidf_top_terms:
    # its idf migrated to det_ln THIS round (new output hash), so it
    # re-earns driver evidence for the new semantics immediately rather
    # than resting on its r05 row; ols_trend_priority joins its stats
    # siblings (corr/chi2) in the r07 leads with local-gate evidence
    "bloom_prefilter_join",
    "weighted_sample_docs",
    "token_entropy_by_source",
    "pagerank_near_dup",
    "tfidf_top_terms",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = _DRIVER_PRIORITY + [n for n in CATALOG if n not in _DRIVER_PRIORITY]
    return {name: CATALOG[name][0] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
