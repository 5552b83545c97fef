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
#: entry green in the union of the last three driver rounds. r05 order
#: (r4 verdict ask #1): (a) the 17 entries whose newest green is r02 —
#: they expire from the rolling r03∪r04∪r05 union unless re-earned THIS
#: round; (b) the four brand-new round-5 entries (bounded-error sketch
#: checks, real end-to-end WAV decode, bucketed co-located join) with no
#: driver row yet; (c) 23 of the 38 r03-latest entries, prioritizing the
#: verdict-named cohort (the stream_* rows, near_dup_components,
#: decontamination_check, tfidf_top_terms, q4/q14/q18, cast/resample/
#: rolling family) — they'd expire after r06 otherwise; plus the six
#: round-5 LLM-pipeline ops. The 15 deferred r03 entries
#: (filter_compound, filter_by_value_canon, where_price_tier,
#: ordered_range_rows, ffill_user_value, sessionize_events,
#: moving_avg_trailing, debounce_events, pivot_multi_agg_flag,
#: top2_orders_per_customer, quantiles_price_by_status,
#: winsorize_value_per_user, ntile_quartile_customers,
#: embedding_centroids, pii_scrub_docs) stay union-covered through r06
#: and MUST lead the r06 window — 16 entries now that
#: multimodal_audio_features also rotated out (its audio pipeline gets
#: fresher driver evidence through wav_decode_real's REAL-decoder run) —
#: alongside remove_duplicate_spans_docs, curation_report_langs, the
#: retrieval tier (inverted_index_terms, bm25_search_docs, sq8_ann_topk)
#: and the curation/ops tier (source_overlap_matrix,
#: validate_expectations_orders, temperature_resample_docs,
#: stream_trending_types, snapshot_diff_docs, dedup_threshold_sweep_docs,
#: bpe_merge_docs, embedding_outliers_labels, jsonl_pipeline_golden,
#: funnel_conversion_events, cohort_retention_events,
#: dense_resample_events, cdc_merge_orders, event_transition_matrix,
#: scd2_history_orders, zorder_layout_orders, daily_ingest_pipeline,
#: fuzzy_join_names, robust_outliers_events, stream_dedup_watermarked,
#: assoc_rules_events, time_grouping_sets_events, incremental_agg_update,
#: near_dup_triangles) — the round-5 entries deliberately deferred to
#: r06 (added after the window filled; each local-gate green at
#: sf0.001, sf0.01 and sf0.1, and hash-stable at local[5]).
_DRIVER_PRIORITY = [
    # (a) newest green is r02 — re-earn now or fall out of the union
    "value_counts_priority",
    "merge_dedupe_names",
    "semi_anti_partition",
    "intersect_except_orders",
    "agg_frame_and_columns",
    "align_having_users",
    "first_last_nth_per_order",
    "rank_percentile_customers",
    "bin_pbin_orders",
    "combine_series_ratio",
    "set_rows_patch",
    "text_stats_quality",
    "ann_topk_exact_ivf",
    "embed_near_dup_pairs",
    "sample_splits_docs",
    "multimodal_image_features",
    "video_frame_sample",
    # (b) brand-new round-5 entries — no driver row yet
    "approx_distinct_checked",
    "approx_quantiles_checked",
    "wav_decode_real",
    "bucketed_join_orders_customer",
    # (c) r03-latest cohort re-earning before their r06 expiry
    "q4_order_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "asof_last_purchase",
    "range_join_purchase_clicks",
    "shift_cumsum_events",
    "resample_calendar_revenue",
    "resample_15min_events",
    "rolling_n_duration_events",
    "cast_multiformat_dates",
    "near_dup_components",
    "decontamination_check",
    "tfidf_top_terms",
    "gopher_quality_filters",
    "corpus_prep_pipeline",
    # (b2) round-5 LLM-pipeline additions (displace six unnamed-cohort
    # r03 entries — top2_orders_per_customer, quantiles_price_by_status,
    # winsorize_value_per_user, ntile_quartile_customers,
    # embedding_centroids, pii_scrub_docs — which stay union-covered
    # through r06 and join the r06 leads)
    "duplicate_span_stats_docs",
    "chunk_windows_docs",
    "key_skew_profile_events",
    "domain_mix_weights_langs",
    "incremental_dedup_delta",
    "domain_cap_docs",
    "png_decode_real",
    "stream_hourly_totals",
    "stream_running_totals_users",
    "stream_session_stats_users",
    "stream_sliding_hourly",
    "stream_session_windows",
    "stream_dedup_fingerprints",
    "stream_interval_join_purchases",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = _DRIVER_PRIORITY + [n for n in CATALOG if n not in _DRIVER_PRIORITY]
    return {name: CATALOG[name][0] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
