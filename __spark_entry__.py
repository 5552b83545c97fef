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
#: catalog has more. Order so every entry earns a hard driver row across
#: rounds: (a) entries with no green driver row in r01∪r02 yet, (b) the
#: three r02-red queries fixed this round, (c) queries whose code paths
#: the timestamp-family rework touched, (d) the rest in catalog order
#: (all double-verified in earlier rounds).
_DRIVER_PRIORITY = [
    # (a) never driver-verified
    "moving_avg_trailing",
    "top2_orders_per_customer",
    "multimodal_audio_features",
    "approx_distinct_suppliers",
    "bpe_token_budget",
    "quantiles_price_by_status",
    "debounce_events",
    "embedding_centroids",
    "pivot_multi_agg_flag",
    "salted_join_events_users",
    "approx_quantiles_sketch",
    "winsorize_value_per_user",
    "ntile_quartile_customers",
    "winnow_shared_fingerprints",
    "gopher_quality_filters",
    "pii_scrub_docs",
    "repetition_ngram_stats",
    # (b) red in r02, fixed this round
    "range_join_purchase_clicks",
    "resample_15min_events",
    "stream_hourly_totals",
    # new this round: event-time-dependent stateful canary + the
    # sliding/session streaming windows' first oracle-checked rows
    "stream_session_stats_users",
    "stream_sliding_hourly",
    "stream_session_windows",
    "near_dup_components",
    "decontamination_check",
    "corpus_prep_pipeline",
    "tfidf_top_terms",
    "stream_dedup_fingerprints",
    "stream_interval_join_purchases",
    "q4_order_priority",
    "q7_nation_volume",
    "q10_returned_customers",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    # (c) timestamp-family rework touched these paths
    "resample_calendar_revenue",
    "cast_multiformat_dates",
    "stream_running_totals_users",
    "asof_last_purchase",
    "rolling_n_duration_events",
    "sessionize_events",
    "shift_cumsum_events",
    "ffill_user_value",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = _DRIVER_PRIORITY + [n for n in CATALOG if n not in _DRIVER_PRIORITY]
    return {name: CATALOG[name][0] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
