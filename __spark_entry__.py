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
#: catalog has more. Rolling-freshness goal (VERDICT r3 ask #3): every
#: catalog entry green in the union of the last three rounds. r04 order:
#: (a) the four r03 hash-reds, fixed via driver-canon-safe oracle output
#: types, plus salted_group_sum whose latent DECIMAL(38,2) got the same
#: fix; (b) the seven queries whose only green row is r01 (predates the
#: timestamp rework); (c) queries whose oracle SQL changed this round
#: (sign-safe % rounding idiom) and must re-earn their green; (d) the
#: twenty brand-new round-4 entries (TPC-H analog shapes, paragraph
#: dedup, LM familiarity, sequence packing, md5-family LSH oracles,
#: streaming corpus prep, README-pipeline golden, the Q20/Q21 shape
#: completions) with no driver row yet; (e) last-green-r02 entries fill
#: the remaining slots — the rest of that cohort stays union-covered
#: through r05 and rotates in next round.
_DRIVER_PRIORITY = [
    # (a) r03 hash-reds, fixed + the latent same-class fix
    "q12_shipmode_priority",
    "bpe_token_budget",
    "repetition_ngram_stats",
    "salted_join_events_users",
    "salted_group_sum",
    # (b) green only in r01
    "lookup_orders_customer",
    "q6_revenue_delta",
    "distinct_flag_status",
    "divide_nullsafe",
    "json_extract_props",
    "cube_flag_status",
    "token_frequency",
    # (c) oracle SQL changed this round (sign-safe remainder)
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q7_nation_volume",
    "q10_returned_customers",
    # (d) brand-new round-4 entries — no driver row exists yet, so they
    # outrank the r02-greens (whose union membership holds through r05)
    "readme_pipeline_golden",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_inactive_customers",
    "paragraph_dedup_docs",
    "bigram_familiarity_docs",
    "sequence_pack_docs",
    "minhash_lsh_oracle",
    "winnow_fingerprints_oracle",
    "simhash_oracle",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "stream_corpus_prep",
    "kmeans_embeddings",
    # (e) last green r02
    "append_union",
    "custom_apply_zscore",
    "custom_reduce_weighted_mean",
    "dedup_exact_fingerprint",
    "group_reducers_full",
    "jaccard_near_dups",
    "lang_id_vote",
    "pivot_returnflag",
    "promote_region_level",
    "rollup_status_priority",
    "sort_topk_customers",
    "unique_first_appearance",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = _DRIVER_PRIORITY + [n for n in CATALOG if n not in _DRIVER_PRIORITY]
    return {name: CATALOG[name][0] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
