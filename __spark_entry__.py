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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
