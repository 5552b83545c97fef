"""Data-quality expectations: declarative rules → one-pass audit report.

The ingest-gate primitive a 100 TB lake needs in front of every table:
declare rules (not-null, unique, range, value-set, regex), get back one
row per rule with violation counts — computed in a SINGLE aggregate
pass over the data (all row-level rules become conditional sums in one
hash-agg; uniqueness rides the same pass as count - count_distinct), so
the audit costs one scan regardless of how many rules are attached.

Null convention (pinned, mirrored by the SQL oracle): value rules
(range / in-set / regex) SKIP nulls — a null is a completeness problem,
which is `not_null`'s job, not a validity violation; their n_checked is
the non-null count. `not_null` checks all rows; `unique` counts
duplicate non-null rows (n_nonnull - n_distinct).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    rule: str
    column: str
    #: predicate over the column: True = OK, False = violation (nulls
    #: pre-filtered for value rules); None for the structural rules
    #: (not_null / unique) which have dedicated aggregation shapes.
    pred: Column | None = None


def expect_not_null(column: str) -> Expectation:
    return Expectation("not_null", column)


def expect_unique(column: str) -> Expectation:
    return Expectation("unique", column)


def expect_range(column: str, lo, hi) -> Expectation:
    c = F.col(column)
    return Expectation("range", column, (c >= F.lit(lo)) & (c <= F.lit(hi)))


def expect_in_set(column: str, values) -> Expectation:
    return Expectation("in_set", column, F.col(column).isin(list(values)))


def expect_regex(column: str, pattern: str) -> Expectation:
    return Expectation("regex", column, F.col(column).rlike(pattern))


REPORT_SCHEMA = "rule string, column_name string, n_violations long, n_checked long, ok boolean"


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Run all expectations in ONE aggregate pass; returns one row per
    rule: (rule, column_name, n_violations, n_checked, ok). An empty
    rule list returns an empty report, not an error (rules often come
    from config)."""
    if not expectations:
        return df.sparkSession.createDataFrame([], REPORT_SCHEMA)
    aggs: list[Column] = []
    for i, e in enumerate(expectations):
        c = F.col(e.column)
        if e.rule == "not_null":
            aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"v{i}"))
            aggs.append(F.count(F.lit(1)).alias(f"c{i}"))
        elif e.rule == "unique":
            aggs.append((F.count(c) - F.countDistinct(c)).alias(f"v{i}"))
            aggs.append(F.count(c).alias(f"c{i}"))
        else:
            # value rules skip nulls: checked = non-null, violation =
            # non-null AND NOT pred
            aggs.append(F.count(F.when(c.isNotNull() & ~e.pred, 1)).alias(f"v{i}"))
            aggs.append(F.count(c).alias(f"c{i}"))
    row = df.agg(*aggs)
    reports = F.array(
        *[
            F.struct(
                F.lit(e.rule).alias("rule"),
                F.lit(e.column).alias("column_name"),
                F.col(f"v{i}").cast("long").alias("n_violations"),
                F.col(f"c{i}").cast("long").alias("n_checked"),
                (F.col(f"v{i}") == 0).alias("ok"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return row.select(F.inline(reports))
