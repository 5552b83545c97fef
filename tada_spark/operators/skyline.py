"""Pareto frontier (skyline): the non-dominated rows of a 2-D
minimize/maximize trade-off (cheapest part per size class, best
quality-per-cost doc, …).

The naive formulation is a quadratic self-anti-join. The 2-D case is
O(n log n) with a sort: scanning by x ascending, a row is dominated iff
an earlier row's y already reached it — one running-max window answers
that. A single global window would funnel the whole scan through one
partition, so the operator runs TWO phases: a partition-local prune
with the same rule (any locally dominated row is globally dominated,
by transitivity every dominated row is dominated by a frontier row, and
frontier rows survive every prune — so the phase is correct under ANY
row placement), then the global pass over the surviving candidate set,
which is frontier-sized (typically O(distinct x) ≪ n). Net: one narrow
scan + one tiny single-partition window — the TakeOrderedAndProject
discipline applied to skylines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune(df: DataFrame, x_col: str, y_col: str, part_cols: list[str]) -> DataFrame:
    """Drop rows dominated within each ``part_cols`` slice: dominated
    iff an x-strictly-smaller row has y ≥ mine (range window on the
    integer x order), or an equal-x row has y strictly greater."""
    order = (
        Window.partitionBy(*part_cols).orderBy(F.col(x_col).asc())
        if part_cols
        else Window.orderBy(F.col(x_col).asc())
    )
    m_lt = F.max(y_col).over(order.rangeBetween(Window.unboundedPreceding, -1))
    m_eq = F.max(y_col).over(Window.partitionBy(*part_cols, x_col))
    dominated = (m_lt.isNotNull() & (m_lt >= F.col(y_col))) | (m_eq > F.col(y_col))
    return df.withColumn("__dom__", dominated).filter(~F.col("__dom__")).drop("__dom__")


def pareto_frontier_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows not dominated under (minimize ``x_col``, maximize
    ``y_col``); a row is dominated iff another row is ≤ in x and ≥ in y
    with at least one strict. Exact-duplicate (x, y) rows are all kept
    (neither strictly dominates the other). NULL x or y rows are
    dropped up front. Columns pass through untouched."""
    d = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    local = _prune(
        d.withColumn("__pid__", F.spark_partition_id()), x_col, y_col, ["__pid__"]
    ).drop("__pid__")
    return _prune(local, x_col, y_col, [])
