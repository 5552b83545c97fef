"""Pareto frontier (skyline): the non-dominated rows of a 2-D
minimize/maximize trade-off (cheapest part per size class, best
quality-per-cost doc, …).

The naive formulation is a quadratic self-anti-join. The 2-D case is
O(n log n) with a sort: scanning by x ascending, a row is dominated iff
an earlier row's y already reached it. A single global window would
funnel the whole scan through one partition, so the operator runs TWO
phases: a partition-local SOUND prune (strict running-max in
(x asc, y desc) order — only ever drops genuinely dominated rows, for
any x type, and frontier rows survive every prune), then an EXACT
global pass over the surviving candidate set, which is frontier-sized
(typically O(distinct x) ≪ n): per-x max on the distinct-x spine, a
running max over previous spine rows for the strictly-smaller-x test,
broadcast back. Net: one narrow scan + one tiny spine window — the
TakeOrderedAndProject discipline applied to skylines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune_local(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Partition-local SOUND prune: drop a row only when a previous row
    in (x asc, y desc) order has strictly greater y — every such row is
    genuinely dominated (the predecessor has x' < x, or x' == x with
    y' > y), for ANY x type. Deliberately incomplete (misses x' < x
    with y' == y); the global pass is exact, a prune only needs to
    never drop a frontier row."""
    w = (
        Window.partitionBy("__pid__")
        .orderBy(F.col(x_col).asc(), F.col(y_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m_prev = F.max(y_col).over(w)
    dominated = m_prev.isNotNull() & (m_prev > F.col(y_col))
    return df.withColumn("__dom__", dominated).filter(~F.col("__dom__")).drop("__dom__")


def _prune_exact(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """EXACT dominance on the (frontier-sized) candidate set: dominated
    iff an x-strictly-smaller row has y ≥ mine, or an equal-x row has y
    strictly greater. 'Strictly smaller x' is computed on the
    DISTINCT-x spine (per-x max y, then a running max over previous
    spine ROWS) — never a rangeBetween(…, -1) frame, whose 'x ≤ x−1'
    is only strictly-smaller for integer x; fractional x (1.5 vs 2.0)
    silently produced a superset frontier."""
    spine = df.groupBy(x_col).agg(F.max(y_col).alias("__xy_max__"))
    spine = spine.withColumn(
        "__lt_max__",
        F.max("__xy_max__").over(
            Window.orderBy(F.col(x_col).asc()).rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    joined = df.join(F.broadcast(spine), [x_col], "left")
    dominated = (
        F.col("__lt_max__").isNotNull() & (F.col("__lt_max__") >= F.col(y_col))
    ) | (F.col("__xy_max__") > F.col(y_col))
    return joined.filter(~dominated).drop("__xy_max__", "__lt_max__")


def pareto_frontier_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows not dominated under (minimize ``x_col``, maximize
    ``y_col``); a row is dominated iff another row is ≤ in x and ≥ in y
    with at least one strict. Exact-duplicate (x, y) rows are all kept
    (neither strictly dominates the other). NULL x or y rows are
    dropped up front. Columns pass through untouched."""
    d = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    local = _prune_local(
        d.withColumn("__pid__", F.spark_partition_id()), x_col, y_col
    ).drop("__pid__")
    return _prune_exact(local, x_col, y_col)
