"""Range (interval) join: left timestamps against right [start, end).

Spark plans a raw inequality join as BroadcastNestedLoopJoin (or a
cartesian) — O(n·m) comparisons, a non-starter at scale. The classic
fix: quantize time into buckets of width w, explode each interval onto
the buckets it overlaps (≤ len/w + 1 rows), equi-join on
(keys…, bucket) — a plain shuffled hash join — then re-check the exact
bounds. Each (row, interval) pair meets in exactly one bucket (the
row's), so no dedupe is needed. Work is linear in rows + genuine
matches; pick w near the typical interval length so explode stays ~2×.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    bucket_s: int = 3600,
) -> DataFrame:
    """Rows of ``left`` matched to every ``right`` interval containing
    their timestamp: right.start <= left.ts < right.end, equal ``by``
    keys. Returns left columns + right columns (names must not collide
    apart from ``by``)."""
    from tada_spark.plans.timeutil import epoch_us

    ldt = {f.name: f.dataType for f in left.schema.fields}
    rdt = {f.name: f.dataType for f in right.schema.fields}
    w_us = bucket_s * 1_000_000
    lb = F.floor(epoch_us(F.col(left_ts), ldt[left_ts]) / w_us)
    l = left.withColumn("__bucket__", lb)

    start_b = F.floor(epoch_us(F.col(right_start), rdt[right_start]) / w_us)
    end_b = F.floor((epoch_us(F.col(right_end), rdt[right_end]) - 1) / w_us)  # end exclusive
    # guard degenerate intervals (end <= start): F.sequence defaults to
    # step -1 when start > stop, which would silently explode a full
    # DESCENDING bucket list per bad row; null → explode drops the row
    buckets = F.when(end_b >= start_b, F.sequence(start_b, end_b))
    r = right.withColumn("__bucket__", F.explode(buckets))

    on = [*by, "__bucket__"]
    exact: Column = (F.col(right_start) <= F.col(left_ts)) & (
        F.col(left_ts) < F.col(right_end)
    )
    return l.join(r, on=on, how="inner").filter(exact).drop("__bucket__")


def merge_intervals(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands: merge overlapping or touching [start, end)
    intervals per key into maximal islands — the classic coverage
    operator (uptime stitching, session coverage, sensor dropouts).

    One window pass per key: the running max of previous ends marks
    island starts (start > max_prev_end ⇒ gap), a running sum of those
    marks numbers the islands, then one aggregate per island emits
    (keys…, island_start, island_end). Rows tied on (start, end) are
    byte-identical in every consumed column, so tie order cannot change
    the result.

    100 TB shape: ONE shuffle on the keys; linear in rows per key
    (the as-of union-stream discipline — no self-join, no row
    multiplication). Wide keys that overflow a partition salt by
    coarse time-bucket like asof_join.
    """
    keys = list(key_cols)
    base = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(base.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max.isNull() | (F.col(start_col) > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = df.withColumn("__new__", new_island).withColumn(
        "__island__",
        F.sum("__new__").over(base.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy(*keys, "__island__")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_intervals"),
        )
        .drop("__island__")
    )
