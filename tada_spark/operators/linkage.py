"""Record linkage: blocked fuzzy (edit-distance) joins.

An un-blocked fuzzy join is a cross product — never acceptable. The
standard shape: a cheap BLOCKING key (prefix, phonetic code, length
bucket) turns the cross product into a per-block equi-join, and the
edit distance runs only inside blocks. Levenshtein is JVM-side in Spark
and built into DuckDB, so the whole operator is oracle-replicable with
no UDF.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block: Callable[[Column], Column],
    *,
    max_dist: int = 1,
) -> DataFrame:
    """Join rows whose ``left_col``/``right_col`` values are within
    ``max_dist`` Levenshtein edits, candidate pairs restricted to equal
    blocking keys (``block`` is a Column→Column function applied to each
    side's own match column, e.g. ``prefix_block(7)``). Returns
    left.* + right.* + ``dist``; the two sides are aliased internally,
    so SELF-linkage (left is right, or shared column names) resolves
    unambiguously — column qualification for downstream access of
    duplicated names is the caller's concern, as with any Spark
    self-join.

    100 TB shape: one equi-join on the block key (broadcast or shuffle,
    Catalyst's choice), distance computed only on co-blocked pairs —
    cost is Σ |block_l|·|block_r|, bounded by the caller's blocking
    granularity, never |L|·|R|.
    """
    lb = left.withColumn("__blk__", block(F.col(left_col))).alias("__fz_l__")
    rb = right.withColumn("__blk__", block(F.col(right_col))).alias("__fz_r__")
    j = lb.join(rb, F.col("__fz_l__.__blk__") == F.col("__fz_r__.__blk__"))
    # bounded levenshtein (Spark 3.5+): abandons a pair's DP early once
    # the running distance exceeds max_dist and returns -1 — exact
    # distances for every kept row, less CPU per rejected co-blocked
    # pair (the dominant cost on long strings)
    dist = F.levenshtein(
        F.col(f"__fz_l__.{left_col}"), F.col(f"__fz_r__.{right_col}"), max_dist
    )
    return (
        j.withColumn("dist", dist)
        .filter(F.col("dist") != -1)
        .drop("__blk__")
    )


def prefix_block(n: int) -> Callable[[Column], Column]:
    """Blocking key: the first ``n`` characters of the match column —
    right for identifier-like strings where early characters are
    stable. Returns a callable applied per side by fuzzy_join."""
    return lambda c: F.substring(c, 1, n)
