"""Record linkage: blocked fuzzy (edit-distance) joins.

An un-blocked fuzzy join is a cross product — never acceptable. The
standard shape: a cheap BLOCKING key (prefix, phonetic code, length
bucket) turns the cross product into a per-block equi-join, and the
edit distance runs only inside blocks. Levenshtein is JVM-side in Spark
and built into DuckDB, so the whole operator is oracle-replicable with
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block: Column,
    *,
    max_dist: int = 1,
) -> DataFrame:
    """Join rows whose ``left_col``/``right_col`` values are within
    ``max_dist`` Levenshtein edits, candidate pairs restricted to equal
    ``block`` values (the blocking expression is evaluated against each
    side's match column). Returns left.* + right.* + ``dist``.

    100 TB shape: one equi-join on the block key (broadcast or shuffle,
    Catalyst's choice), distance computed only on co-blocked pairs —
    cost is Σ |block_l|·|block_r|, bounded by the caller's blocking
    granularity, never |L|·|R|.
    """
    lb = left.withColumn("__blk__", block_of(block, left_col))
    rb = right.withColumn("__blk__", block_of(block, right_col))
    j = lb.join(rb, "__blk__")
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return j.withColumn("dist", dist).filter(F.col("dist") <= max_dist).drop("__blk__")


def block_of(block: Column | None, col: str) -> Column:
    """Resolve the blocking expression for one side: a Column template
    is applied as-is when it references the side's own columns; the
    common case is a function of the match column built by the caller
    via ``F.col``-free helpers (e.g. ``prefix_block``)."""
    if callable(block):
        return block(F.col(col))
    return block


def prefix_block(n: int):
    """Blocking key: the first ``n`` characters of the match column —
    right for identifier-like strings where early characters are
    stable. Returns a callable applied per side by fuzzy_join."""
    return lambda c: F.substring(c, 1, n)
