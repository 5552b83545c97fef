"""Count-min sketch: fixed-size frequency profiles over keyed data.

Free extension of the sketch tier (the reference's approximate surface
stops at distinct counts; frequency estimation is the natural next
sketch a 100 TB profile needs). Unlike HLL/KLL — whose estimates are
engine-internal and only bounded-error checkable — this CMS is built
from the repo's oracle-replicable md5 32-bit hash family
(functions/text.md5_hash32), so every cell, and therefore every
estimate, is a deterministic integer that DuckDB reproduces exactly:
the sketch tier's first fully HASH-verified member.

Scale design: the build is one scan → explode(depth) → a single hash
aggregate whose distinct-key universe is capped at depth×width cells.
Map-side combine therefore bounds the shuffle at depth×width rows PER
INPUT PARTITION no matter how many distinct keys the data has — the
exact groupBy it stands in for shuffles every distinct key. Point
estimates join against the ≤ depth×width-row sketch with an explicit
broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tada_spark.functions.text import md5_hash32


def cms_bucket(row: int, key: Column, width: int) -> Column:
    """Row-``row`` CMS bucket of ``key``: md5 32-bit hash of the
    row-tagged key string, mod ``width``. The hash is non-negative, so
    ``%`` agrees between engines without the signed-pmod idiom.
    DuckDB twin: ``('0x' || md5('cms' || i || '#' || k::VARCHAR)[1:8])
    ::BIGINT % width``."""
    return md5_hash32(F.concat(F.lit(f"cms{row}#"), key.cast("string"))) % F.lit(width)


def cms_build(df: DataFrame, key: Column, *, depth: int = 4, width: int = 256) -> DataFrame:
    """Build a depth×width count-min sketch as a (row, bucket, c) cell
    table — the sparse form of the classic integer matrix (absent cell
    ≡ 0). One explode + one aggregate; output ≤ depth·width rows."""
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("row"), cms_bucket(i, key, width).alias("bucket"))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    keys: DataFrame, sketch: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key row against the sketch: min over the
    depth rows of the hashed cell's count (the CMS estimator, which can
    only OVERcount — collisions add, never subtract). Carries every
    other column of ``keys`` through. The sketch side is tiny by
    construction, so the join is an explicit broadcast.

    The sketch is SPARSE (absent cell ≡ 0), so probes join LEFT and
    coalesce missing cells to 0 before the min: a key the build never
    saw estimates 0 when any of its cells is empty, and never
    disappears from the output. (An inner join here silently skipped
    empty cells — min over only the populated ones — inflating unseen
    keys and dropping keys whose every cell was empty.)"""
    carry = [c for c in keys.columns if c != key_col]
    probes = keys.select(
        key_col,
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(i, F.col(key_col), width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, *carry, "p.row", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col, *carry)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )
