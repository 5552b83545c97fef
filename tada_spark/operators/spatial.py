"""Spatial joins without a spatial engine: integer grid-cell bucketing.

Spark has no native spatial operator; the scalable radius join is the
same banding trick LSH uses — bucket points into grid cells at least as
wide as the radius, explode ONE side to its 3×3 neighbor cells, equi-
join on the cell, and verify the exact distance predicate inside the
bucket. Work ∝ Σ (points per cell)², never |P|² — the plan is all
hash joins, and the verify step is integer arithmetic (squared
distances on integer coordinates), so results hash-match a naive
quadratic oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    points: DataFrame,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    cell: int | None = None,
) -> DataFrame:
    """All unordered point pairs within ``radius`` (integer coordinate
    units, inclusive): emits (id_a, id_b, dist2) with id_a < id_b and
    dist2 = (xa−xb)² + (ya−yb)² ≤ radius². ``cell`` defaults to the
    smallest power-of-2 ≥ radius, guaranteeing a 3×3 neighbor-cell
    cover. EXACT: coordinates and distances never leave int64
    (|x|, |y| ≲ 1.5e9).

    100 TB shape: the left side keys by its own cell, the right side
    explodes to 9 neighbor cells — one equi-join keyed on (cx, cy),
    candidate work bounded by cell occupancy; the id_a < id_b filter
    dedupes the symmetric candidates for free."""
    if cell is None:
        cell = 1
        while cell < radius:
            cell <<= 1
    pts = points.filter(
        F.col(id_col).isNotNull() & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id__"),
        F.col(x_col).cast("long").alias("__x__"),
        F.col(y_col).cast("long").alias("__y__"),
    )
    left = pts.select(
        F.col("__id__").alias("id_a"),
        F.col("__x__").alias("xa"),
        F.col("__y__").alias("ya"),
        F.floor(F.col("__x__") / cell).cast("long").alias("cx"),
        F.floor(F.col("__y__") / cell).cast("long").alias("cy"),
    )
    offs = F.expr("explode(flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))")
    right = pts.select(
        F.col("__id__").alias("id_b"),
        F.col("__x__").alias("xb"),
        F.col("__y__").alias("yb"),
        (F.floor(F.col("__x__") / cell).cast("long")).alias("__cx0__"),
        (F.floor(F.col("__y__") / cell).cast("long")).alias("__cy0__"),
    ).select(
        "id_b",
        "xb",
        "yb",
        "__cx0__",
        "__cy0__",
        offs.alias("__o__"),
    ).select(
        "id_b",
        "xb",
        "yb",
        (F.col("__cx0__") + F.col("__o__.dx")).alias("cx"),
        (F.col("__cy0__") + F.col("__o__.dy")).alias("cy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist2 = dx * dx + dy * dy
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(int(radius) * int(radius)))
    )
