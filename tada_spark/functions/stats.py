"""Closed-form statistical estimators as exact aggregate algebra.

Regression/trend fitting at 100 TB is one pass of exact integer sums
(n, Σx, Σy, Σxy, Σx²) + O(groups) of closed-form arithmetic — never an
iterative solver. The sums are exact longs; the closed forms cast them
to doubles (correctly rounded int→double, bit-identical everywhere) and
run an identical IEEE expression tree on both engines, so results
hash-match their DuckDB oracles via the floor idiom.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tada_spark.plans.semantics import round_det


def ols_by_group(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group simple linear regression (OLS) of integer-exact y on
    integer-exact x — the per-segment trend estimator (is this
    customer segment's spend rising? is this domain's doc quality
    drifting?). One hash-aggregate computes the five exact long sums;
    the slope/intercept closed forms run on their double casts:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Emits slope_e6 (floor-quantized millionths) and intercept_2dp; a
    degenerate group (all x equal, or a single point) yields NULLs.
    Overflow envelope: Σxy must stay in int64 — with x = days-since-
    epoch (~2e4) and y = cents (~5e7), that holds to ~9e6 rows·SF per
    group; beyond that, lift the sums to DECIMAL(38,0) without touching
    the closed forms (the q1 scaled-integer discipline).

    100 TB shape: ONE map-side-combined hash-agg over the scan (five
    longs per group), then k-row arithmetic. No second pass, no window,
    no solver.

    Rows with a NULL x or y are dropped up front: SUM skips nulls but
    COUNT(*) would not, and an n inconsistent with the sums silently
    corrupts every closed form.
    """
    df = df.filter(x.isNotNull() & y.isNotNull())
    sums = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x.cast("long")).alias("sx"),
        F.sum(y.cast("long")).alias("sy"),
        F.sum((x.cast("long") * y.cast("long"))).alias("sxy"),
        F.sum((x.cast("long") * x.cast("long"))).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * syd
    den = nd * F.col("sxx").cast("double") - sxd * sxd
    slope = F.when(den != 0, num / den)
    intercept = F.when(den != 0, (syd - (num / den) * sxd) / nd)
    return sums.select(
        group_col,
        "n",
        F.floor(slope * F.lit(1e6) + F.lit(0.5)).cast("long").alias("slope_e6"),
        round_det(intercept, 2).alias("intercept_2dp"),
    )


def corr_by_group(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group Pearson correlation of integer-exact x and y — the
    companion readout to ols_by_group (slope says how much, r says how
    tightly). Six exact long sums in ONE hash-aggregate, then the
    closed form on double casts; sqrt is IEEE-correctly-rounded on
    every engine so the whole tree stays hash-deterministic (the
    det_ln argument). Emits corr_e6 (floor-quantized millionths);
    degenerate groups (zero variance in either variable) yield NULL.
    NULL x/y rows are dropped up front (the ols_by_group consistency
    rule: n must count exactly the rows the sums saw).
    """
    df = df.filter(x.isNotNull() & y.isNotNull())
    sums = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x.cast("long")).alias("sx"),
        F.sum(y.cast("long")).alias("sy"),
        F.sum((x.cast("long") * y.cast("long"))).alias("sxy"),
        F.sum((x.cast("long") * x.cast("long"))).alias("sxx"),
        F.sum((y.cast("long") * y.cast("long"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * syd
    denx = nd * F.col("sxx").cast("double") - sxd * sxd
    deny = nd * F.col("syy").cast("double") - syd * syd
    corr = F.when((denx > 0) & (deny > 0), num / (F.sqrt(denx) * F.sqrt(deny)))
    return sums.select(
        group_col,
        "n",
        F.floor(corr * F.lit(1e6) + F.lit(0.5)).cast("long").alias("corr_e6"),
    )
