"""Skew-mitigation utilities for hot keys at scale.

Spark's AQE handles skewed JOINS automatically, but a skewed GROUP BY
key still funnels one key's rows through one reducer when the
aggregation has no partial-merge shrinkage (e.g. exact distinct
collection) or when a single key dominates a partition. Two-phase
salted aggregation spreads a hot key across N sub-keys, aggregates
partially per (key, salt), then merges the N partials — the canonical
pattern for algebraic aggregates (sum/count/min/max, and mean via
sum+count).

For built-in sums Spark's map-side partial aggregation already gives
the same effect; salting matters when partials can't combine map-side
(distinct-style states) or when partition-level skew persists. Results
are identical to the unsalted plan for exact types (int, decimal,
min/max/count); double sums are reassociated like ANY repartitioning
reassociates them — callers needing cross-engine/rounding-stable
totals over floats should aggregate a decimal cast (see
salted_join_events_users), which this pattern keeps exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) merge.

    aggs: out_name → (agg_kind, column); kinds: sum, count, min, max,
    mean (decomposed into sum+count so the merge stays exact).
    The salt is a deterministic hash of a physical row marker (partition
    id + monotonically increasing id), so rows of a hot key scatter
    uniformly without changing any aggregate's value.
    """
    wanted_mean = {n: c for n, (k, c) in aggs.items() if k == "mean"}
    phase1_aggs: dict[str, tuple[str, str]] = {}
    for name, (kind, col) in aggs.items():
        if kind == "mean":
            phase1_aggs[f"__s_{name}"] = ("sum", col)
            phase1_aggs[f"__c_{name}"] = ("count", col)
        elif kind in _PARTIAL:
            phase1_aggs[name] = (kind, col)
        else:
            raise ValueError(f"salted_agg: unsupported kind {kind!r}")

    salted = df.withColumn(
        "__salt__", F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(salts))
    )
    partial = salted.groupBy(*keys, "__salt__").agg(
        *[_PARTIAL[k](F.col(c)).alias(n) for n, (k, c) in phase1_aggs.items()]
    )
    merged = partial.groupBy(*keys).agg(
        *[_MERGE[k](F.col(n)).alias(n) for n, (k, c) in phase1_aggs.items()]
    )
    out_cols: list[Column] = [F.col(k) for k in keys]
    for name, (kind, _col) in aggs.items():
        if kind == "mean":
            out_cols.append((F.col(f"__s_{name}") / F.col(f"__c_{name}")).alias(name))
        else:
            out_cols.append(F.col(name))
    return merged.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    hot_keys: DataFrame | None = None,
    hot_threshold: int = 1_000_000,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot left keys are salted across
    ``salts`` sub-keys and the matching right rows replicated per salt;
    cold keys join normally; results union. The manual lever for when
    AQE's skew-join can't help (e.g. the skewed side feeds a window, or
    a streaming join where AQE is unavailable).

    ``hot_keys``: single-column DataFrame(s) of hot key tuples; if None,
    keys exceeding ``hot_threshold`` rows on the left are detected with
    a count pass. Hot-key sets are assumed driver-broadcastable (they
    are by construction: a key is only hot if it repeats millions of
    times, so there are at most |left|/threshold of them).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right-preserving joins would emit the per-salt right replicas
        # that land in non-matching salt buckets as spurious null-padded
        # rows (up to `salts`x duplication of hot right rows)
        raise ValueError(f"salted_join: how={how!r} unsupported; use inner/left")
    if hot_keys is None:
        hot_keys = (
            left.groupBy(*on).count().filter(F.col("count") > hot_threshold).select(*on)
        )
    else:
        # a caller-supplied list with a repeated key would multiply
        # both sides' rows in the left-join below (each matched pair
        # duplicated per extra copy, squared) — the auto-detect path is
        # distinct by construction; make the explicit path match
        hot_keys = hot_keys.select(*on).distinct()
    hot = F.broadcast(hot_keys.withColumn("__hot__", F.lit(True)))

    l = left.join(hot, on=on, how="left")
    l_hot = l.filter(F.col("__hot__")).drop("__hot__").withColumn(
        "__salt__",
        F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(salts)),
    )
    l_cold = l.filter(F.col("__hot__").isNull()).drop("__hot__")

    r = right.join(hot, on=on, how="left")
    r_hot = r.filter(F.col("__hot__")).drop("__hot__").withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<long>"))
    )
    r_cold = r.filter(F.col("__hot__").isNull()).drop("__hot__")

    hot_joined = l_hot.join(r_hot, on=[*on, "__salt__"], how=how).drop("__salt__")
    cold_joined = l_cold.join(r_cold, on=on, how=how)
    return hot_joined.unionByName(cold_joined)


def key_skew_profile(
    df: DataFrame, key_col: str, *, top_n: int = 10, round_digits: int = 6
) -> DataFrame:
    """Heavy-hitter diagnosis for a shuffle key — the measurement that
    decides whether salted_agg / salted_join are worth their overhead:
    the top-N keys by row count with each key's share of the table.
    A top-1 share near 1/num_partitions or above means one reducer owns
    a partition-sized slice and the salting path should engage.

    100 TB design: one hash-aggregate shuffle (map-side combine ships
    one row per key per mapper), a 1-row global-count broadcast
    (crossJoin of a scalar aggregate — O(left) with exactly one
    broadcast row, the sanctioned scalar-subquery plan), and a
    TakeOrderedAndProject for the top-N — never a global sort. Ties
    break by key value so the output is deterministic.
    """
    from tada_spark.plans.semantics import round_det

    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("cnt"))
    total = df.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            round_det(F.col("cnt") / F.col("total"), round_digits).alias("share"),
        )
        # nulls-LAST tie-break: Spark's bare asc() is nulls-first while
        # SQL ORDER BY ASC defaults NULLS LAST — a NULL key tied at the
        # cutoff would otherwise make the two engines keep different rows
        .orderBy(F.col("cnt").desc(), F.col("key").asc_nulls_last())
        .limit(top_n)
    )
