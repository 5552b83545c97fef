"""Regression pins for the round-9 operator-core review findings.

A targeted review pass over tada_spark/operators/ (after the catalog
had been gate-green for rounds) found defects the oracle data never
exercised: canon-grouped join-backs and group fetches that missed NULL
keys, a fractional-x Pareto frontier, a CDC op filter that silently
deleted on corrupt ops, a rolling_duration('median') plan-time crash,
scheme-alias bypass of the compaction overwrite guard, pit_join
rewriting its passthrough position column, approx_nunique() rejecting
its documented no-args form, and transpose crashing on multi-label
frames. Each test here reproduces the original failure shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tada_spark.frame import Frame


def test_canon_aligned_distinct_covers_null_keys(spark):
    df = spark.createDataFrame([("a", 1), (None, 2), (None, 3), ("a", 4)], "s string, v int")
    out = sorted(
        [(r.s, r.nunique_v) for r in Frame(df).group_by("s", canon=True).align().nunique("v").df.collect()],
        key=str,
    )
    # before: NULL-keyed rows compared raw-NULL vs the '\x00null'
    # sentinel in the join-back and got NULL aggregates
    assert out == [("a", 2), ("a", 2), (None, 2), (None, 2)]


def test_canon_get_group_fetches_null_group(spark):
    df = spark.createDataFrame([("a", 1), (None, 2)], "s string, v int")
    g = Frame(df).group_by("s", canon=True)
    counts = {key: grp.df.count() for key, grp in g.iter_groups()}
    assert counts == {("a",): 1, ("\x00null",): 1}


def test_pareto_frontier_fractional_x(spark):
    from tada_spark.operators.skyline import pareto_frontier_2d

    # before: rangeBetween(…, -1) meant x' <= x-1, so (1.5, 10) was
    # invisible to (2.0, 5) and the frontier was a superset
    d = spark.createDataFrame(
        [(1.5, 10.0), (2.0, 5.0), (1.5, 10.0), (1.0, 10.0)], "x double, y double"
    )
    out = sorted((r.x, r.y) for r in pareto_frontier_2d(d, "x", "y").collect())
    assert out == [(1.0, 10.0)]
    # exact-duplicate (x, y) rows are all kept (documented)
    d2 = spark.createDataFrame([(1.5, 10.0), (1.5, 10.0), (2.0, 12.0)], "x double, y double")
    out2 = sorted((r.x, r.y) for r in pareto_frontier_2d(d2, "x", "y").collect())
    assert out2 == [(1.5, 10.0), (1.5, 10.0), (2.0, 12.0)]


def test_apply_changes_unknown_op_fails_loudly(spark):
    from tada_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "x"), (2, "y")], "k int, val string")
    # before: the anti-join removed key 1 and the op != 'D' filter
    # dropped the NULL-op change — the key was silently DELETED
    bad = spark.createDataFrame([(1, None, 1, "z")], "k int, op string, seq int, val string")
    with pytest.raises(Exception, match="unknown op"):
        apply_changes(base, bad, "k").collect()
    good = spark.createDataFrame(
        [(1, "U", 1, "z"), (2, "D", 1, "w")], "k int, op string, seq int, val string"
    )
    out = sorted((r.k, r.val) for r in apply_changes(base, good, "k").collect())
    assert out == [(1, "z")]


def test_rolling_duration_median(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 10, 2.0), (1, 3600, 30.0)], "k int, ts long, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # before: INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC at plan time —
    # rolling_n had the sorted-array median, rolling_duration did not
    rows = Frame(df).group_by("k").rolling_duration(3600, "ts", "v", "median").df.collect()
    med = {r.ts.hour * 3600 + r.ts.minute * 60 + r.ts.second: r.rolling_median_v for r in rows}
    assert med[0] == 1.5 and med[3600] == 30.0


def test_compact_guard_catches_scheme_aliases():
    from tada_spark.operators.layout import _same_target

    assert _same_target("s3a://bucket/t", "s3://bucket/t")
    assert _same_target("s3n://bucket/t", "s3a://bucket/t")
    assert not _same_target("s3a://bucket/t", "s3://bucket/u")


def test_pit_join_pos_column_passes_through_untouched(spark):
    from tada_spark.operators.cdc import pit_join

    hist = spark.createDataFrame(
        [(1, 0, 100, "v0"), (1, 100, None, "v1")],
        "k int, valid_from long, valid_to long, attr string",
    )
    facts = spark.createDataFrame([(1, 50)], "k int, ts long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = pit_join(facts, hist, "k", "ts")
    # before: ts came back as the try_cast('long') ordering key
    assert dict(out.dtypes)["ts"] == "timestamp"
    row = out.collect()[0]
    assert row.attr == "v0" and row.ts is not None


def test_approx_nunique_defaults_to_value_columns(spark):
    df = spark.createDataFrame([("a", 1, 9), ("a", 2, 9)], "k string, v int, u int")
    out = Frame(df).group_by("k").approx_nunique().df.collect()[0]
    assert out.approx_nunique_v == 2 and out.approx_nunique_u == 1


def test_transpose_multi_label_uses_level_encoding(spark):
    from tada_spark.operators.reshape import transpose

    df = spark.createDataFrame([("a", "b", 1, 2)], "l1 string, l2 string, c1 int, c2 int")
    out = transpose(Frame(df).set_as_labels("l1", "l2"))
    # before: str(tuple) column names crashed the Frame ctor
    assert out.df.columns == ["name", "a|b"]
    vals = {r.name: r["a|b"] for r in out.df.collect()}
    assert vals == {"c1": "1", "c2": "2"}


def test_fuzzy_join_bounded_levenshtein_same_results(spark):
    from tada_spark.operators.linkage import fuzzy_join, prefix_block

    left = spark.createDataFrame([("1234567ab",), ("1234567xy",)], "s string")
    right = spark.createDataFrame([("1234567ac",), ("1234567zz",)], "t string")
    out = sorted(
        (x.s, x.t, x.dist)
        for x in fuzzy_join(left, right, "s", "t", prefix_block(7), max_dist=1).collect()
    )
    assert out == [("1234567ab", "1234567ac", 1)]
