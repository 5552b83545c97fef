"""Regression pins for the round-9 frame/sources/plans review findings.

Second targeted review pass (after the operators/ pass): latent defects
in the core Frame layer that the oracle data never exercised — a merge
that split bare-string keys into characters, positional fills ignoring
the frame's declared order, interpolate extrapolating from NULL-x
neighbors, asof gap arithmetic truncating fractional on-values,
combine('/') dropping ignore_nulls, the JSON codec never applying its
promised timestamp re-parse, the ns-parquet shim losing 1 µs through a
double detour and leaking a session-global flag, filter_index ignoring
an explicit ordering when a stale rowid existed, and _det_repr
saturating on huge doubles.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tada_spark.frame import Frame, _det_repr


def test_merge_bare_string_keys_not_split(spark):
    left = Frame(spark.createDataFrame([(1, "a")], "key int, lv string"))
    right = Frame(spark.createDataFrame([(1, "b")], "key int, rv string"))
    # before: list("key") == ['k','e','y'] left the real key un-exempt,
    # it was renamed key_1, and the lookup crashed with KeyError
    m = left.merge(right, left_on="key", right_on="key")
    assert "rv" in m.columns


def test_fill_null_honors_declared_order(spark):
    df = spark.createDataFrame([(3, None), (1, 10.0), (2, None)], "ts int, v double")
    f = Frame(df).ordered("ts").fill_null(how="forward", subset=["v"])
    vals = {r.ts: r.v for r in f.df.collect()}
    # before: bare with_rowid(df) filled in PHYSICAL ingest order, so
    # ts=3 (first on disk) stayed null and ts=2 could grab ts=3's value
    assert vals == {1: 10.0, 2: 10.0, 3: 10.0}


def test_interpolate_null_x_rows_are_not_neighbors(spark):
    df = spark.createDataFrame([(None, 100.0), (1.0, None), (2.0, 5.0)], "x double, v double")
    out = {r.x: r.v for r in Frame(df).interpolate("v", x_col="x").df.collect()}
    # before: the null-x row sorted first, dx was NULL, and the
    # coincident-x fallback branch extrapolated 100.0 into x=1
    assert out[1.0] is None


def test_asof_fractional_on_values_not_truncated(spark):
    left = Frame(spark.createDataFrame([(1, 10.0)], "k int, t double"))
    right = Frame(
        spark.createDataFrame([(1, 9.6, "back"), (1, 10.5, "fwd")], "k int, t double, tag string")
    )
    # before: cast('long') gave gaps gb=1, gf=0 and 'nearest' picked fwd
    res = left.asof_join(right, on="t", by=["k"], value_cols=["tag"], direction="nearest")
    assert res.df.collect()[0].tag == "back"
    # before: a true gap of 0.4 truncated to 0 and passed tolerance 0
    res2 = left.asof_join(
        right, on="t", by=["k"], value_cols=["tag"], direction="backward", tolerance_us=0
    )
    assert res2.df.collect()[0].tag is None


def test_combine_divide_honors_ignore_nulls(spark):
    a = Frame(spark.createDataFrame([("x", None)], "lbl string, a double")).set_as_labels("lbl")
    b = Frame(spark.createDataFrame([("x", 5.0)], "lbl string, b double")).set_as_labels("lbl")
    out = a.combine(b, "/", left_col="a", right_col="b", ignore_nulls=True).df.collect()[0]
    assert out.result == 0.0  # reference combineMath: missing side is 0


def test_json_roundtrip_keeps_time_dtypes(spark):
    from tada_spark.sources.codec import frame_from_json, frame_to_json

    ts = datetime.datetime(2020, 1, 2, 3, 4, 5, 123456)
    for dtype in ("timestamp_ntz", "timestamp"):
        df = spark.createDataFrame([(1, ts)], f"id int, ts {dtype}")
        rt = frame_from_json(spark, frame_to_json(Frame(df)))
        assert dict(rt.df.dtypes)["ts"] == dtype
        got = rt.df.collect()[0].ts
        assert got.microsecond == 123456  # sub-second survives


def test_ns_parquet_shim_exact_and_flag_restored(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # ...999 ns: the old double detour rounded to a 256-ns multiple and
    # shifted the truncated microsecond by 1
    vals = [1_700_000_000_123_456_789, 1_700_000_000_000_000_999]
    t = pa.table({"ts": pa.array(vals, type=pa.timestamp("ns")), "v": [1, 2]})
    path = str(tmp_path / "ns.parquet")
    pq.write_table(t, path)
    f = Frame.read_parquet(spark, path)
    got = {r.v: r.ts for r in f.df.collect()}
    assert got[1].microsecond == 123456
    assert got[2].microsecond == 0
    # the legacy session flag must not leak past the read
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None


def test_filter_index_explicit_order_beats_stale_rowid(spark):
    df = spark.createDataFrame([(1, 30), (2, 20), (3, 10)], "a int, b int")
    f = Frame(df).ordered("a")
    pos = [r.position for r in f.filter_index(F.col("a") == 1, order_by=["b"]).df.collect()]
    # by b-order, the a=1 row (b=30) is position 2; before, the stale
    # a-ordering rowid short-circuited and reported position 0
    assert pos == [2]


def test_det_repr_huge_doubles_stay_distinct_and_portable(spark):
    import duckdb

    df = spark.createDataFrame([(1.0e15,), (2.0e15,), (3.5,)], "x double")
    got = sorted(r[0] for r in df.select(_det_repr(F.col("x"), T.DoubleType())).collect())
    want = sorted(
        x[0]
        for x in duckdb.sql(
            "SELECT CASE WHEN ABS(x) < 9000000000000 THEN CAST(FLOOR(x*1000000+0.5) AS BIGINT)::VARCHAR "
            "ELSE TRY_CAST(x AS DECIMAL(38,6))::VARCHAR END "
            "FROM (VALUES (1.0e15),(2.0e15),(3.5)) t(x)"
        ).fetchall()
    )
    # before: both 1e15 and 2e15 saturated to Long.MAX — identical reprs
    assert got == want and len(set(got)) == 3


def test_subset_empty_positions(spark):
    assert Frame(spark.createDataFrame([(1,)], "a int")).subset([]).df.count() == 0


def test_value_counts_on_column_named_count(spark):
    vc = Frame(spark.createDataFrame([(7,), (7,)], "count int")).value_counts("count")
    assert vc.df.columns == ["count", "count_1"]
    assert vc.df.collect()[0].count_1 == 2


def test_read_matrix_nan_becomes_null(spark):
    from tada_spark.sources.codec import read_matrix

    row = read_matrix(spark, [[1.0, float("nan")]]).df.collect()[0]
    assert row[0] == 1.0 and row[1] is None
