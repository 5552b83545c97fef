"""Tests for sources/, testing/, reshape, and streaming modules."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from tada_spark.frame import Frame
from tada_spark.operators import reshape
from tada_spark.sources import read_records, read_structs, write_records, write_structs
from tada_spark.streaming import (
    run_available_now,
    stream_resample,
    stream_session_agg,
    stream_sliding_agg,
)
from tada_spark.testing import equal_records, equal_structs, write_mock_csv


def test_read_records_header_labels_nulls(spark):
    f = read_records(
        spark,
        [["name", "score"], ["alice", "1.5"], ["bob", "(null)"]],
        header_rows=1,
        label_levels=1,
        infer_types=True,
    )
    assert f.labels == ["name"]
    rows = {r.name: r.score for r in f.df.collect()}
    assert rows["alice"] == 1.5 and rows["bob"] is None


def test_read_records_by_column_and_ragged(spark):
    f = read_records(spark, [["a", "1", "2"], ["b", "3", "4"]], by_column=True)
    assert f.columns == ["a", "b"]
    assert f.df.count() == 2
    try:
        read_records(spark, [["a", "b"], ["1"]])
        raise AssertionError("expected ragged error")
    except ValueError as e:
        assert "ragged" in str(e)


def test_read_records_empty_errors(spark):
    try:
        read_records(spark, [])
        raise AssertionError("expected error")
    except ValueError as e:
        assert "at least one record" in str(e)


def test_write_records_roundtrip_nulls(spark):
    f = Frame(spark.createDataFrame([("a", 1.0), ("b", None)], "k string, v double"))
    recs = write_records(f)
    assert recs[0] == ["k", "v"]
    assert ["a", "1"] in recs and ["b", "(null)"] in recs  # fmt.Sprint float + (null)


def test_equal_records_diffs(spark):
    f = Frame(spark.createDataFrame([("a", 1.0)], "k string, v double"))
    ok, diffs = equal_records(f, [["k", "v"], ["a", "1"]])
    assert ok, diffs
    ok, diffs = equal_records(f, [["k", "v"], ["a", "2"]])
    assert not ok and "[1,1]" in diffs[0]


@dataclass
class Score:
    name: str
    mean_score: float


def test_struct_io_roundtrip(spark):
    f = read_structs(spark, [Score("a", 1.0), Score("b", 2.0)])
    assert f.columns == ["name", "mean_score"]
    out = write_structs(f, Score)
    assert sorted(out, key=lambda s: s.name) == [Score("a", 1.0), Score("b", 2.0)]
    ok, diffs = equal_structs(f, [Score("a", 1.0), Score("b", 2.0)], sort_key="name")
    assert ok, diffs


def test_write_structs_strict_extra_col(spark):
    f = Frame(spark.createDataFrame([("a", 1.0, 9)], "name string, mean_score double, extra int"))
    try:
        write_structs(f, Score, strict=True)
        raise AssertionError("expected strict error")
    except KeyError as e:
        assert "extra" in str(e)


def test_write_mock_csv_deterministic():
    src = "name,score\nalice,1.5\nbob,2.5\n"
    a = write_mock_csv(src, 5, seed=1)
    b = write_mock_csv(src, 5, seed=1)
    assert a == b
    assert a.splitlines()[0] == "name,score"
    assert len(a.splitlines()) == 6


def test_transpose_small(spark):
    f = Frame(
        spark.createDataFrame([("r1", 1.0, 2.0), ("r2", 3.0, 4.0)], "k string, a double, b double"),
        labels=["k"],
    )
    t = f.transpose()
    assert t.labels == ["name"]
    rows = {r["name"]: (r["r1"], r["r2"]) for r in t.df.collect()}
    assert rows["a"] == ("1.0", "3.0") and rows["b"] == ("2.0", "4.0")


def test_transpose_cap(spark):
    f = Frame(spark.range(100).withColumnRenamed("id", "v"))
    try:
        f.transpose(max_rows=10)
        raise AssertionError("expected cap error")
    except ValueError as e:
        assert "small-data" in str(e)


def test_promote_to_col_level(spark):
    f = Frame(
        spark.createDataFrame(
            [("2024", "east", 1.0), ("2024", "west", 2.0), ("2025", "east", 3.0)],
            "year string, region string, amount double",
        ),
        labels=["year", "region"],
    )
    out = f.promote_to_col_level("region", "amount")
    assert sorted(out.columns) == ["amount|east", "amount|west", "year"]
    rows = {r.year: (r["amount|east"], r["amount|west"]) for r in out.df.collect()}
    assert rows["2024"] == (1.0, 2.0) and rows["2025"] == (3.0, None)


def test_make_multilevel_labels(spark):
    f = reshape.make_multilevel_labels(spark, {"year": ["2024", "2025"], "qtr": ["q1", "q2"]})
    assert f.df.count() == 4
    assert f.labels == ["year", "qtr"]


def test_concat_series(spark):
    base = Frame(spark.createDataFrame([("a",), ("b",)], "k string"), labels=["k"])
    s1 = Frame(spark.createDataFrame([("a", 1.0)], "k string, x double"), labels=["k"])
    s2 = Frame(spark.createDataFrame([("b", 2.0)], "k string, y double"), labels=["k"])
    out = reshape.concat_series(base, s1, s2)
    rows = {r.k: (r.x, r.y) for r in out.df.collect()}
    assert rows == {"a": (1.0, None), "b": (None, 2.0)}


def test_agg_all_melted(spark):
    f = Frame(spark.createDataFrame([(1.0, 10.0), (3.0, 30.0)], "a double, b double"))
    out = f.agg_all(["sum", "mean"])
    rows = {r.column: (r.sum, r.mean) for r in out.df.collect()}
    assert rows == {"a": (4.0, 2.0), "b": (40.0, 20.0)}


def test_cube_rollup(spark):
    f = Frame(spark.createDataFrame([("x", "p", 1.0), ("y", "p", 2.0)], "k1 string, k2 string, v double"))
    cube_rows = f.cube(["k1", "k2"], s=F.sum("v")).df.count()
    rollup_rows = f.rollup(["k1", "k2"], s=F.sum("v")).df.count()
    assert cube_rows == 6  # (x,p),(y,p),(x,·),(y,·),(·,p),(·,·)
    assert rollup_rows == 5


def test_streaming_resample_tumbling(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    batch = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 00:50:00", "a", 2.0), ("2024-01-01 01:10:00", "a", 4.0)],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = stream_resample(stream, "ts", "1 hour", {"total": F.sum("v")}, keys=["k"])
    res = run_available_now(out, "t_resample")
    rows = {str(r.window_start): r.total for r in res.collect()}
    assert rows == {"2024-01-01 00:00:00": 3.0, "2024-01-01 01:00:00": 4.0}


def test_streaming_sliding(spark, tmp_path):
    src = str(tmp_path / "stream_src2")
    batch = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1.0), ("2024-01-01 00:40:00", 2.0)], "ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = stream_sliding_agg(stream, "ts", "1 hour", "30 minutes", {"total": F.sum("v")})
    res = run_available_now(out, "t_sliding")
    rows = {str(r.window_start): r.total for r in res.collect()}
    # 00:10 lands in windows starting 23:30 and 00:00; 00:40 in 00:00 and 00:30
    assert rows["2024-01-01 00:00:00"] == 3.0
    assert rows["2024-01-01 00:30:00"] == 2.0


def test_streaming_session(spark, tmp_path):
    src = str(tmp_path / "stream_src3")
    batch = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "a", 1.0),
            ("2024-01-01 00:03:00", "a", 2.0),  # within 5-min gap → same session
            ("2024-01-01 00:20:00", "a", 4.0),  # gap > 5 min → new session
            ("2024-01-01 00:01:00", "b", 8.0),
        ],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = stream_session_agg(stream, "ts", "5 minutes", {"total": F.sum("v")}, keys=["k"])
    res = run_available_now(out, "t_session")
    rows = {(r.k, str(r.window_start)): r.total for r in res.collect()}
    assert rows == {
        ("a", "2024-01-01 00:00:00"): 3.0,
        ("a", "2024-01-01 00:20:00"): 4.0,
        ("b", "2024-01-01 00:01:00"): 8.0,
    }


def test_interface_records_roundtrip(spark):
    from tada_spark.sources import read_interface_records

    f = read_interface_records(
        spark, [{"name": "alice", "score": 1.5}, {"name": "bob", "score": None}], labels=["name"]
    )
    assert f.labels == ["name"]
    rows = {r.name: r.score for r in f.df.collect()}
    assert rows == {"alice": 1.5, "bob": None}


def test_drop_cols(spark):
    from tada_spark.frame import Frame

    f = Frame(spark.createDataFrame([(1, 2.0, "x")], "a long, b double, c string"))
    assert f.drop_cols("b").columns == ["a", "c"]


def test_bucketed_join_no_shuffle(spark):
    from tada_spark.sources import read_table, write_bucketed

    left = Frame(
        spark.createDataFrame([(i, float(i)) for i in range(100)], "k long, v double")
    )
    right = Frame(
        spark.createDataFrame([(i, f"n{i}") for i in range(100)], "k long, name string")
    )
    write_bucketed(left, "t_buck_l", bucket_by=["k"], n_buckets=4, sort_by=["k"])
    write_bucketed(right, "t_buck_r", bucket_by=["k"], n_buckets=4, sort_by=["k"])
    try:
        l, r = read_table(spark, "t_buck_l"), read_table(spark, "t_buck_r")
        joined = l.to_df().hint("merge").join(r.to_df(), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketing replaces the shuffle
        assert joined.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_buck_l")
        spark.sql("DROP TABLE IF EXISTS t_buck_r")


def test_streaming_interval_join(spark, tmp_path):
    from tada_spark.streaming import stream_interval_join

    lsrc, rsrc = str(tmp_path / "ssj_l"), str(tmp_path / "ssj_r")
    clicks = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"), ("u2", "2024-01-01 03:00:00")], "u string, cts string"
    ).withColumn("cts", F.col("cts").cast("timestamp"))
    buys = spark.createDataFrame(
        [("u1", "2024-01-01 00:30:00"), ("u2", "2024-01-01 09:00:00")], "u string, bts string"
    ).withColumn("bts", F.col("bts").cast("timestamp"))
    clicks.write.parquet(lsrc)
    buys.write.parquet(rsrc)
    ls = spark.readStream.schema(clicks.schema).parquet(lsrc)
    rs = spark.readStream.schema(buys.schema).parquet(rsrc)
    out = stream_interval_join(ls, rs, keys=["u"], left_ts="cts", right_ts="bts", max_delay="1 hour")
    q = (
        out.writeStream.format("memory").queryName("t_ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = [(r["u"], str(r.bts)) for r in spark.table("t_ssj").collect()]
    # u1's buy is 30 min after the click → joins; u2's is 6 h later → doesn't
    assert rows == [("u1", "2024-01-01 00:30:00")]


def test_streaming_exactly_once_restart(spark, tmp_path):
    """Checkpointed file sink: re-running the same stream over the same
    input after a 'restart' emits no duplicate rows (exactly-once)."""
    src = str(tmp_path / "eo_src")
    sink = str(tmp_path / "eo_sink")
    ckpt = str(tmp_path / "eo_ckpt")
    batch = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    batch.write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    run_once()  # restart over identical input: checkpoint skips it
    assert spark.read.parquet(sink).count() == 2


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned parquet + a date filter ⇒ the scan plans with
    partition pruning (only matching directories read) — the layout
    lever that turns a 100 TB scan into a 1-day scan."""
    path = str(tmp_path / "events_by_day")
    df = spark.createDataFrame(
        [("2024-01-01", 1.0), ("2024-01-01", 2.0), ("2024-01-02", 3.0)], "day string, v double"
    )
    df.write.partitionBy("day").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("day") == "2024-01-01")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-01" in plan
    assert scan.count() == 2


# ---------------------------------------------------------------------------
# JSONL file source/sink + streaming parquet sink
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, None), (3, "gamma", -2.0)],
        "id long, name string, score double",
    )
    out = str(tmp_path / "docs.jsonl")
    Frame(df).write_jsonl(out)
    back = Frame.read_jsonl(spark, out, schema="id long, name string, score double")
    rows = {r.id: (r.name, r.score) for r in back.df.collect()}
    assert rows == {1: ("alpha", 1.5), 2: (None, None), 3: ("gamma", -2.0)}


def test_jsonl_inferred_schema(spark, tmp_path):
    out = str(tmp_path / "infer.jsonl")
    spark.createDataFrame([(7, "x")], "k long, v string").write.json(out)
    back = Frame.read_jsonl(spark, out)
    assert back.df.count() == 1 and set(back.df.columns) == {"k", "v"}


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    from tada_spark.streaming import stream_to_parquet

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.parquet(src)

    stream = spark.readStream.schema("id long, v long").parquet(src)
    out = stream.filter(F.col("id") % 2 == 0)
    stream_to_parquet(out, sink, ckpt)
    assert spark.read.parquet(sink).count() == 50

    # second invocation with the SAME checkpoint: no new input files,
    # so nothing is appended (exactly-once per input file)
    stream2 = spark.readStream.schema("id long, v long").parquet(src)
    stream_to_parquet(stream2.filter(F.col("id") % 2 == 0), sink, ckpt)
    assert spark.read.parquet(sink).count() == 50

    # new file arrives -> only IT is processed on the next run
    spark.range(100, 120).selectExpr("id", "id * 2 AS v").write.mode("append").parquet(src)
    stream3 = spark.readStream.schema("id long, v long").parquet(src)
    stream_to_parquet(stream3.filter(F.col("id") % 2 == 0), sink, ckpt)
    assert spark.read.parquet(sink).count() == 60
