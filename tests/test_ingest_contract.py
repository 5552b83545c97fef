"""Ingest contract: the loaded schema of every testdata table, for any
parquet timestamp encoding the driver may regenerate with.

Round 2 regression class: the driver re-encoded testdata from
timestamp[ns] to naive timestamp[us]; Spark reads the latter as
TIMESTAMP_NTZ and three operators (range_join, duration-resample,
streaming ingest) broke while 132 unit tests stayed green — because no
test ever read the real files. These tests pin the contract:

  * every time-carrying column loads as a TIMESTAMP family (never a
    leaked long from the nanosAsLong shim),
  * the loaded family agrees with the file's pyarrow encoding
    (tz None -> NTZ, tz set -> LTZ; ns -> shimmed micros LTZ),
  * the streaming reader produces the SAME ts dtype as the batch
    reader (round 2's silent /1000 corruption),
  * family-preserving operators (resample week/duration, range_join)
    accept both families and keep the input family.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tada_spark.frame import Frame
from tada_spark.plans.timeutil import parquet_time_columns, ts_family

from conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize("table", TABLES)
def test_loaded_schema_matches_file_encoding(spark, table):
    path = f"{SF_DIR}/{table}.parquet"
    fr = Frame.read_parquet(spark, path)
    loaded = {f.name: f.dataType for f in fr.df.schema.fields}
    for name, (unit, tz) in parquet_time_columns(path).items():
        got = loaded[name]
        assert not isinstance(got, T.LongType), (
            f"{table}.{name}: nanosAsLong leaked a raw long into the frame"
        )
        if unit == "ns":
            # ns shim rebuilds micros-truncated LTZ timestamps
            assert ts_family(got) == "ltz", (table, name, got)
        else:
            want = "ltz" if tz else "ntz"
            assert ts_family(got) == want, (
                f"{table}.{name}: file is {unit}/tz={tz} but loaded {got}"
            )


def test_stream_reader_matches_batch_reader(spark):
    """The streaming ingest must agree with batch on BOTH dtype and
    values — round 2's /1000 corruption kept the dtype right while
    landing every event in January 1970."""
    from tada_spark.queries import _stream_events
    from tada_spark.streaming.windows import run_available_now

    batch = Frame.read_parquet(spark, f"{SF_DIR}/events.parquet").df
    stream = _stream_events(spark, SF_DIR)
    assert stream.schema["ts"].dataType == batch.schema["ts"].dataType
    got = run_available_now(
        stream.select("event_id", "ts"), "q_ingest_contract", output_mode="append"
    )
    s_min, s_max = got.agg(F.min("ts"), F.max("ts")).first()
    b_min, b_max = batch.agg(F.min("ts"), F.max("ts")).first()
    assert (s_min, s_max) == (b_min, b_max)


def _two_family_frames(spark):
    """One tiny frame per timestamp family, same wall-clock values."""
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i)) for i in range(5)]
    ntz = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("ts", T.TimestampNTZType()),
            ]
        ),
    )
    ltz = ntz.withColumn("ts", F.col("ts").cast("timestamp"))
    return {"ntz": ntz, "ltz": ltz}


@pytest.mark.parametrize("family", ["ntz", "ltz"])
def test_resample_preserves_family(spark, family):
    df = _two_family_frames(spark)[family]
    fr = Frame(df)
    for kwargs in (
        {"by": "duration", "duration_seconds": 2},
        {"by": "week"},
        {"by": "day"},
    ):
        out = fr.resample("ts", as_col="bucket", **kwargs)
        assert ts_family(out.dtype("bucket")) == family, (kwargs, out.dtype("bucket"))


@pytest.mark.parametrize("family", ["ntz", "ltz"])
def test_range_join_accepts_family(spark, family):
    from tada_spark.operators.interval import range_join

    df = _two_family_frames(spark)[family]
    right = df.select(
        F.col("id").alias("rid"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("end"),
    )
    out = range_join(
        df, right, left_ts="ts", right_start="start", right_end="end", bucket_s=2
    )
    # each ts matches its own [t, t+2s) and possibly the prior row's
    assert out.count() >= 5


@pytest.mark.parametrize("family", ["ntz", "ltz"])
def test_stream_resample_preserves_family(spark, family):
    from tada_spark.streaming.windows import stream_resample

    df = _two_family_frames(spark)[family]
    out = stream_resample(df, "ts", "2 seconds", {"n": F.count("*")})
    assert ts_family(out.schema["window_start"].dataType) == family
    assert out.count() == 3  # 0-2, 2-4, 4-6


def test_ns_encoded_parquet_roundtrip(spark, tmp_path):
    """The driver wrote timestamp[ns] parquet in round 1 and naive us in
    round 2+ — if it flips back, the ns shim must still produce working
    micros-truncated timestamps on BOTH the batch and streaming paths."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-06-01T00:00:00", "ns")
    ts = base + np.arange(10) * np.timedelta64(90, "m") + np.timedelta64(123456789, "ns")
    table = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array([i % 3 for i in range(10)], pa.int64()),
            "event_type": pa.array(["click"] * 10),
            "value": pa.array([float(i) for i in range(10)]),
            "props": pa.array(["{}"] * 10),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    batch = Frame.read_parquet(spark, str(tmp_path / "events.parquet"))
    got = batch.df.schema["ts"].dataType
    assert ts_family(got) == "ltz", got  # ns shim rebuilds micros LTZ
    lo, hi = batch.df.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year == 2024 and hi - lo == dt.timedelta(minutes=90 * 9)

    from tada_spark.queries import _stream_events
    from tada_spark.streaming.windows import run_available_now

    stream = _stream_events(spark, str(tmp_path))
    res = run_available_now(
        stream.select("event_id", "ts"), "q_ns_roundtrip", output_mode="append"
    )
    s_lo, s_hi = res.agg(F.min("ts"), F.max("ts")).first()
    assert (s_lo, s_hi) == (lo, hi)  # stream == batch, micros-truncated


def test_read_parquet_int96_legacy_encoding(spark, tmp_path):
    """Legacy Hive/Spark INT96 timestamps: pyarrow reports unit='ns',
    but Spark reads them natively as TIMESTAMP — the ns shim must not
    fire (a 100 TB lake mixes INT96 files in from old producers)."""
    from pyspark.sql import functions as F

    from tada_spark.frame import Frame

    p = str(tmp_path / "int96")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.range(0, 3).select(
            "id", F.timestamp_seconds(F.col("id") * 3600).alias("ts")
        ).write.parquet(p)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    f = Frame.read_parquet(spark, p)
    rows = {r.id: r.ts for r in f.df.collect()}
    assert len(rows) == 3
    assert rows[2].hour == 2  # values intact, no double conversion


def test_read_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: older files lack a newer column; merge_schema
    loads the superset with per-file null fill."""
    from tada_spark.frame import Frame

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    f = Frame.read_parquet(spark, p, merge_schema=True)
    assert set(f.df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in f.df.collect()}
    assert rows == {1: None, 2: 9.5}  # old file's missing column null-fills


def test_merge_schema_with_late_nanos_column(spark, tmp_path):
    """Schema evolution where only the NEWER file carries a nanos
    timestamp: the ns shim must engage from the fragment union (the
    dataset-level schema samples the first fragment and would miss it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tada_spark.frame import Frame

    p = tmp_path / "evolve_ns"
    p.mkdir()
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), p / "a_old.parquet")
    pq.write_table(
        pa.table({
            "id": pa.array([2], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
        }),
        p / "b_new.parquet",
    )
    f = Frame.read_parquet(spark, str(p), merge_schema=True)
    rows = {r.id: r.ts for r in f.df.collect()}
    assert rows[1] is None
    assert rows[2] is not None and rows[2].year == 2023  # ns -> µs truncated


def test_compact_rejects_in_place(spark, tmp_path):
    import pytest as _pytest

    from tada_spark.operators.layout import compact

    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with _pytest.raises(ValueError):
        compact(spark, src, src + "/", target_files=1)
