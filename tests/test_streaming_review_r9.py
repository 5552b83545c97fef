"""Regression pins for the round-9 streaming/sampling/rotation review.

Third targeted review pass: NULL keys/timestamps crashed (int(None)) or
corrupted (NaT→int64 MIN) the stateful streaming operators while their
oracles filter them; running_totals accumulated raw doubles in
nondeterministic chunk order; a NULL weight hijacked the weighted
samplers through Spark's NULLS FIRST asc(); stream_interval_join
emitted duplicate join-key columns; and a corrupt CORRECTNESS artifact
was silently skipped by the rotation accounting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _run_stream(out, name, timeout=120, mode="update"):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout)
    return name


def test_session_stats_survives_null_keys_and_ts(spark, tmp_path):
    from tada_spark.streaming.stateful import session_stats

    src = str(tmp_path / "sess_src")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (None, "2024-01-01 00:10:00"), (2, None)],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    # before: the NULL-key group reached int(None) and killed the query;
    # a NULL ts became int64 MIN and exploded span_seconds
    name = _run_stream(session_stats(stream, "user_id", "ts", gap_s=1800), "t_sess_null")
    rows = {r.user_id: r.n_events for r in spark.table(name).collect()}
    assert rows == {1: 1}


def test_pattern_within_survives_null_keys_and_ts(spark, tmp_path):
    from tada_spark.streaming.stateful import pattern_within

    src = str(tmp_path / "pat_src")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "click"),
            (1, "2024-01-01 00:10:00", "purchase"),
            (None, "2024-01-01 00:20:00", "purchase"),
            (2, None, "purchase"),
        ],
        "user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    name = _run_stream(
        pattern_within(
            stream, "user_id", "ts", "event_type",
            first="click", then="purchase", within_s=3600,
        ),
        "t_pat_null",
    )
    rows = {r.user_id: (r.n_then, r.n_matched) for r in spark.table(name).collect()}
    assert rows == {1: (1, 1)}


def test_running_totals_integer_accumulation_and_null_values(spark, tmp_path):
    from tada_spark.streaming.stateful import running_totals

    src = str(tmp_path / "run_src")
    df = spark.createDataFrame(
        [(1, 0.1), (1, 0.2), (1, None), (2, 5.0)], "user_id long, value double"
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    name = _run_stream(running_totals(stream, "user_id", "value"), "t_run_int")
    rows = {r.key: (r.n_events, r.total) for r in spark.table(name).collect()}
    # 0.1 + 0.2 in e6 integer units is EXACTLY 0.3 (raw double += gives
    # 0.30000000000000004); NULL values count as absent
    assert rows == {"1": (2, 0.3), "2": (1, 5.0)}


def test_weighted_sample_null_weight_ranks_last(spark):
    from tada_spark.functions.sampling import weighted_sample, weighted_sample_per_group

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, None)], "doc_id long, w double"
    )
    # before: the NULL-weight row's NULL priority sorted FIRST under
    # bare asc() and hijacked the sample every run
    win = {r.doc_id for r in weighted_sample(df, F.col("w"), 2, key="doc_id").collect()}
    assert win == {1, 2}
    g = df.withColumn("grp", F.lit("g"))
    win2 = {
        r.doc_id
        for r in weighted_sample_per_group(g, "grp", F.col("w"), 2, key="doc_id").collect()
    }
    assert win2 == {1, 2}


def test_stream_interval_join_single_key_column(spark, tmp_path):
    from tada_spark.streaming import stream_interval_join

    lsrc, rsrc = str(tmp_path / "sij_l"), str(tmp_path / "sij_r")
    left = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00")], "u string, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 00:30:00")], "u string, rts string"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    left.write.parquet(lsrc)
    right.write.parquet(rsrc)
    ls = spark.readStream.schema(left.schema).parquet(lsrc)
    rs = spark.readStream.schema(right.schema).parquet(rsrc)
    out = stream_interval_join(ls, rs, keys=["u"], left_ts="lts", right_ts="rts")
    # before: two 'u' columns — every later by-name reference ambiguous
    assert out.columns == ["u", "lts", "rts"]
    out.select("u")  # must not raise AMBIGUOUS_REFERENCE


def test_rotation_surfaces_unreadable_artifacts(tmp_path):
    import json

    from tada_spark.queries import CATALOG
    from tada_spark.rotation import freshness_report, narrative

    good = {"q1_pricing_summary": {
        "err": None, "rows_match": True, "schema_match": True, "hash_match": True}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_r02.json").write_text("{truncated...")
    rep = freshness_report(CATALOG, tmp_path)
    # before: the corrupt file was silently skipped — round 2's greens
    # quietly reclassified as never-green with no trace
    assert rep["unreadable_artifacts"] == ["CORRECTNESS_r02.json"]
    assert "WARNING: unreadable artifact" in narrative(CATALOG, tmp_path)


def test_length_bucket_uses_canonical_token_count(spark):
    # the inline re-implementation is gone; both paths must agree on
    # the awkward inputs (empty, whitespace-only, NULL)
    from tada_spark.functions.sampling import length_bucket_batches

    df = spark.createDataFrame(
        [(1, 0, "a b c"), (2, 0, ""), (3, 0, "   "), (4, 0, None)],
        "doc_id long, shard long, text string",
    )
    out = length_bucket_batches(df, text_col="text", id_col="doc_id", shard_col="shard")
    assert out.count() > 0  # plan builds and runs on the edge inputs
