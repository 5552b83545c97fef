"""Tests: stateful streaming, label-aligned combine, IVF ANN."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tada_spark.frame import Frame
from tada_spark.functions import similarity
from tada_spark.streaming.stateful import running_totals
from tada_spark.streaming.windows import run_available_now


def test_combine_label_aligned_divide(spark):
    a = Frame(spark.createDataFrame([("x", 10.0), ("y", 6.0)], "k string, va double"), labels=["k"])
    b = Frame(spark.createDataFrame([("x", 2.0), ("z", 3.0)], "k string, vb double"), labels=["k"])
    out = {r.k: r.result for r in a.combine(b, "/", left_col="va", right_col="vb").df.collect()}
    assert out == {"x": 5.0, "y": None}  # unmatched label ⇒ null


def test_combine_ignore_nulls_add(spark):
    a = Frame(spark.createDataFrame([("x", 1.0), ("y", 2.0)], "k string, va double"), labels=["k"])
    b = Frame(spark.createDataFrame([("x", 10.0)], "k string, vb double"), labels=["k"])
    out = {r.k: r.result for r in a.combine(b, "+", left_col="va", right_col="vb", ignore_nulls=True).df.collect()}
    assert out == {"x": 11.0, "y": 2.0}  # missing right treated as 0


def test_filter_index(spark):
    f = Frame(spark.createDataFrame([(0, 5.0), (1, 50.0), (2, 7.0)], "idx long, v double"))
    out = sorted(r.position for r in f.filter_index(F.col("v") > 6, order_by=["idx"]).df.collect())
    assert out == [1, 2]


def test_ivf_topk_recall_vs_brute_force(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 3)
    centroids = df.filter(F.col("vec_id") % 10 == 0)
    exact = similarity.cosine_topk(df, queries, k=3)
    approx = similarity.ivf_topk(df, queries, centroids, k=3, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # ANN: probe-limited recall; with 6 lists and nprobe=3 expect >= 50% overlap
    assert len(e & a) >= len(e) // 2
    assert all(r.rank <= 3 for r in approx.collect())


def test_running_totals_stateful_stream(spark, tmp_path):
    src = str(tmp_path / "stateful_src")
    batch = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = running_totals(stream, "k", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.key: (r.n_events, r.total) for r in spark.table("t_stateful").collect()}
    assert rows == {"a": (2, 3.0), "b": (1, 10.0)}


def test_kmeans_quantized_separates_planted_clusters(spark):
    """Two well-separated planted blobs end in two distinct clusters,
    assignments deterministic: with k=2 init on the first two vectors
    (one in each blob), the blob memberships are recovered exactly."""
    from tada_spark.functions.similarity import kmeans_quantized

    blob_a = [1.0, 1.0, 0.0]
    blob_b = [-1.0, -1.0, 0.0]
    rows = []
    for i in range(6):
        base = blob_a if i % 2 == 0 else blob_b  # vec 0 in A, vec 1 in B
        rows.append((i, [x + 0.01 * i for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.cluster for r in kmeans_quantized(df, k=2, iters=2).collect()}
    assert {got[i] for i in (0, 2, 4)} == {0}
    assert {got[i] for i in (1, 3, 5)} == {1}


def test_running_totals_across_micro_batches(spark, tmp_path):
    """State must persist ACROSS micro-batches, not just within one:
    three source files at maxFilesPerTrigger=1 become three batches
    (proved via recentProgress), and the final update-mode rows carry
    the accumulated totals."""
    src = str(tmp_path / "mb_src")
    b1 = spark.createDataFrame([("a", 1.0), ("b", 10.0)], "k string, v double")
    b2 = spark.createDataFrame([("a", 2.0)], "k string, v double")
    b3 = spark.createDataFrame([("a", 4.0), ("b", 20.0)], "k string, v double")
    b1.write.parquet(src)
    b2.write.mode("append").parquet(src)
    b3.write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals(stream, "k", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("t_mb_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "source did not split into micro-batches"
    # update mode re-emits per batch: the LAST row per key is the state
    rows = spark.table("t_mb_totals").collect()
    last = {}
    for r in rows:
        last[r.key] = (r.n_events, r.total)
    assert last == {"a": (3, 7.0), "b": (2, 30.0)}


def test_ewma_cross_batch_arrival_semantics(spark, tmp_path):
    """Pins the documented cross-batch contract: WITHIN a batch rows
    fold in event-time order, ACROSS batches in arrival order (state
    cannot reorder history) — a late row in batch 2 folds last."""
    import datetime
    import math

    from tada_spark.streaming.stateful import ewma_scores, fold_ewma

    import time

    t0 = datetime.datetime(2024, 1, 1)
    src = str(tmp_path / "mb_ewma")
    schema = "user_id long, ts timestamp, event_id long, value double"
    b1 = spark.createDataFrame(
        [(7, t0 + datetime.timedelta(seconds=2), 2, 8.0),
         (7, t0 + datetime.timedelta(seconds=1), 1, 4.0)], schema)
    b2 = spark.createDataFrame([(7, t0, 0, 100.0)], schema)  # late arrival
    # one file per intended batch + distinct mtimes: the file source
    # orders batches by modification time, so same-second multi-part
    # writes would arrive in arbitrary order
    b1.coalesce(1).write.parquet(src)
    time.sleep(1.2)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ewma_scores(stream, "user_id", "value", "ts", "event_id", alpha=0.25)
    q = (
        out.writeStream.format("memory")
        .queryName("t_mb_ewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_mb_ewma").collect()
    final = rows[-1]
    # batch 1 sorts to [4, 8]; the late 100 folds AFTER despite ts 0
    s, n = fold_ewma((None, 0), [4.0, 8.0, 100.0], alpha=0.25)
    assert (final.n_events, final.ewma_e6) == (n, math.floor(s * 1e6 + 0.5))
