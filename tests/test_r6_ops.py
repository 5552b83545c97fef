"""Round-6 operators: bloom join pruning, A-ES weighted sampling,
token entropy, quantized PageRank, per-group OLS."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tada_spark.functions.dedup import pagerank_quantized
from tada_spark.functions.sampling import weighted_sample
from tada_spark.functions.stats import ols_by_group
from tada_spark.functions.text import token_entropy
from tada_spark.operators.bloomjoin import bloom_bitmap, bloom_prefilter
from tada_spark.plans.semantics import py_det_ln

# ---------------------------------------------------------------------------
# bloom join pruning
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_exactness(spark):
    dim = spark.createDataFrame([(k,) for k in range(0, 500, 7)], "k long")
    fact = spark.createDataFrame([(k, k % 13) for k in range(500)], "k long, v long")
    bm = bloom_bitmap(dim, "k")
    pre = bloom_prefilter(fact, "k", bm)
    pre_keys = {r.k for r in pre.collect()}
    dim_keys = {r.k for r in dim.collect()}
    # no false negatives: every dim key survives the prefilter
    assert dim_keys <= pre_keys
    # end-to-end: prefilter + exact semi-join == plain semi-join
    got = sorted(r.k for r in pre.join(dim, "k", "left_semi").collect())
    want = sorted(r.k for r in fact.join(dim, "k", "left_semi").collect())
    assert got == want


def test_bloom_bitmap_is_bounded_and_prunes(spark):
    dim = spark.createDataFrame([(k,) for k in range(32)], "k long")
    fact = spark.createDataFrame([(k,) for k in range(100_000)], "k long")
    bm_row = bloom_bitmap(dim, "k").collect()[0]
    # sparse map never exceeds m_bits/64 words; 32 keys * 4 hashes -> <=128
    assert len(bm_row["__bloom__"]) <= 128
    n_pass = bloom_prefilter(fact, "k", bloom_bitmap(dim, "k")).count()
    # fp rate with m=65536, k=4, n=32 is ~(128/65536)^4 -> essentially 0;
    # allow a generous bound: prefilter keeps ~dim-matched rows only
    assert n_pass <= 32 + 100


def test_bloom_prefilter_drops_null_keys(spark):
    dim = spark.createDataFrame([(1,)], "k long")
    fact = spark.createDataFrame([(1,), (None,)], "k long")
    assert bloom_prefilter(fact, "k", bloom_bitmap(dim, "k")).count() == 1


# ---------------------------------------------------------------------------
# weighted sampling (A-ES)
# ---------------------------------------------------------------------------


def _py_priority_e6(doc_id: int, w: float) -> int:
    import hashlib

    h = int(hashlib.md5(f"ws#{doc_id}".encode()).hexdigest()[:8], 16)
    u = ((h % 1048576) + 1) / 1048577.0
    return math.floor(((0.0 - py_det_ln(u)) / w) * 1e6 + 0.5)


def test_weighted_sample_matches_python_replica(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, (F.col("w")).cast("double"), 20).collect()
    want = sorted(
        ((_py_priority_e6(i, float(w)), i) for i, w in rows)
    )[:20]
    got = [(r.priority_e6, r.doc_id) for r in out]
    assert got == want


def test_weighted_sample_partition_invariant(spark):
    rows = [(i, i + 1) for i in range(500)]
    df1 = spark.createDataFrame(rows, "doc_id long, w long").repartition(1)
    df7 = spark.createDataFrame(rows, "doc_id long, w long").repartition(7)
    k = 25
    a = [(r.doc_id, r.priority_e6) for r in weighted_sample(df1, F.col("w").cast("double"), k).collect()]
    b = [(r.doc_id, r.priority_e6) for r in weighted_sample(df7, F.col("w").cast("double"), k).collect()]
    assert a == b


def test_weighted_sample_weights_bias_selection(spark):
    # one huge-weight row must essentially always be drawn at k=1..
    rows = [(i, 1) for i in range(100)] + [(999, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    top = weighted_sample(df, F.col("w").cast("double"), 1).collect()[0]
    assert top.doc_id == 999


# ---------------------------------------------------------------------------
# token entropy
# ---------------------------------------------------------------------------


def test_token_entropy_matches_python(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "x x y z"),
            (2, "a", "x y"),
            (3, "b", "q q q q"),
            (4, "b", "  "),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in token_entropy(df, "source", "text").collect()}
    # source a: counts x=3 y=2 z=1 (total 6)
    want_a = sum(
        math.floor((0.0 - (c / 6) * py_det_ln(c / 6)) * 1e6 + 0.5) for c in (3, 2, 1)
    )
    assert out["a"].entropy_e6 == want_a
    assert out["a"].n_terms == 3 and out["a"].total_tokens == 6
    # source b: single term -> p=1, ln(1)=0 exactly -> entropy 0
    assert out["b"].entropy_e6 == 0
    assert out["b"].n_terms == 1 and out["b"].total_tokens == 4


# ---------------------------------------------------------------------------
# quantized PageRank
# ---------------------------------------------------------------------------


def _py_pagerank(edges: list[tuple[int, int]], iters: int = 3, scale: int = 10**9):
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({a for a, _ in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in nodes}
    n = len(nodes)
    base = math.floor((scale * 15 // 100) / n)
    r = {v: math.floor(scale / n) for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for a, b in sym:
            inc[b] += math.floor(r[a] / deg[a])
        r = {v: base + math.floor((85 * inc[v]) / 100) for v in nodes}
    return r, deg


def test_pagerank_matches_python_replica(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.node: (r.pagerank_e9, r.deg) for r in pagerank_quantized(df).collect()}
    want_r, want_deg = _py_pagerank(edges)
    assert out == {v: (want_r[v], want_deg[v]) for v in want_r}
    # the hub (node 3, deg 3) outranks the leaf (node 4)
    assert out[3][0] > out[4][0]


def test_pagerank_rank_mass_bounded(spark):
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    total = sum(r.pagerank_e9 for r in pagerank_quantized(df).collect())
    # flooring only loses mass: total <= scale, and stays within 1%
    assert total <= 10**9
    assert total > 0.99 * 10**9


# ---------------------------------------------------------------------------
# per-group OLS
# ---------------------------------------------------------------------------


def test_ols_matches_closed_form(spark):
    rows = [("g", x, 3 * x + 7) for x in range(10)] + [("h", x, 100 - 2 * x) for x in (0, 5, 9)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r.grp: r for r in ols_by_group(df, "grp", F.col("x"), F.col("y")).collect()}
    assert out["g"].slope_e6 == 3_000_000 and out["g"].intercept_2dp == pytest.approx(7.0)
    assert out["h"].slope_e6 == -2_000_000 and out["h"].intercept_2dp == pytest.approx(100.0)
    assert out["g"].n == 10 and out["h"].n == 3


def test_ols_degenerate_group_yields_nulls(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 9), ("one", 3, 3)], "grp string, x long, y long"
    )
    out = {r.grp: r for r in ols_by_group(df, "grp", F.col("x"), F.col("y")).collect()}
    assert out["g"].slope_e6 is None and out["g"].intercept_2dp is None
    assert out["one"].slope_e6 is None


# ---------------------------------------------------------------------------
# KL divergence
# ---------------------------------------------------------------------------


def test_kl_divergence_matches_python(spark):
    from tada_spark.functions.text import kl_divergence

    df = spark.createDataFrame(
        [
            (1, "a", "x x y"),
            (2, "b", "x y y z"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in kl_divergence(df, "source", "text").collect()}
    # corpus: x=3 y=3 z=1 (T=7); a: x=2 y=1 (t=3); b: x=1 y=2 z=1 (t=4)
    def kl(counts, t, corpus, tc):
        return sum(
            math.floor(
                ((n / t) * (py_det_ln(n / t) - py_det_ln(corpus[term] / tc))) * 1e6 + 0.5
            )
            for term, n in counts.items()
        )

    corpus = {"x": 3, "y": 3, "z": 1}
    assert out["a"].kl_e6 == kl({"x": 2, "y": 1}, 3, corpus, 7)
    assert out["b"].kl_e6 == kl({"x": 1, "y": 2, "z": 1}, 4, corpus, 7)
    assert out["a"].total_tokens == 3 and out["b"].total_tokens == 4
    # a group identical to the corpus has KL ~ 0; skewed groups > 0
    assert out["a"].kl_e6 > 0 and out["b"].kl_e6 > 0


# ---------------------------------------------------------------------------
# A/B chi-square
# ---------------------------------------------------------------------------


def test_ab_chi2_matches_python(spark):
    import hashlib

    from tada_spark.queries import ab_chi2_events, load

    # real sf0.001 data: every user converts (b = d = 0) -> the
    # degenerate-margin guard must yield NULL, not a division blowup
    row = ab_chi2_events(spark, "/root/testdata/sf0.001").collect()[0]
    ev = load(spark, "/root/testdata/sf0.001", "events").to_df()
    per_user = {}
    for r in ev.select("user_id", "event_type").collect():
        per_user[r.user_id] = max(per_user.get(r.user_id, 0), int(r.event_type == "purchase"))
    cells = {"a": 0, "b": 0, "c": 0, "d": 0}
    for uid, conv in per_user.items():
        arm = int(hashlib.md5(f"ab#{uid}".encode()).hexdigest()[:8], 16) % 2
        cells["abcd"[arm * 2 + (1 - conv)]] += 1
    a, b, c, d = cells["a"], cells["b"], cells["c"], cells["d"]
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    den = (float(a + b) * float(c + d)) * float(a + c) * float(b + d)
    if den == 0:
        assert row.chi2_e6 is None
    else:
        want = math.floor(
            (float(a + b + c + d) * (float(a * d - b * c) * float(a * d - b * c))) / den * 1e6
            + 0.5
        )
        assert row.chi2_e6 == want


def test_ab_chi2_statistic_on_synthetic_contingency(spark):
    import hashlib

    from tada_spark.queries import ab_chi2_events

    # build a user universe with non-degenerate margins: converted iff
    # uid % 3 == 0 (purchase event), others only view
    rows = []
    for uid in range(200):
        rows.append((uid, uid * 2, "purchase" if uid % 3 == 0 else "view"))
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), f"ab_chi2_events_{spark.sparkContext.applicationId}")
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    df.withColumn("ts", F.current_timestamp()).withColumn("value", F.lit(1.0)).withColumn(
        "props", F.lit("{}")
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    row = ab_chi2_events(spark, d).collect()[0]
    cells = {"a": 0, "b": 0, "c": 0, "d": 0}
    for uid in range(200):
        conv = int(uid % 3 == 0)
        arm = int(hashlib.md5(f"ab#{uid}".encode()).hexdigest()[:8], 16) % 2
        cells["abcd"[arm * 2 + (1 - conv)]] += 1
    a, b, c, d2 = cells["a"], cells["b"], cells["c"], cells["d"]
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d2)
    den = (float(a + b) * float(c + d2)) * float(a + c) * float(b + d2)
    want = math.floor(
        (float(a + b + c + d2) * (float(a * d2 - b * c) * float(a * d2 - b * c))) / den * 1e6
        + 0.5
    )
    assert row.chi2_e6 == want
    # uid%3 conversion is independent of md5-parity arms: chi2 stays small
    assert row.chi2_e6 < 4_000_000  # chi2 < 4 at df=1 (no real effect)


def test_corr_matches_closed_form(spark):
    from tada_spark.functions.stats import corr_by_group

    rows = (
        [("pos", x, 2 * x + 1) for x in range(8)]          # r = +1
        + [("neg", x, 50 - 3 * x) for x in range(8)]        # r = -1
        + [("flat", x, 7) for x in range(8)]                # zero y-variance
    )
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r.grp: r for r in corr_by_group(df, "grp", F.col("x"), F.col("y")).collect()}
    assert out["pos"].corr_e6 == 1_000_000
    assert out["neg"].corr_e6 == -1_000_000
    assert out["flat"].corr_e6 is None
    # a noisy-but-positive relationship lands strictly between 0 and 1
    rows2 = [("m", x, x + (7 * x) % 5) for x in range(50)]
    df2 = spark.createDataFrame(rows2, "grp string, x long, y long")
    r = corr_by_group(df2, "grp", F.col("x"), F.col("y")).collect()[0].corr_e6
    assert 0 < r < 1_000_000


# ---------------------------------------------------------------------------
# null-hygiene contracts (r6 hardening)
# ---------------------------------------------------------------------------


def test_ols_and_corr_exclude_null_rows_from_n(spark):
    from tada_spark.functions.stats import corr_by_group

    rows = [("g", 0, 1), ("g", 1, 3), ("g", 2, 5), ("g", None, 99), ("g", 3, None)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    o = ols_by_group(df, "grp", F.col("x"), F.col("y")).collect()[0]
    # nulls dropped entirely: n=3 and the fit is the clean y=2x+1
    assert o.n == 3 and o.slope_e6 == 2_000_000
    c = corr_by_group(df, "grp", F.col("x"), F.col("y")).collect()[0]
    assert c.n == 3 and c.corr_e6 == 1_000_000


def test_weighted_sample_drops_null_keys(spark):
    df = spark.createDataFrame(
        [(None, 1_000_000), (1, 5), (2, 5)], "doc_id long, w long"
    )
    got = weighted_sample(df, F.col("w").cast("double"), 3).collect()
    assert sorted(r.doc_id for r in got) == [1, 2]


def test_bloom_empty_dim_drops_everything(spark):
    dim = spark.createDataFrame([], "k long")
    fact = spark.createDataFrame([(1,), (2,)], "k long")
    assert bloom_prefilter(fact, "k", bloom_bitmap(dim, "k")).count() == 0


# ---------------------------------------------------------------------------
# ORC + binaryFile sources (r6 IO completeness)
# ---------------------------------------------------------------------------


def test_orc_roundtrip(spark, tmp_path):
    from tada_spark.frame import Frame

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.25)], "k long, s string, v double"
    )
    p = str(tmp_path / "orc_rt")
    Frame(df).write_orc(p)
    back = Frame.read_orc(spark, p).df
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert dict(back.dtypes) == dict(df.dtypes)


def test_binary_files_source_feeds_multimodal_shape(spark, tmp_path):
    from tada_spark.frame import Frame

    (tmp_path / "m").mkdir()
    payloads = {"a.bin": b"\x00\x01\x02", "b.bin": b"hello", "c.txt": b"skip-me"}
    for name, blob in payloads.items():
        (tmp_path / "m" / name).write_bytes(blob)
    f = Frame.read_binary_files(spark, str(tmp_path / "m"), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content)) for r in f.df.collect()}
    assert rows == {"a.bin": (3, b"\x00\x01\x02"), "b.bin": (5, b"hello")}
    # the (media_id, payload) projection the multimodal decoders consume
    proj = f.df.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("media_id"),
        F.col("content").alias("payload"),
    )
    assert proj.schema["payload"].dataType.typeName() == "binary"
    assert proj.count() == 2


def test_resize_area_gray8_exact_and_roundtrip(spark):
    import numpy as np

    from tada_spark.functions.multimodal import (
        encode_png_gray8,
        image_resize_features,
        png_decode_pixels,
        resize_area_gray8,
    )

    # 4x4 -> 2x2 by hand: each output = floor(mean of its 2x2 block)
    m = np.arange(16).reshape(4, 4)
    t = resize_area_gray8(m, 2)
    assert t.tolist() == [[(0 + 1 + 4 + 5) // 4, (2 + 3 + 6 + 7) // 4],
                          [(8 + 9 + 12 + 13) // 4, (10 + 11 + 14 + 15) // 4]]
    with pytest.raises(ValueError):
        resize_area_gray8(np.zeros((5, 4)), 2)

    # distributed pipeline: encode -> decode -> resize -> re-encode ->
    # decode-back identity, digest matches the python-side computation
    rows = [(7,), (8,)]
    df = spark.createDataFrame(rows, "media_id long")
    import pandas as pd

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": [
                    encode_png_gray8(8, 8, lambda x, y, m=int(mid): (m * 7 + x * 3 + y * 5) % 256,
                                     filter_type=2 if mid % 2 else 0)
                    for mid in pdf["media_id"]
                ],
            })

    pngs = df.mapInPandas(build, schema="media_id long, payload binary")
    out = {r.media_id: r for r in image_resize_features(pngs, factor=2).collect()}
    for mid in (7, 8):
        px = np.array([[(mid * 7 + x * 3 + y * 5) % 256 for x in range(8)] for y in range(8)])
        want = resize_area_gray8(px, 2)
        assert (out[mid].out_w, out[mid].out_h) == (4, 4)
        assert out[mid].pix_sum == int(want.sum())
    # sanity: the decoder really reproduces the formula pixels
    blob = encode_png_gray8(8, 8, lambda x, y: (7 * 7 + x * 3 + y * 5) % 256, filter_type=2)
    assert png_decode_pixels(blob)[:, :, 0].tolist() == [
        [(7 * 7 + x * 3 + y * 5) % 256 for x in range(8)] for y in range(8)
    ]


def test_weighted_sample_per_group_matches_python(spark):
    from tada_spark.functions.sampling import weighted_sample_per_group

    rows = [(i, "g" + str(i % 3), (i * 13) % 50 + 1) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    k = 5
    got = {}
    for r in weighted_sample_per_group(df, "grp", F.col("w").cast("double"), k).collect():
        got.setdefault(r.grp, []).append((r.priority_e6, r.doc_id))
    want = {}
    for i, g, w in rows:
        want.setdefault(g, []).append((_py_priority_e6(i, float(w)), i))
    for g in want:
        want[g] = sorted(want[g])[:k]
        assert sorted(got[g]) == want[g], g
