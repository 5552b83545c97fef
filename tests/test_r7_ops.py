"""Round-7 operator tests: period growth, gaps-and-islands, skyline,
PSI drift, SemDeDup, audio downsample, directional as-of joins —
known-answer cases on tiny literal frames (reference test model,
SURVEY §5)."""

from __future__ import annotations

import io
import math
import struct
import wave

from pyspark.sql import functions as F

from tada_spark.frame import Frame


# ---------------------------------------------------------------- stats


def test_period_growth_known(spark):
    from tada_spark.functions.stats import period_growth

    df = spark.createDataFrame(
        [("2024-01", 100), ("2024-01", 100), ("2024-02", 300), ("2024-03", 150)],
        "ym string, cents long",
    )
    rows = {
        r.bucket: (r.total_cents, r.growth_e6)
        for r in period_growth(df, F.col("ym"), F.col("cents")).collect()
    }
    assert rows["2024-01"] == (200, None)  # first period: no growth
    assert rows["2024-02"] == (300, 500000)  # +50%
    assert rows["2024-03"] == (150, -500000)  # -50%


def test_period_growth_prev_zero_and_nulls(spark):
    from tada_spark.functions.stats import period_growth

    df = spark.createDataFrame(
        [("a", 0), ("b", 50), (None, 99), ("c", None)],
        "p string, cents long",
    )
    rows = {r.bucket: r.growth_e6 for r in period_growth(df, F.col("p"), F.col("cents")).collect()}
    assert rows == {"a": None, "b": None}  # prev=0 -> NULL; null bucket/value dropped


def test_psi_identical_halves_is_zero(spark):
    from tada_spark.functions.stats import psi_drift

    # same value multiset in both halves of the timeline => p == q in
    # every bin => every contribution is exactly floor(0 + 0.5) = 0
    rows = [("g", float(v), 1_000_000 * i) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows += [("g", float(v), 1_000_000 * (i + 5)) for i, v in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "grp string, value double, us long")
    out = psi_drift(df, "grp", F.round(F.col("value") * 100), F.col("us")).collect()
    assert len(out) == 1 and out[0].psi_e6 == 0
    assert out[0].n_first == 5 and out[0].n_second == 5


def test_psi_detects_shift(spark):
    from tada_spark.functions.stats import psi_drift

    rows = [("g", 1.0, i) for i in range(10)] + [("g", 100.0, 10 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, value double, us long")
    out = psi_drift(df, "grp", F.round(F.col("value") * 100), F.col("us")).collect()
    assert out[0].psi_e6 > 1_000_000  # total mass swap: PSI >> 1


# ------------------------------------------------------------- intervals


def test_merge_intervals_known(spark):
    from tada_spark.operators.interval import merge_intervals

    df = spark.createDataFrame(
        [
            ("u", 0, 10),  # island 1: [0,15)
            ("u", 5, 15),
            ("u", 15, 20),  # touching (start == prev end) merges
            ("u", 30, 40),  # island 2
            ("v", 0, 5),  # other key: own island
        ],
        "k string, s long, e long",
    )
    out = merge_intervals(df, key_cols=["k"], start_col="s", end_col="e")
    got = sorted((r.k, r.island_start, r.island_end, r.n_intervals) for r in out.collect())
    assert got == [("u", 0, 20, 3), ("u", 30, 40, 1), ("v", 0, 5, 1)]


def test_merge_intervals_contained_and_duplicate(spark):
    from tada_spark.operators.interval import merge_intervals

    df = spark.createDataFrame(
        [("u", 0, 100), ("u", 10, 20), ("u", 10, 20), ("u", 100, 101)],
        "k string, s long, e long",
    )
    out = merge_intervals(df, key_cols=["k"], start_col="s", end_col="e").collect()
    assert [(r.island_start, r.island_end, r.n_intervals) for r in out] == [(0, 101, 4)]


# --------------------------------------------------------------- skyline


def test_pareto_frontier_known(spark):
    from tada_spark.operators.skyline import pareto_frontier_2d

    df = spark.createDataFrame(
        [
            (1, 10, 5),  # frontier (cheapest)
            (2, 20, 9),  # frontier (more y for more x)
            (3, 20, 7),  # dominated by 2 (same x, less y)
            (4, 30, 9),  # dominated by 2 (more x, same y)
            (5, 15, 5),  # dominated by 1 (more x, same y)
            (6, 40, 12),  # frontier
        ],
        "id long, x long, y long",
    )
    out = pareto_frontier_2d(df, "x", "y")
    assert sorted(r.id for r in out.collect()) == [1, 2, 6]


def test_pareto_duplicates_both_kept_and_partitioning_invariant(spark):
    from tada_spark.operators.skyline import pareto_frontier_2d

    rows = [(1, 10, 5), (2, 10, 5), (3, 50, 4)]
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, "id long, x long, y long").repartition(nparts)
        assert sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect()) == [1, 2]


# -------------------------------------------------------------- semdedup


def test_semdedup_prunes_higher_id_of_duplicate(spark):
    from tada_spark.functions.similarity import semdedup

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),  # exact duplicate of 1 -> pruned (higher id)
            (3, [0.0, 1.0]),  # orthogonal -> kept
            (4, None),  # null embedding dropped up front
            (5, [0.0, 0.0]),  # zero norm: never matches, kept
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r.kept for r in semdedup(df, k=2, tau_e6=990000).collect()}
    assert out == {1: True, 2: False, 3: True, 5: True}


def test_semdedup_threshold_boundary(spark):
    from tada_spark.functions.similarity import semdedup

    # cos(v1, v2) = 0.6 exactly on the integer grid
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8])],
        "vec_id long, embedding array<float>",
    )
    keep_all = semdedup(df, k=1, tau_e6=600001)
    assert all(r.kept for r in keep_all.collect())
    pruned = {r.vec_id: r.kept for r in semdedup(df, k=1, tau_e6=600000).collect()}
    assert pruned == {1: True, 2: False}


# ----------------------------------------------------------------- audio


def _wav(sr: int, ks: list[int]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(struct.pack("<%dh" % len(ks), *ks))
    return buf.getvalue()


def test_audio_downsample_known(spark):
    from tada_spark.functions.multimodal import audio_downsample

    ks = [100, 200, -100, -200, 300, 50, 7]  # odd tail sample dropped
    df = spark.createDataFrame(
        [(1, bytearray(_wav(8000, ks)))], "media_id long, payload binary"
    )
    r = audio_downsample(df, factor=2).collect()[0]
    assert (r.sample_rate_out, r.n_out) == (4000, 3)
    blocks = [(100 + 200) / 2, (-100 - 200) / 2, (300 + 50) / 2]
    rms = math.sqrt(sum((b / 32768.0) ** 2 for b in blocks) / 3)
    assert r.rms_out == math.floor(rms * 1e6 + 0.5) / 1e6


def test_audio_downsample_drops_undecodable_and_too_short(spark):
    from tada_spark.functions.multimodal import audio_downsample

    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav")), (2, bytearray(_wav(8000, [5])))],
        "media_id long, payload binary",
    )
    assert audio_downsample(df, factor=2).count() == 0


# ------------------------------------------------------- directional asof


def _asof_frames(spark):
    left = Frame(
        spark.createDataFrame(
            [(1, "u", 100), (2, "u", 205), (3, "u", 500), (4, "v", 100)],
            "id long, k string, t long",
        )
    )
    right = Frame(
        spark.createDataFrame(
            [("u", 90, "a"), ("u", 210, "b"), ("u", 300, "c")],
            "k string, t long, val string",
        )
    )
    return left, right


def test_asof_forward(spark):
    left, right = _asof_frames(spark)
    out = left.asof_join(
        right, on="t", by=["k"], value_cols=["val"], direction="forward"
    ).to_df()
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "b", 2: "b", 3: None, 4: None}


def test_asof_forward_tolerance(spark):
    left, right = _asof_frames(spark)
    out = left.asof_join(
        right, on="t", by=["k"], value_cols=["val"], direction="forward", tolerance_us=10
    ).to_df()
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: None, 2: "b", 3: None, 4: None}  # 100->210 gap 110 > 10


def test_asof_nearest_tie_breaks_backward(spark):
    left, right = _asof_frames(spark)
    # id=2 at t=205: backward 210? no - backward is 90 (gap 115)... actual:
    # right times 90, 210, 300. backward of 205 -> 90 (gap 115);
    # forward -> 210 (gap 5) => nearest picks forward.
    out = left.asof_join(
        right, on="t", by=["k"], value_cols=["val"], direction="nearest"
    ).to_df()
    got = {r.id: r.val for r in out.collect()}
    assert got[2] == "b" and got[1] == "a" and got[3] == "c"
    # exact tie: left at 150 is 60 from 90 and 60 from 210 -> backward wins
    lt = Frame(spark.createDataFrame([(9, "u", 150)], "id long, k string, t long"))
    tie = lt.asof_join(
        right, on="t", by=["k"], value_cols=["val"], direction="nearest"
    ).to_df()
    assert tie.collect()[0].val == "a"


def test_asof_backward_unchanged(spark):
    left, right = _asof_frames(spark)
    out = left.asof_join(right, on="t", by=["k"], value_cols=["val"]).to_df()
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "a", 2: "a", 3: "c", 4: None}


# ------------------------------------------------------------------- pq


def test_pq_adc_exact_duplicate_ranks_first(spark):
    from tada_spark.functions.similarity import pq_adc_topk

    # vec 6 duplicates vec 1 exactly and is the ONLY vector sharing its
    # codes (vec 5 quantizes to different centroids), so 6's ADC
    # distance from probe 1 is 0 and it must rank 1. (An equidistant
    # vec like [.5,.5,.5,.5] would collide onto the probe's codes and
    # tie at 0 — the legitimate ADC quantization-collision property.)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
        (5, [0.0, 0.9, 0.9, 0.0]),
        (6, [1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_adc_topk(df, m_sub=2, k_cent=4, n_probes=1, k=5)
    got = [(r.neighbor_id, r.adc_dist, r.rank) for r in out.orderBy("rank").collect()]
    assert got[0][0] == 6  # the exact duplicate wins
    assert all(got[i][1] <= got[i + 1][1] for i in range(len(got) - 1))
    assert [r for _, _, r in got] == list(range(1, len(got) + 1))


def test_pq_adc_self_excluded_and_null_dropped(spark):
    from tada_spark.functions.similarity import pq_adc_topk

    rows = [(1, [1.0, 2.0]), (2, [1.5, 2.5]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_adc_topk(df, m_sub=1, k_cent=2, n_probes=2, k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in out)
    assert {r.query_id for r in out} == {1, 2}
    assert all(r.neighbor_id != 3 for r in out)


# ---------------------------------------------------------- length buckets


def test_length_bucket_batches_known(spark):
    from tada_spark.functions.sampling import length_bucket_batches

    # tokens: 3,3,3 (bucket len(bin(3))=2), 9 (bucket 4), blank (bucket 1)
    df = spark.createDataFrame(
        [
            (1, "a b c", "s"),
            (2, "d e f", "s"),
            (3, "g h i", "s"),
            (4, "one two three four five six seven eight nine", "s"),
            (5, "   ", "s"),
            (6, "x", None),  # null shard dropped
        ],
        "doc_id long, text string, source string",
    )
    out = length_bucket_batches(df, batch_size=2)
    rows = {(r.bucket, r.batch_id): r for r in out.collect()}
    assert {(b, i) for b, i in rows} == {(2, 0), (2, 1), (4, 0), (1, 0)}
    b20 = rows[(2, 0)]
    assert (b20.n_docs, b20.total_tokens, b20.max_tokens, b20.padding_waste_e6) == (2, 6, 3, 0)
    b21 = rows[(2, 1)]
    assert b21.n_docs == 1 and b21.padding_waste_e6 == 0
    assert rows[(1, 0)].total_tokens == 0 and rows[(1, 0)].padding_waste_e6 == 0


def test_length_bucket_waste_fraction(spark):
    from tada_spark.functions.sampling import length_bucket_batches

    # both docs in bucket 3 (tokens 5 and 7): waste = (2*7-12)/(2*7)
    df = spark.createDataFrame(
        [(1, "a b c d e", "s"), (2, "a b c d e f g", "s")],
        "doc_id long, text string, source string",
    )
    r = length_bucket_batches(df, batch_size=8).collect()[0]
    import math

    assert r.padding_waste_e6 == math.floor((14 - 12) / 14 * 1e6 + 0.5)


def test_image_dhash_brightness_invariant_and_exact():
    import numpy as np

    from tada_spark.functions.multimodal import image_dhash

    rng_px = np.arange(11 * 9).reshape(9, 11) * 7 % 251  # 11x9 gray, w>=9 h>=7
    h0 = image_dhash(rng_px)
    # uniform brightness shift preserves every gradient sign -> same hash
    assert image_dhash(rng_px + 4) == h0
    # flipping one strong gradient flips the hash
    flipped = rng_px.copy()
    flipped[:, :5] += 1000
    assert image_dhash(flipped) != h0
    # 56-bit budget: always non-negative and < 2^56
    assert 0 <= h0 < (1 << 56)


def test_image_dhash_real_png_roundtrip():
    import numpy as np

    from tada_spark.functions.multimodal import encode_png_gray8, image_dhash, png_decode_pixels

    w, h = 12, 9
    fn = lambda x, y: (y * w + x * 13) % 200  # noqa: E731
    payload = encode_png_gray8(w, h, fn, filter_type=2)
    px = png_decode_pixels(payload)
    # decode returns (h, w, 1); dhash of the decode equals dhash of the formula
    direct = np.fromfunction(lambda y, x: (y * w + x * 13) % 200, (h, w), dtype=np.int64)
    assert image_dhash(px) == image_dhash(direct)


def test_image_dhash_rejects_too_small():
    import numpy as np
    import pytest

    from tada_spark.functions.multimodal import image_dhash

    with pytest.raises(ValueError):
        image_dhash(np.zeros((5, 5), dtype=np.int64))


def test_fold_ewma_quantized_recurrence():
    from tada_spark.streaming.stateful import fold_ewma

    # first value quantizes; later steps follow the e6-grid recurrence
    s, n = fold_ewma((None, 0), [1.2345678])
    assert (s, n) == (1.234568, 1)
    s2, n2 = fold_ewma((s, n), [2.0])
    assert s2 == math.floor((0.25 * 2.0 + 0.75 * s) * 1e6 + 0.5) / 1e6
    assert n2 == 2
    # batch-split invariance: folding [a, b] equals folding [a] then [b]
    a = fold_ewma(fold_ewma((None, 0), [3.1, 0.2]), [5.5])
    b = fold_ewma((None, 0), [3.1, 0.2, 5.5])
    assert a == b
    # empty batch is a no-op
    assert fold_ewma((1.5, 7), []) == (1.5, 7)


# ------------------------------------------------------------- wordpiece


def test_greedy_segment_known(spark):
    from tada_spark.functions.text import greedy_segment_stats

    vocab = {4: ["tion"], 3: ["ing"], 2: ["th", "er"]}
    df = spark.createDataFrame(
        [
            (1, "nation sing"),  # na|tion (n1=2,n=3); s|ing (n1=1,n=2)
            (2, "therther"),  # th|er|th|er (n=4, n1=0)
            (3, "xyz"),  # x|y|z all singles
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in greedy_segment_stats(df, vocab).collect()}
    assert (rows[1].n_words, rows[1].n_pieces, rows[1].n_single) == (2, 5, 3)
    assert (rows[2].n_pieces, rows[2].n_single) == (4, 0)
    assert (rows[3].n_pieces, rows[3].n_single) == (3, 3)
    # compression: doc 2 = 8 chars / 4 pieces = 2.0
    assert rows[2].chars_per_piece_e6 == 2_000_000


def test_greedy_segment_longest_match_wins(spark):
    from tada_spark.functions.text import greedy_segment_stats

    # 'tion' must win over 'ti' even though 2-grams are also in vocab
    vocab = {4: ["tion"], 2: ["ti", "on"]}
    df = spark.createDataFrame([(1, "tion")], "doc_id long, text string")
    r = greedy_segment_stats(df, vocab).collect()[0]
    assert (r.n_pieces, r.n_single) == (1, 0)


def test_greedy_segment_rejects_bad_vocab(spark):
    import pytest

    from tada_spark.functions.text import greedy_segment_stats

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        greedy_segment_stats(df, {3: ["ab"]})  # wrong length
    with pytest.raises(ValueError):
        greedy_segment_stats(df, {2: ["a'"]})  # quote in literal


def test_mann_whitney_known(spark):
    """Hand-computed: g1 = [1, 2], g2 = [2, 3, 3]. Pooled midranks:
    1→1, 2→2.5 (tie of two), 3→4.5 (tie of two). R1 = 1 + 2.5 = 3.5 →
    r1_x2 = 7; U1 = R1 − n1(n1+1)/2 = 0.5 → u1_x2 = 1. Tie term
    Σ(t³−t) = (2³−2)+(2³−2) = 12; var = (2·3/12)·(6 − 12/(5·4)) = 2.7;
    z = (0.5 − 3)/√2.7 = −1.521278...; e6 floor-half-up = −1521278."""
    from tada_spark.functions.stats import mann_whitney_u

    df = spark.createDataFrame(
        [("a", 0.01), ("a", 0.02), ("b", 0.02), ("b", 0.03), ("b", 0.03)],
        "g string, v double",
    )
    row = mann_whitney_u(df, "v", "g", "a", "b", scale=100).first()
    assert (row.n_g1, row.n_g2, row.u1_x2) == (2, 3, 1)
    import math

    z = (0.5 - 3.0) / math.sqrt(2.7)
    assert row.z_e6 == math.floor(z * 1e6 + 0.5)


def test_mann_whitney_degenerate_pool_null_z(spark):
    from tada_spark.functions.stats import mann_whitney_u

    df = spark.createDataFrame([("a", 1.0), ("b", 1.0)], "g string, v double")
    row = mann_whitney_u(df, "v", "g", "a", "b").first()
    assert row.z_e6 is None and row.u1_x2 == 1  # R1=1.5 → x2=3; U1_x2=3-2=1


def test_interpolate_linear_known(spark):
    """x: 0, 10, 40; v: 100, null, 400 → null at x=10 gets
    100 + 300·(10/40) = 175. Edge nulls stay null; equal-x neighbor
    degenerates to prev."""
    f = Frame(
        spark.createDataFrame(
            [(1, 0, 100), (1, 10, None), (1, 40, 400), (2, 0, None), (2, 1, 7)],
            "k long, x long, v long",
        )
    )
    out = {
        (r.k, r.x): r.v
        for r in f.interpolate("v", x_col="x", partition_by="k").df.collect()
    }
    assert out[(1, 10)] == 175.0
    assert out[(1, 0)] == 100 and out[(1, 40)] == 400
    assert out[(2, 0)] is None  # leading null: no extrapolation
    assert out[(2, 1)] == 7


def test_gini_known(spark):
    """[1, 1, 2]: Σi·x = 1+2+6 = 9, Σx = 4, n = 3 →
    G = 2·9/(3·4) − 4/3 = 1/6. Uniform values → G = 0."""
    from tada_spark.functions.stats import gini_by_group

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 5), ("b", 5)], "g string, x long"
    )
    rows = {r.g: r.gini_e6 for r in gini_by_group(df, "g", F.col("x")).collect()}
    assert rows["a"] == math.floor(1 / 6 * 1e6 + 0.5)
    assert rows["b"] == 0


def test_wilson_known(spark):
    from tada_spark.functions.stats import wilson_interval_by_group

    df = spark.createDataFrame([("a", i < 7) for i in range(10)], "g string, s boolean")
    row = wilson_interval_by_group(df, "g", F.col("s")).first()
    z = 1.959964
    n, p, z2 = 10.0, 0.7, z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    assert (row.n, row.k) == (10, 7)
    assert row.lo_e6 == math.floor(max(0.0, center - half) * 1e6 + 0.5)
    assert row.hi_e6 == math.floor(min(1.0, center + half) * 1e6 + 0.5)


def test_cusum_known(spark):
    """Series 1, 1, 10, 10 (mean shift after position 2): dev_i =
    |4·cum − i·22| = 18, 36, 18, 0 → argmax at i = 2, magnitude 9."""
    from tada_spark.functions.stats import cusum_changepoint

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 10), ("a", 4, 10)], "k string, t long, x long"
    )
    row = cusum_changepoint(df, "k", "t", F.col("x")).first()
    assert (row.change_at, row.n, row.cusum_e6) == (2, 4, 9_000_000)


def test_rolling_median_known(spark):
    """Trailing 3-window medians over 1, 9, 2, 8: [1], [1,9], [1,9,2],
    [9,2,8] → complete windows yield 2 and 8 (odd n = middle; the
    collect+sort path, since Spark's median aggregate rejects frames)."""
    f = Frame(
        spark.createDataFrame(
            [(1, 1, 1), (1, 2, 9), (1, 3, 2), (1, 4, 8)], "k long, t long, x long"
        ),
        labels=["k"],
    )
    out = {
        r.t: r.med
        for r in f.group_by("k").rolling_n(3, "x", "median", order_by="t", forward=False, out="med").df.collect()
    }
    assert out[1] is None and out[2] is None
    assert out[3] == 2.0 and out[4] == 8.0


def test_rolling_median_even_window_averages_middles(spark):
    f = Frame(
        spark.createDataFrame([(1, 1, 1), (1, 2, 4), (1, 3, 2)], "k long, t long, x long"),
        labels=["k"],
    )
    out = {
        r.t: r.med
        for r in f.group_by("k").rolling_n(2, "x", "median", order_by="t", forward=False, out="med").df.collect()
    }
    assert out[2] == 2.5 and out[3] == 3.0


def test_ols2_exact_plane(spark):
    """Points on y = 2 + 3·x1 + 5·x2 recover the coefficients exactly."""
    from tada_spark.functions.stats import ols2_by_group

    rows = [(a, c, 2 + 3 * a + 5 * c) for a in (0, 1, 2) for c in (0, 1)]
    df = spark.createDataFrame([("g", *r) for r in rows], "g string, a long, c long, y long")
    row = ols2_by_group(df, "g", F.col("a"), F.col("c"), F.col("y")).first()
    assert (row.b0_e6, row.b1_e6, row.b2_e6) == (2_000_000, 3_000_000, 5_000_000)


def test_ols2_singular_is_null(spark):
    from tada_spark.functions.stats import ols2_by_group

    df = spark.createDataFrame(
        [("g", 1, 2, 10), ("g", 2, 4, 20), ("g", 3, 6, 30)], "g string, a long, c long, y long"
    )  # c = 2a: collinear
    row = ols2_by_group(df, "g", F.col("a"), F.col("c"), F.col("y")).first()
    assert row.b0_e6 is None and row.b1_e6 is None and row.b2_e6 is None


def test_flesch_known(spark):
    """'Go now. It is fun.' → words 5, sentences 2, vowel groups 5
    (o, o, i, i, u) → score = 206.835 − 1.015·2.5 − 84.6·1 = 119.6975."""
    from tada_spark.functions.text import flesch_by_group

    df = spark.createDataFrame([("s", "Go now. It is fun.")], "g string, t string")
    row = flesch_by_group(df, "g", "t").first()
    assert row.n_docs == 1
    assert row.mean_flesch_e6 == math.floor((206.835 - 1.015 * 2.5 - 84.6 * 1.0) * 1e6 + 0.5)


def test_spearman_known_monotone(spark):
    from tada_spark.functions.stats import spearman_by_group

    rows = [("a", i, i * i) for i in range(1, 6)] + [("b", i, -i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r.spearman_e6 for r in spearman_by_group(df, "g", F.col("x"), F.col("y")).collect()}
    assert out["a"] == 1_000_000  # any monotone map has rho = 1
    assert out["b"] == -1_000_000


def test_benford_known(spark):
    from tada_spark.functions.stats import BENFORD_P, benford_chi2

    df = spark.createDataFrame([(1,), (19,), (2,)], "v long")
    row = benford_chi2(df, F.col("v")).first()
    assert (row.n, row.obs_1, row.obs_2) == (3, 2, 1)
    exp = 0
    obs = {1: 2, 2: 1}
    for i, p in enumerate(BENFORD_P, start=1):
        e = 3.0 * p
        d = obs.get(i, 0) - e
        exp += math.floor(d * d / e * 1e6 + 0.5)
    assert row.chi2_e6 == exp


def test_km_survival_known(spark):
    """Durations 1(event), 2(censored), 3(event): steps at d=1
    (n=3, e=1 → ln 2/3) and d=3 (n=1, e=1 → det_ln clamp at ln 1e-6);
    the curve is the running integer sum of e6-quantized terms."""
    from tada_spark.functions.stats import km_survival
    from tada_spark.plans.semantics import py_det_ln

    df = spark.createDataFrame(
        [("g", 1, True), ("g", 2, False), ("g", 3, True)], "g string, d long, e boolean"
    )
    rows = {r.d: r for r in km_survival(df, "g", "d", "e").collect()}
    assert set(rows) == {1, 3}
    t1 = math.floor(py_det_ln(2.0 / 3.0) * 1e6 + 0.5)
    t3 = math.floor(py_det_ln(0.0 / 1.0) * 1e6 + 0.5)
    assert (rows[1].n_risk, rows[1].d_events, rows[1].log_surv_e6) == (3, 1, t1)
    assert (rows[3].n_risk, rows[3].d_events, rows[3].log_surv_e6) == (1, 1, t1 + t3)


def test_quantile_normalize_known(spark):
    """Sources [1,2,3] and [10,20,30] over pooled [1,2,3,10,20,30]:
    ranks 1/2/3 of 3 land at pooled positions 1/4/6 → both sources
    normalize to the SAME [1, 10, 30] — the equalization property."""
    from tada_spark.functions.stats import quantile_normalize

    rows = [("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("b", 4, 10), ("b", 5, 20), ("b", 6, 30)]
    df = spark.createDataFrame(rows, "s string, i long, v long")
    out = {
        (r.s, r.value): r.norm_value
        for r in quantile_normalize(df, "s", "v", "i").collect()
    }
    assert out == {
        ("a", 1): 1, ("a", 2): 10, ("a", 3): 30,
        ("b", 10): 1, ("b", 20): 10, ("b", 30): 30,
    }


def test_exact_substring_hits_known(spark):
    from tada_spark.functions.text import exact_substring_hits

    corpus = spark.createDataFrame(
        [(1, "hello world foo"), (2, "nothing here")], "doc_id long, text string"
    )
    needles = spark.createDataFrame([(9, "world")], "eval_id long, needle string")
    rows = exact_substring_hits(corpus, needles).collect()
    assert len(rows) == 1
    assert (rows[0].doc_id, rows[0].eval_id, rows[0].position) == (1, 9, 7)


def test_audio_frame_energies_and_vad(spark):
    """16 samples of +100 then 16 of 0: frame energies 160000 and 0 →
    one voiced segment of length 1 at threshold 100000; partial tail
    frames drop."""
    from tada_spark.functions import multimodal

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<40h", *([100] * 16 + [0] * 16 + [7] * 8)))
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "media_id long, payload binary")
    en = {r.frame_idx: r.energy for r in multimodal.audio_frame_energies(df, frame=16).collect()}
    assert en == {0: 16 * 100 * 100, 1: 0}  # the 8-sample tail dropped
    seg = multimodal.vad_segments(
        multimodal.audio_frame_energies(df, frame=16), threshold=100000
    ).first()
    assert (seg.n_frames, seg.n_voiced, seg.n_segments, seg.longest_run) == (2, 1, 1, 1)


def test_vad_segments_islands(spark):
    from tada_spark.functions import multimodal

    rows = [(1, i, e) for i, e in enumerate([9, 9, 0, 9, 0, 9, 9, 9])]
    df = spark.createDataFrame(rows, "media_id long, frame_idx long, energy long")
    r = multimodal.vad_segments(df, threshold=5).first()
    assert (r.n_frames, r.n_voiced, r.n_segments, r.longest_run) == (8, 6, 3, 3)


def test_fk_candidates_containment(spark):
    """child [1,2,3] ⊂ parent [1..5] → containment 1.0 both directions
    asymmetric: parent in child = 3/5."""
    from tada_spark.operators.validate import fk_candidates

    child = spark.createDataFrame([(1,), (2,), (3,), (3,)], "k long")
    parent = spark.createDataFrame([(i,) for i in range(1, 6)], "p long")
    out = {
        (r.child_col, r.parent_col): (r.n_child, r.n_shared, r.containment_e6, r.is_candidate)
        for r in fk_candidates([(child, "k", "c.k"), (parent, "p", "p.p")]).collect()
    }
    assert out[("c.k", "p.p")] == (3, 3, 1_000_000, True)
    assert out[("p.p", "c.k")] == (5, 3, 600_000, False)


def test_ngram_novelty_known(spark):
    """Doc 1 owns all its shingles; doc 2 repeats doc 1's text verbatim
    → novelty 0; doc 3 is half-novel."""
    from tada_spark.queries import ngram_novelty_docs  # noqa: F401 — entry exists

    # drive the same plan shape on literals via the catalog function's body idiom
    docs = spark.createDataFrame(
        [
            (1, "abcdefghijklmnopqrst"),   # 5 shingles, all first-seen here
            (2, "abcdefghijklmnopqrst"),   # identical → 0 novel
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as FF

    grams = docs.select(
        "doc_id",
        FF.explode(
            FF.array_distinct(
                FF.expr(
                    "transform(sequence(1, greatest(length(text) - 15, 1)),"
                    " i -> substring(text, i, 16))"
                )
            )
        ).alias("g"),
    )
    first = grams.groupBy("g").agg(FF.min("doc_id").alias("first_doc"))
    out = {
        r.doc_id: (r.n_grams, r.n_novel)
        for r in grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            FF.count(FF.lit(1)).alias("n_grams"),
            FF.count(FF.when(FF.col("first_doc") == FF.col("doc_id"), FF.lit(1))).alias("n_novel"),
        )
        .collect()
    }
    assert out[1] == (5, 5)
    assert out[2] == (5, 0)


def test_grid_radius_join_known(spark):
    """(0,0)-(3,4) at dist 5 match at radius 5; the cross-cell pair
    (15,0)-(17,0) must still match (neighbor-cell cover), far point
    never."""
    from tada_spark.operators.spatial import grid_radius_join

    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 3, 4), (3, 15, 0), (4, 17, 0), (5, 500, 500)],
        "pid long, x long, y long",
    )
    out = {
        (r.id_a, r.id_b): r.dist2
        for r in grid_radius_join(pts, id_col="pid", x_col="x", y_col="y", radius=5).collect()
    }
    assert out == {(1, 2): 25, (3, 4): 4}


def test_pmi_bigrams_known(spark):
    """Corpus 'x y x y' + 'z': N=5, c(x)=c(y)=2, c(z)=1; bigram (x,y)
    ×2 → pmi = ln(2·5/4) = ln 2.5; (y,x) ×1 → ln(5/4)."""
    from tada_spark.functions.text import pmi_bigrams
    from tada_spark.plans.semantics import py_det_ln

    df = spark.createDataFrame([("x y x y",), ("z",)], "text string")
    rows = {(r.w1, r.w2): (r.c12, r.pmi_e6) for r in pmi_bigrams(df, min_count=1, k=10).collect()}
    assert rows[("x", "y")] == (2, math.floor(py_det_ln(2.5) * 1e6 + 0.5))
    assert rows[("y", "x")] == (1, math.floor(py_det_ln(1.25) * 1e6 + 0.5))


def test_trimmed_mean_known(spark):
    """[0, 1, 2, 3, 1000] at frac 0.2 → k=1, keep [1,2,3] → mean 2.
    A group too small to trim (n ≤ 2k) drops."""
    f = Frame(
        spark.createDataFrame(
            [("a", v) for v in (0, 1, 2, 3, 1000)] + [("b", 5)], "g string, v long"
        ),
        labels=["g"],
    )
    out = {r.g: (r.n_kept, r.tm) for r in f.group_by("g").trimmed_mean("v", 0.2, out="tm").df.collect()}
    assert out["a"] == (3, 2.0)
    assert out["b"] == (1, 5.0)  # k=0: nothing trimmed


def test_burstiness_known(spark):
    """Gaps [10, 10]: σ=0 → B = −1 (perfect metronome). Gaps [0, 20]:
    μ=10, σ=10 → B = 0."""
    from tada_spark.functions.stats import burstiness_by_key

    rows = [("m", 0, 1), ("m", 10_000_000, 2), ("m", 20_000_000, 3),
            ("p", 0, 1), ("p", 0, 2), ("p", 20_000_000, 3)]
    df = spark.createDataFrame(rows, "k string, us long, i long")
    out = {r.k: (r.n_gaps, r.b_e6) for r in burstiness_by_key(df, "k", F.col("us"), seq_col="i").collect()}
    assert out["m"] == (2, -1_000_000)
    assert out["p"] == (2, 0)


def test_column_churn_known(spark):
    from tada_spark.operators.cdc import column_churn

    old = spark.createDataFrame([(1, "a", 10), (2, "b", 20), (3, None, 30)], "k long, s string, v long")
    new = spark.createDataFrame([(1, "a", 11), (2, "c", 20), (3, "z", 30), (4, "w", 40)], "k long, s string, v long")
    out = {r.column_name: (r.n_changed, r.n_compared) for r in column_churn(old, new, "k", ["s", "v"]).collect()}
    assert out == {"s": (2, 3), "v": (1, 3)}  # key 4 unmatched; null→'z' counts


def test_merge_pattern_batch_fold():
    """Pure fold: click@0, purchase@10 (match), purchase@2000s (miss),
    click@3000s, purchase@3000s same-instant (match under the tie pin)."""
    from tada_spark.streaming.stateful import merge_pattern_batch

    W = 1800 * 1_000_000
    st = (None, 0, 0)
    ts = [0, 10_000_000, 2_000_000_000, 3_000_000_000, 3_000_000_000]
    ty = ["click", "purchase", "purchase", "click", "purchase"]
    # tie pin: at equal ts the click is ordered first (done here by list order)
    st = merge_pattern_batch(st, ts, ty, "click", "purchase", W)
    assert st == (3_000_000_000, 3, 2)
    # state carries: a purchase in the next batch still matches
    st = merge_pattern_batch(st, [3_100_000_000], ["purchase"], "click", "purchase", W)
    assert st == (3_000_000_000, 4, 3)


def test_weighted_quantile_known(spark):
    """Values 1(w=1), 2(w=1), 3(w=8): W=10, median crossing at cum·2 ≥ 10
    → value 3. Unweighted-equivalent check: all w=1 → classic lower
    median."""
    from tada_spark.functions.stats import weighted_quantile_by_group

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 8), ("b", 5, 1), ("b", 9, 1)],
        "g string, v long, w long",
    )
    out = {r.g: (r.wq_value, r.total_weight) for r in
           weighted_quantile_by_group(df, "g", F.col("v"), F.col("w"), q_num=1, q_den=2).collect()}
    assert out["a"] == (3, 10)
    assert out["b"] == (5, 2)  # lower median convention


def test_best_split_known(spark):
    """Feature 1,2 all-True; 3,4 all-False → perfect split at 2.
    Purity gain = 4/2 + 4/2 = 4 exactly (e6-quantized; the r9 objective
    fix replaced the non-order-equivalent cross-multiplied score)."""
    from tada_spark.functions.stats import best_split_by_group

    rows = [("g", 1, True), ("g", 2, True), ("g", 3, False), ("g", 4, False)]
    df = spark.createDataFrame(rows, "g string, f long, y boolean")
    r = best_split_by_group(df, "g", F.col("f"), F.col("y")).first()
    assert (r.split_at, r.n_left, r.n_right, r.score_e6) == (2, 2, 2, 4_000_000)


def test_jackknife_constant_values_zero_se(spark):
    """Constant metric → every leave-one-out mean equals the mean →
    se exactly 0; mean_e6 is the exact constant."""
    from tada_spark.functions.stats import jackknife_mean_by_group

    df = spark.createDataFrame([("g", i, 500) for i in range(100)], "g string, id long, v long")
    r = jackknife_mean_by_group(df, "g", F.col("v"), "id").first()
    assert (r.n, r.mean_e6, r.se_e6) == (100, 500_000_000, 0)


def test_jackknife_se_positive_when_varied(spark):
    from tada_spark.functions.stats import jackknife_mean_by_group

    df = spark.createDataFrame([("g", i, i * 7 % 101) for i in range(200)], "g string, id long, v long")
    r = jackknife_mean_by_group(df, "g", F.col("v"), "id").first()
    assert r.n == 200 and r.se_e6 is not None and r.se_e6 > 0


def test_clamped_balance_identity(spark):
    """Deltas [5, -10, 3]: naive recurrence max(0, b+x) gives
    [5, 0, 3]; the closed form prefix − min(0, running_min(prefix))
    must agree (and never via a recurrence UDF)."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(1, 1, 5), (1, 2, -10), (1, 3, 3)], "k long, t long, d long"
    )
    w = Window.partitionBy("k").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    pre = F.sum("d").over(w)
    # closed form needs the prefix materialized first
    stepped = df.select("k", "t", pre.alias("p"))
    out = stepped.select(
        "t",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(
            Window.partitionBy("k").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        ))).alias("b"),
    )
    assert [r.b for r in out.orderBy("t").collect()] == [5, 0, 3]


def test_label_silhouette_separable_vs_mixed(spark):
    """Two tight, far-apart labels → silhouette ≈ 1 for both; a point
    sitting exactly on another label's centroid scores negative."""
    from tada_spark.functions.similarity import label_silhouette

    rows = [
        (1, [0.0, 0.0], "a"), (2, [0.1, 0.0], "a"),
        (3, [100.0, 100.0], "b"), (4, [100.1, 100.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r.label: r.mean_sil_e6 for r in label_silhouette(df).collect()}
    assert out["a"] > 990_000 and out["b"] > 990_000


def test_ndcg_known(spark):
    """Perfect ranking → NDCG = 1; the worst order of gains [3, 0] at
    ranks [2, 1] → DCG = 3·d2, IDCG = 3·d1 → ndcg = d2/d1."""
    from tada_spark.functions.stats import NDCG_DISCOUNTS, ndcg_at_10

    perfect = spark.createDataFrame(
        [("q", 1, 2), ("q", 2, 1), ("q", 3, 0)], "g string, rk int, rel int"
    )
    r = ndcg_at_10(perfect, "g", "rk", "rel").first()
    assert r.ndcg_e6 == 1_000_000 and r.n_ranked == 3
    worst = spark.createDataFrame([("q", 1, 0), ("q", 2, 2)], "g string, rk int, rel int")
    r = ndcg_at_10(worst, "g", "rk", "rel").first()
    assert r.ndcg_e6 == math.floor(NDCG_DISCOUNTS[1] / NDCG_DISCOUNTS[0] * 1e6 + 0.5)


def test_ndcg_zero_relevance_null(spark):
    from tada_spark.functions.stats import ndcg_at_10

    df = spark.createDataFrame([("q", 1, 0)], "g string, rk int, rel int")
    assert ndcg_at_10(df, "g", "rk", "rel").first().ndcg_e6 is None


def test_rolling_median_all_null_window_is_null(spark):
    """A complete window whose values are all NULL must yield NULL (the
    other aggs' contract), not an index-0 error."""
    f = Frame(
        spark.createDataFrame(
            [(1, 1, None), (1, 2, None), (1, 3, 5)], "k long, t long, x long"
        ),
        labels=["k"],
    )
    out = {r.t: r.med for r in f.group_by("k").rolling_n(2, "x", "median", order_by="t", forward=False, out="med").df.collect()}
    assert out[2] is None  # both values null
    assert out[3] == 5.0  # collect_list skipped the null → single value


def test_ndcg_rank_gap_keeps_rank_discount(spark):
    """A missing rank must NOT shift later docs onto better discounts:
    ranks [1, 3] with gains [0, 3] discount rank 3 by d3 = 0.5, not d2."""
    from tada_spark.functions.stats import NDCG_DISCOUNTS, ndcg_at_10

    df = spark.createDataFrame([("q", 1, 0), ("q", 3, 2)], "g string, rk int, rel int")
    r = ndcg_at_10(df, "g", "rk", "rel").first()
    assert r.dcg_e6 == math.floor(3 * NDCG_DISCOUNTS[2] * 1e6 + 0.5)


def test_gini_drops_negatives(spark):
    from tada_spark.functions.stats import gini_by_group

    df = spark.createDataFrame([("g", -5), ("g", 2), ("g", 2)], "g string, x long")
    r = gini_by_group(df, "g", F.col("x")).first()
    assert (r.n, r.sx, r.gini_e6) == (2, 4, 0)  # the negative never entered


def test_autocorr_perfect_weekly_period(spark):
    """A strict period-7 series correlates perfectly with itself at
    lag 7 — drive the catalog entry's exact closed form on literals."""
    from pyspark.sql.window import Window

    rows = [(i, [100, 200, 300, 400, 500, 600, 700][i % 7]) for i in range(28)]
    daily = spark.createDataFrame(rows, "d long, cents long")
    w = Window.orderBy("d")
    paired = daily.select(
        "cents", F.lead("cents", 7).over(w).alias("c7")
    ).filter(F.col("c7").isNotNull())
    s = paired.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sx"), F.sum("c7").alias("sy"),
        F.sum(F.col("cents") * F.col("c7")).alias("sxy"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
        F.sum(F.col("c7") * F.col("c7")).alias("syy"),
    ).first()
    num = s.n * s.sxy - s.sx * s.sy
    denx = s.n * s.sxx - s.sx * s.sx
    deny = s.n * s.syy - s.sy * s.sy
    assert num * num == denx * deny  # corr == 1 exactly in integers


def test_word_boundary_chunk_fold(spark):
    """'aaaa bb cccc' at cap 8: [aaaa bb] (7 chars) then [cccc] —
    the fold never splits a word and closes on overflow; an oversized
    single word gets its own chunk."""
    from pyspark.sql import functions as FF

    df = spark.createDataFrame([(1, "aaaa bb cccc"), (2, "x" * 60)], "doc_id long, text string")
    folded = FF.expr(
        """
        aggregate(
          filter(transform(split(text, ' +'), s -> trim(s)), s -> s != ''),
          cast(array() as array<struct<idx:int, n:int, chars:int>>),
          (acc, s) -> case
            when try_element_at(acc, -1).chars + 1 + length(s) <= 8
            then concat(slice(acc, 1, size(acc) - 1),
                        array(named_struct('idx', try_element_at(acc, -1).idx,
                          'n', try_element_at(acc, -1).n + 1,
                          'chars', try_element_at(acc, -1).chars + 1 + length(s))))
            else concat(acc, array(named_struct('idx', cast(size(acc) + 1 as int),
                          'n', 1, 'chars', cast(length(s) as int))))
          end)
        """
    )
    out = {
        (r.doc_id, r.c.idx): (r.c.n, r.c.chars)
        for r in df.select("doc_id", FF.explode(folded).alias("c")).collect()
    }
    assert out == {(1, 1): (2, 7), (1, 2): (1, 4), (2, 1): (1, 60)}
