"""Operator-surface tests on tiny literal frames (reference test model:
table-driven per-operator cases, SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tada_spark.frame import Frame


def _basic(spark) -> Frame:
    return Frame(
        spark.createDataFrame(
            [(0, 1.0, "foo"), (1, 2.0, "bar"), (2, 3.0, "foo"), (3, None, "baz")],
            "idx long, v double, s string",
        ),
        labels=["idx"],
    )


def test_head_tail_range_subset(spark):
    f = _basic(spark).ordered("idx")
    assert [r.idx for r in f.head(2).df.collect()] == [0, 1]
    assert sorted(r.idx for r in f.tail(2).df.collect()) == [2, 3]
    assert [r.idx for r in f.range(1, 3).sort("idx").df.collect()] == [1, 2]
    assert sorted(r.idx for r in f.subset([0, 3]).df.collect()) == [0, 3]
    assert sorted(r.idx for r in f.drop_row(1).df.collect()) == [0, 2, 3]


def test_with_col_rename_reorder(spark):
    f = _basic(spark)
    assert "v2" in f.with_col("v2", F.col("v") * 2).columns
    assert "w" in f.rename({"v": "w"}).columns
    assert f.reorder_cols("s", "v").columns == ["s", "v"]
    assert f.filter_cols(lambda c: c.startswith("v")).columns == ["idx", "v"]


def test_filter_by_value_stringified(spark):
    f = _basic(spark)
    assert f.filter_by_value(v="2").df.count() == 1  # string "2" matches 2.0
    assert f.filter_by_value(s="foo").df.count() == 2


def test_where_null_propagation(spark):
    """Reference Where: null condition ⇒ null output."""
    f = _basic(spark)
    rows = {r.idx: r.w for r in f.where(F.col("v") > 1.5, F.lit("hi"), F.lit("lo"), as_col="w").df.collect()}
    assert rows[0] == "lo" and rows[1] == "hi" and rows[3] is None


def test_drop_null_and_null_rows(spark):
    f = _basic(spark)
    assert f.drop_null("v").df.count() == 3
    assert f.null_rows("v").df.count() == 1


def test_fill_null_forward_and_zero(spark):
    f = Frame(
        spark.createDataFrame(
            [(0, None), (1, 5.0), (2, None), (3, None), (4, 7.0)], "idx long, v double"
        )
    )
    ff = {r.idx: r.v for r in f.fill_null("forward", subset=["v"], order_by=["idx"]).df.collect()}
    assert ff == {0: None, 1: 5.0, 2: 5.0, 3: 5.0, 4: 7.0}
    bf = {r.idx: r.v for r in f.fill_null("backward", subset=["v"], order_by=["idx"]).df.collect()}
    assert bf == {0: 5.0, 1: 5.0, 2: 7.0, 3: 7.0, 4: 7.0}
    z = {r.idx: r.v for r in f.fill_null("zero", subset=["v"]).df.collect()}
    assert z[0] == 0.0 and z[1] == 5.0


def test_shift_and_cumsum(spark):
    f = Frame(spark.createDataFrame([(0, 1.0), (1, None), (2, 3.0)], "idx long, v double"))
    sh = {r.idx: r.prev for r in f.shift("v", 1, order_by=["idx"], as_col="prev").df.collect()}
    assert sh == {0: None, 1: 1.0, 2: None}
    cs = {r.idx: r.c for r in f.cum_sum("v", order_by=["idx"], as_col="c").df.collect()}
    assert cs == {0: 1.0, 1: 1.0, 2: 4.0}  # nulls contribute 0


def test_bin_edges_left_exclusive(spark):
    """Reference cut: (lo, hi] intervals; nulls and out-of-range ⇒ null."""
    f = Frame(spark.createDataFrame([(0.0,), (5.0,), (10.0,), (15.0,), (None,)], "v double"))
    rows = [r.b for r in f.bin("v", [0, 10, 20], labels=["lo", "hi"], as_col="b").df.collect()]
    assert rows == [None, "lo", "lo", "hi", None]  # 0 excluded, 10 included in lo


def test_rank_and_percentile(spark):
    f = Frame(spark.createDataFrame([(1.0,), (2.0,), (2.0,), (None,)], "v double"))
    rk = sorted((r.v, r.r) for r in f.rank("v", as_col="r").df.collect() if r.v is not None)
    assert rk == [(1.0, 1), (2.0, 2), (2.0, 2)]
    assert [r.r for r in f.rank("v", as_col="r").df.collect() if r.v is None] == [None]
    pc = sorted((r.v, r.p) for r in f.percentile("v", as_col="p").df.collect() if r.v is not None)
    assert pc == [(1.0, 0.0), (2.0, 1 / 3), (2.0, 1 / 3)]


def test_append_type_coercion(spark):
    """Reference internal.go:1159-1170: mismatched types coerce to string."""
    a = Frame(spark.createDataFrame([(1,)], "v long"))
    b = Frame(spark.createDataFrame([("x",)], "v string"))
    out = a.append(b)
    assert dict(out.df.dtypes)["v"] == "string"
    assert out.df.count() == 2


def test_lookup_first_match_ordered(spark):
    """Reference §2.6: only the FIRST matching right row is used."""
    left = Frame(spark.createDataFrame([("k1",), ("k2",)], "k string"), labels=["k"])
    right = Frame(
        spark.createDataFrame([("k1", "first"), ("k1", "second"), ("k3", "x")], "k string, val string"),
        labels=["k"],
    )
    out = left.lookup(right, first_match="ordered")
    rows = {r.k: r.val for r in out.df.collect()}
    assert rows == {"k1": "first", "k2": None}
    assert out.df.count() == 2  # no row multiplication


def test_lookup_inner_drops_unmatched(spark):
    left = Frame(spark.createDataFrame([("k1",), ("k2",)], "k string"), labels=["k"])
    right = Frame(spark.createDataFrame([("k1", 1.0)], "k string, v double"), labels=["k"])
    assert left.lookup(right, how="inner").df.count() == 1


def test_unique_first_appearance(spark):
    f = Frame(spark.createDataFrame([(0, "a"), (1, "b"), (2, "a")], "idx long, s string")).ordered("idx")
    out = f.unique("s", first_appearance=True)
    assert sorted(r.idx for r in out.df.collect()) == [0, 1]


def test_grouped_first_last_nth_oob(spark):
    f = Frame(
        spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0)], "k string, ord int, v double"
        )
    )
    g = f.group_by("k")
    first = {r.k: r.first_v for r in g.first("v", order_by=["ord"]).df.collect()}
    assert first == {"a": 10.0, "b": 30.0}
    last = {r.k: r.last_v for r in g.last("v", order_by=["ord"]).df.collect()}
    assert last == {"a": 20.0, "b": 30.0}
    nth = {r.k: r.nth_v for r in g.nth("v", 1, order_by=["ord"]).df.collect()}
    assert nth == {"a": 20.0, "b": None}  # out-of-bounds ⇒ null
    neg = {r.k: r.nth_v for r in g.nth("v", -2, order_by=["ord"]).df.collect()}
    assert neg == {"a": 10.0, "b": None}


def test_rolling_n_forward_null_tail(spark):
    """Reference RollingN: incomplete tail windows ⇒ null."""
    f = Frame(spark.createDataFrame([("a", i, float(i)) for i in range(4)], "k string, ord int, v double"))
    out = {r.ord: r.roll for r in f.group_by("k").rolling_n(2, "v", "sum", order_by=["ord"], out="roll").df.collect()}
    assert out == {0: 1.0, 1: 3.0, 2: 5.0, 3: None}


def test_having_count(spark):
    f = Frame(spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int"))
    out = f.group_by("k").having_count(lambda c: c >= 2)
    assert set(r.k for r in out.df.collect()) == {"a"}


def test_pivot_table(spark):
    f = Frame(
        spark.createDataFrame(
            [("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0)], "k string, c string, v double"
        )
    )
    out = {r.k: (r.p, r.q) for r in f.pivot_table(["k"], "c", "v", "sum").df.collect()}
    assert out == {"x": (1.0, 2.0), "y": (3.0, None)}


def test_resample_week_monday(spark):
    f = Frame(spark.createDataFrame([("2024-01-10",)], "d string")).cast(d="timestamp")
    out = f.resample("d", "week", week_start="MONDAY").df.first().d
    assert str(out)[:10] == "2024-01-08"  # Wed Jan 10 → Mon Jan 8


def test_shuffle_deterministic_permutation(spark):
    f = _basic(spark)
    a = [r.idx for r in f.shuffle(7).df.collect()]
    b = [r.idx for r in f.shuffle(7).df.collect()]
    assert a == b  # same seed → same order
    assert sorted(a) == [0, 1, 2, 3]  # permutation, no loss/dup


def test_semi_anti_join_partition(spark):
    left = _basic(spark)
    right = Frame(spark.createDataFrame([("foo",), ("baz",)], "s string"))
    semi = left.semi_join(right, left_on=["s"], right_on=["s"])
    anti = left.anti_join(right, left_on=["s"], right_on=["s"])
    assert sorted(r.idx for r in semi.df.collect()) == [0, 2, 3]
    assert sorted(r.idx for r in anti.df.collect()) == [1]
    # semi + anti partition the left side exactly
    assert semi.df.count() + anti.df.count() == left.df.count()
    assert semi.columns == left.columns  # no right columns appended


def test_lookup_unique_keys_skips_dedupe(spark):
    left = _basic(spark)
    right = Frame(spark.createDataFrame([("foo", 10.0), ("bar", 20.0)], "s string, w double"))
    a = left.lookup(right, left_on=["s"], right_on=["s"]).df
    b = left.lookup(right, left_on=["s"], right_on=["s"], unique_keys=True).df
    assert sorted((r.idx, r.w) for r in a.collect()) == sorted((r.idx, r.w) for r in b.collect())
    # the PK assertion removes the dedupe aggregate from the plan
    plan_a = a._jdf.queryExecution().optimizedPlan().toString()
    plan_b = b._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" in plan_a and "Aggregate" not in plan_b


def test_asof_join_backward(spark):
    trades = Frame(
        spark.createDataFrame(
            [("A", 3, 100.0), ("A", 7, 101.0), ("B", 5, 50.0), ("A", 1, 99.0)],
            "sym string, t long, px double",
        )
    )
    quotes = Frame(
        spark.createDataFrame(
            [("A", 2, 9.5), ("A", 7, 9.9), ("B", 9, 4.0)], "sym string, t long, bid double"
        )
    )
    out = trades.asof_join(quotes, on="t", by=["sym"], value_cols=["bid"])
    got = {(r.sym, r.t): r.bid for r in out.df.collect()}
    # t=1: no quote yet → null; t=3: quote@2; t=7: quote@7 (inclusive); B t=5: quote@9 is later → null
    assert got == {("A", 1): None, ("A", 3): 9.5, ("A", 7): 9.9, ("B", 5): None}
    strict = trades.asof_join(quotes, on="t", by=["sym"], value_cols=["bid"], strict=True)
    sgot = {(r.sym, r.t): r.bid for r in strict.df.collect()}
    assert sgot[("A", 7)] == 9.5  # strict: simultaneous quote not yet visible
    assert out.df.count() == 4  # never multiplies rows


def test_range_join_bucket_edges(spark):
    from tada_spark.operators.interval import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:59:59"), (2, "2024-01-01 01:00:00"), (3, "2024-01-01 02:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:30:00", "2024-01-01 02:00:00")], "rid long, s string, e string"
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))
    out = range_join(left, right, left_ts="ts", right_start="s", right_end="e", bucket_s=3600)
    got = sorted(r.id for r in out.collect())
    # interval spans two buckets; id=1 and id=2 inside, id=3 excluded (end-exclusive)
    assert got == [1, 2]
    # each (row, interval) pair appears exactly once despite multi-bucket explode
    assert out.count() == 2


def test_error_contract(spark):
    """The reference poisons chains with sticky errors (internal.go:60-74);
    our engine raises at plan-build time instead. Pin the failure modes."""
    import pytest

    f = _basic(spark)
    with pytest.raises(KeyError, match="has_cols"):
        f.has_cols("nope")
    with pytest.raises(KeyError, match="has_labels"):
        f.has_labels("nope")
    with pytest.raises(ValueError, match="no shared keys"):
        f.lookup(Frame(spark.createDataFrame([(1,)], "zz long")))
    with pytest.raises(ValueError, match="fill_null"):
        f.fill_null("sideways")
    with pytest.raises(ValueError, match="resample"):
        Frame(spark.createDataFrame([("2024-01-01",)], "d string")).cast(d="timestamp").resample("d", "fortnight")
    with pytest.raises(ValueError, match="value_cols collide"):
        f.asof_join(f, on="idx", value_cols=["v"])
    with pytest.raises(ValueError, match="group_by"):
        Frame(spark.createDataFrame([(1,)], "a long")).group_by()


def test_salted_join_matches_plain_join(spark):
    from tada_spark.operators.skew import salted_join

    # key "hot" dominates: 200 of 230 left rows
    left = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [(f"k{i}", i) for i in range(30)], "k string, lv long"
    )
    right = spark.createDataFrame(
        [("hot", 99.0)] + [(f"k{i}", float(i)) for i in range(0, 60, 2)], "k string, rv double"
    )
    plain = left.join(right, on=["k"], how="inner")
    salted = salted_join(left, right, on=["k"], hot_threshold=100, salts=4)
    assert sorted((r.k, r.lv, r.rv) for r in plain.collect()) == sorted(
        (r.k, r.lv, r.rv) for r in salted.collect()
    )


def test_grouped_col_isolation(spark):
    f = Frame(
        spark.createDataFrame(
            [("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 3.0, 30.0)], "k string, x double, y double"
        )
    )
    g = f.group_by("k").col("x")
    out = {r.k: r.sum_x for r in g.sum("x").df.collect()}
    assert out == {"a": 3.0, "b": 3.0}
    assert g.frame.columns == ["k", "x"]  # y projected away, grouping kept


def test_positions_rederive_after_filter(spark):
    """Stale-__rowid__ regression: positional ops after a filter must
    use positions of the CURRENT row set (re-derived from the declared
    order keys), not the pre-filter frame's."""
    f = Frame(
        spark.createDataFrame([(i, float(i % 3)) for i in range(10)], "k long, v double")
    )
    out = f.ordered("k").filter(F.col("v") > 0).head(3)
    got = sorted(r.k for r in out.df.collect())
    # survivors by k: 1,2,4,5,7,8 → first three are 1,2,4 (NOT the
    # survivors among original positions 0-2, which would be [1, 2])
    assert got == [1, 2, 4]
    # range re-derives too: next two survivors
    mid = f.ordered("k").filter(F.col("v") > 0).range(3, 5)
    assert sorted(r.k for r in mid.df.collect()) == [5, 7]
    # tail after subset restarts positions
    t = f.ordered("k").subset([0, 2, 4, 6]).tail(2)
    assert sorted(r.k for r in t.df.collect()) == [4, 6]


def test_review_fixes_batch(spark):
    import datetime

    # filter_by_value: float literal canonicalizes ('1.0' matches as '1')
    f = Frame(spark.createDataFrame([(1, 1.0), (2, 2.5)], "id long, x double"))
    assert [r.id for r in f.filter_by_value(x=1.0).df.collect()] == [1]
    assert [r.id for r in f.filter_by_value(x=2.5).df.collect()] == [2]
    assert f.filter_by_value(x=None).df.count() == 0  # nulls never match

    # merge on a shared-name non-label key must not rename the key
    a = Frame(spark.createDataFrame([(1, 10.0)], "k long, v double"))
    b = Frame(spark.createDataFrame([(1, 99.0)], "k long, v double"))
    m = a.merge(b, left_on=["k"], right_on=["k"])
    assert set(m.columns) == {"k", "v", "v_1"}
    assert m.df.first().v_1 == 99.0

    # lookup inner: right side adds NO new column names → unmatched
    # left rows must still drop (was silently behaving as left join)
    left = Frame(spark.createDataFrame([(1,), (2,)], "k long"))
    right = Frame(spark.createDataFrame([(1,)], "k long"))
    assert left.lookup(right, left_on=["k"], right_on=["k"], how="inner").df.count() == 1

    # asof: right rows with NULL time match nothing
    trades = Frame(spark.createDataFrame([("A", 5)], "sym string, t long"))
    quotes = Frame(
        spark.createDataFrame([("A", None, 9.9)], "sym string, t long, bid double")
    )
    out = trades.asof_join(quotes, on="t", by=["sym"], value_cols=["bid"])
    assert out.df.first().bid is None


def test_minhash_paths_agree_on_short_docs(spark):
    from tada_spark.functions.dedup import minhash_signature, minhash_signatures
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "one two three four"), (3, "")], "doc_id long, text string"
    )
    sig_long = {
        r.doc_id: [r[f"h{i}"] for i in range(16)]
        for r in minhash_signatures(df).collect()
    }
    sig_arr = {
        r.doc_id: (list(r.sig) if r.sig is not None else None)
        for r in df.select("doc_id", minhash_signature(F.col("text")).alias("sig")).collect()
    }
    assert 1 in sig_long  # short doc no longer silently dropped
    assert 3 not in sig_long and sig_arr[3] is None  # empty doc: no signature, both paths
    for k in sig_long:
        assert sig_long[k] == sig_arr[k], k


def test_transpose_preserves_nulls(spark):
    from tada_spark.operators import reshape

    f = Frame(
        spark.createDataFrame([("r1", 1.5), ("r2", None)], "idx string, v double"),
        labels=["idx"],
    )
    t = reshape.transpose(f)
    vals = {c: t.df.first()[c] for c in t.df.columns}
    assert None in vals.values()  # NULL stays NULL, not the text 'None'/'nan'
    assert "None" not in vals.values() and "nan" not in vals.values()


def test_cast_date_multiformat(spark):
    f = Frame(spark.createDataFrame([("01/15/2020",), ("2021-03-04",)], "d string"))
    out = [str(r.d) for r in f.cast(d="date").df.collect()]
    assert out == ["2020-01-15", "2021-03-04"]  # non-ISO no longer nulled


def test_review_fixes_batch2(spark):
    import pytest
    from tada_spark.operators.skew import salted_join
    from tada_spark.plans.semantics import py_canon

    # nth on a NULL-keyed group still returns the positional value
    f = Frame(spark.createDataFrame([(None, 10.0), (None, 20.0)], "k string, v double"))
    got = {r.k: r.nth_v for r in f.group_by("k").nth("v", 0, order_by=["v"], out="nth_v").df.collect()}
    assert got == {None: 10.0}

    # aligned nunique no longer plans an (unsupported) distinct window
    g = Frame(spark.createDataFrame([("a", 1.0), ("a", 1.0), ("b", 2.0)], "k string, v double"))
    aligned = g.group_by("k").align().nunique("v")
    assert [r.nunique_v for r in aligned.df.orderBy("k").collect()] == [1, 1, 1]

    # py_canon infinity matches canon_str's render instead of raising
    assert py_canon(float("inf")) == "Infinity"
    assert py_canon(float("-inf")) == "-Infinity"

    # salted_join rejects right-preserving joins (per-salt replica leak)
    l = spark.createDataFrame([(1, 1.0)], "k long, v double")
    r = spark.createDataFrame([(1, 2.0)], "k long, w double")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(l, r, on=["k"], how="right")


def test_codec_all_null_roundtrip(spark):
    from tada_spark.sources.codec import frame_from_json, frame_to_json

    f = Frame(spark.createDataFrame([(1, None), (2, None)], "id long, v double"))
    back = frame_from_json(spark, frame_to_json(f))
    rows = back.df.orderBy("id").collect()
    assert [r.v for r in rows] == [None, None]
    assert dict(back.df.dtypes)["v"] == "double"  # dtype survives all-null


def test_multilevel_labels_int_values(spark):
    from tada_spark.operators.reshape import make_multilevel_labels

    f = make_multilevel_labels(spark, {"year": [2020, 2021], "region": ["us", "eu"]})
    assert f.df.count() == 4
    assert sorted(set(r.year for r in f.df.collect())) == ["2020", "2021"]


def test_review_fixes_batch3(spark):
    import pytest
    from tada_spark.functions import text
    from tada_spark.functions.dedup import minhash_lsh_pairs
    from tada_spark.functions.multimodal import frame_sample_plan

    # short docs: empty winnow/rolling fingerprints, no crash
    df = spark.createDataFrame([(1, "short"), (2, "x" * 50)], "doc_id long, text string")
    out = df.select("doc_id", F.size(text.winnow_fingerprint(F.col("text"))).alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    assert got[1] == 0 and got[2] > 0

    # zero-frame media rows drop instead of crashing
    media = spark.createDataFrame([(1, 0), (2, 90)], "media_id long, n_frames int")
    idx = frame_sample_plan(media, every_n=30).collect()
    assert sorted((r.media_id, r.frame_idx) for r in idx) == [(2, 0), (2, 30), (2, 60)]

    # append strips stale rowids: positional ops on the result re-derive
    a = Frame(spark.createDataFrame([(0,), (1,)], "k long")).ordered("k")
    b = Frame(spark.createDataFrame([(2,), (3,)], "k long"))
    ap = a.append(b)
    assert ap.df.count() == 4
    assert sorted(r.k for r in ap.ordered("k").head(3).df.collect()) == [0, 1, 2]

    # re-ordering with new keys takes effect (was a silent no-op)
    f = Frame(spark.createDataFrame([(1, 9.0), (2, 1.0)], "a long, b double"))
    assert [r.a for r in f.ordered("a").ordered("b").head(1).df.collect()] == [2]

    # unique() results restart positions
    u = Frame(spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "k long, s string"))
    first = u.ordered("k").unique("s", first_appearance=True).head(1)
    assert [r.k for r in first.df.collect()] == [1]

    # asof: NULL value on the LATEST right row stays null (not stale fill)
    trades = Frame(spark.createDataFrame([("A", 3)], "sym string, t long"))
    quotes = Frame(
        spark.createDataFrame([("A", 1, 10.0), ("A", 2, None)], "sym string, t long, bid double")
    )
    got = trades.asof_join(quotes, on="t", by=["sym"], value_cols=["bid"]).df.first()
    assert got.bid is None

    # filter_by_value: scientific-notation float literal matches
    sci = Frame(spark.createDataFrame([(1, 1e-07), (2, 2.0)], "id long, x double"))
    assert [r.id for r in sci.filter_by_value(x=1e-07).df.collect()] == [1]

    # LSH band validation
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, num_hashes=16, bands=5)


def test_review_fixes_batch5(spark):
    # head honors declared order after a filter (was limit(n) arbitrary)
    f = Frame(spark.createDataFrame([(i, float(i % 2)) for i in range(8)], "k long, v double"))
    got = sorted(r.k for r in f.ordered("k").filter(F.col("v") > 0).head(2).df.collect())
    assert got == [1, 3]

    # right frame's __rowid__ must not leak through lookup
    left = Frame(spark.createDataFrame([(1,), (2,)], "k long"))
    right = Frame(spark.createDataFrame([(1, 9.0), (2, 8.0)], "k long, w double")).ordered("k")
    out = left.lookup(right, left_on=["k"], right_on=["k"])
    assert "__rowid__" not in out.df.columns

    # semi/anti results restart positions
    sj = left.ordered("k").semi_join(
        Frame(spark.createDataFrame([(2,)], "k long")), left_on=["k"], right_on=["k"]
    )
    assert [r.k for r in sj.ordered("k").head(1).df.collect()] == [2]

    # rename keeps (and renames) the declared order keys
    rn = f.ordered("k").filter(F.col("v") > 0).rename({"k": "key"})
    assert rn.order_keys == ["key"]
    assert sorted(r.key for r in rn.head(2).df.collect()) == [1, 3]

    # asof: null by-keys never match (window would group them together)
    trades = Frame(spark.createDataFrame([(None, 5)], "sym string, t long"))
    quotes = Frame(spark.createDataFrame([(None, 1, 7.0)], "sym string, t long, bid double"))
    assert trades.asof_join(quotes, on="t", by=["sym"], value_cols=["bid"]).df.first().bid is None

    # exotic literal types fall back to stringified comparison
    from decimal import Decimal

    d = Frame(spark.createDataFrame([(1, "1.5")], "id long, x string"))
    assert d.filter_by_value(x=Decimal("1.5")).df.count() == 1


def test_with_rowid_keyed_matches_global_order(spark):
    """The range-partitioned two-pass rowid must equal the global-sort
    rank for any key set."""
    from tada_spark.plans.semantics import with_rowid

    df = spark.createDataFrame([(i * 2654435761 % 999983, i) for i in range(20000)], "k long, payload long")
    got = {r.k: r["__rowid__"] for r in with_rowid(df.repartition(7), ["k"]).collect()}
    want = {k: i for i, k in enumerate(sorted(got))}
    assert got == want  # contiguous 0..n-1 in key order, across partitions


def test_lookup_ordered_honors_declared_order(spark):
    left = Frame(spark.createDataFrame([(1,)], "k long"))
    right = Frame(
        spark.createDataFrame([(1, "late", 2), (1, "early", 1)], "k long, v string, ord long")
    ).ordered("ord")
    got = left.lookup(right, left_on=["k"], right_on=["k"], first_match="ordered").df.first().v
    assert got == "early"  # declared ord order, not physical ingest order
    # decimal canon matches integral-float rendering
    from decimal import Decimal

    d = Frame(spark.createDataFrame([(1, 1.0)], "id long, x double"))
    assert d.filter_by_value(x=Decimal("1.0")).df.count() == 1


def test_semi_anti_cross_type_canon_keys(spark):
    """Cross-typed semi/anti keys compare via canon_str (same rule as
    lookup) — and null keys never match."""
    left = Frame(spark.createDataFrame([(7, "a"), (8, "b"), (None, "c")], "k long, tag string"))
    right = Frame(spark.createDataFrame([("7",), (None,)], "k string"))
    semi = left.semi_join(right, left_on=["k"], right_on=["k"])
    anti = left.anti_join(right, left_on=["k"], right_on=["k"])
    assert [r.tag for r in semi.df.collect()] == ["a"]
    assert sorted(r.tag for r in anti.df.collect()) == ["b", "c"]


def test_lookup_one_sided_keys(spark):
    """Providing only left_on (or only right_on) uses those names on both
    sides instead of silently re-inferring."""
    left = Frame(spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string"))
    right = Frame(spark.createDataFrame([(1, 10.0), (3, 30.0)], "k long, w double"))
    out = left.lookup(right, left_on=["k"]).df
    assert sorted((r.k, r.w) for r in out.collect()) == [(1, 10.0), (2, None)]
    out2 = left.lookup(right, right_on=["k"]).df
    assert sorted((r.k, r.w) for r in out2.collect()) == [(1, 10.0), (2, None)]


def test_set_op_multiplicity_conventions(spark):
    """intersect/except_ are distinct (SQL set semantics);
    intersect_all/except_all preserve multiplicity."""
    a = Frame(spark.createDataFrame([(1,), (1,), (1,), (2,)], "v long"))
    b = Frame(spark.createDataFrame([(1,), (3,)], "v long"))
    assert [r.v for r in a.intersect(b).df.collect()] == [1]
    assert sorted(r.v for r in a.except_(b).df.collect()) == [2]
    assert sorted(r.v for r in a.intersect_all(b).df.collect()) == [1]
    assert sorted(r.v for r in a.except_all(b).df.collect()) == [1, 1, 2]


def test_get_group_null_key(spark):
    """A NULL-keyed group is fetchable (eqNullSafe, not ==)."""
    f = Frame(spark.createDataFrame([("a", 1.0), (None, 2.0), (None, 3.0)], "k string, v double"))
    g = f.group_by("k")
    got = g.get_group(k=None)
    assert sorted(r.v for r in got.df.collect()) == [2.0, 3.0]
    assert [r.v for r in g.get_group(k="a").df.collect()] == [1.0]


def test_grouped_nunique_excludes_keys(spark):
    """Default nunique over value columns must not count the grouping
    key against itself (always 1)."""
    f = Frame(spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 1.0)], "k string, v double"))
    out = f.group_by("k").nunique()
    assert "nunique_k" not in out.columns
    assert sorted((r.k, r.nunique_v) for r in out.df.collect()) == [("a", 2), ("b", 1)]


def test_with_values_positional_append_and_replace(spark):
    """Reference WithCol slice input (dataframe.go:842-878): append a
    driver-side list by row position (declared order), replace keeps
    column position, length mismatch raises."""
    import pytest

    f = Frame(
        spark.createDataFrame([(2, "b"), (1, "a"), (3, "c")], "k long, v string")
    ).ordered("k")
    out = f.with_values("tag", ["x", "y", "z"])
    assert [(r.k, r.tag) for r in out.sort(("k", True)).df.collect()] == [(1, "x"), (2, "y"), (3, "z")]
    # replace keeps position
    out2 = out.with_values("v", ["A", "B", "C"])
    assert out2.columns == ["k", "v", "tag"]
    assert [r.v for r in out2.sort(("k", True)).df.collect()] == ["A", "B", "C"]
    with pytest.raises(ValueError, match="values != "):
        f.with_values("bad", [1, 2])


def test_cast_time_of_day_and_sort(spark):
    """Time-of-day dtype (reference civil.Time types.go:207-220): parse
    HH:MM:SS strings, parse-fail -> null, chronological sort coercion
    (reference internal.go:1286-1295)."""
    import datetime as dt

    f = Frame(
        spark.createDataFrame([("09:30:00",), ("15:04:05",), ("7:05:00",), ("nope",)], "t string")
    ).cast(t="time")
    got = [r.t for r in f.sort(("t", True)).df.collect()]
    assert got == [dt.time(7, 5), dt.time(9, 30), dt.time(15, 4, 5), None]  # nulls last


def test_multimodal_decoder_swap_contract(spark):
    """The stub/real swap point is ONE injectable function: swapping the
    decoder changes decoded values only — schema, batching, and the
    drop-undecodable policy are production code either side of it."""
    from tada_spark.functions import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, bytearray(b"")), (3, None)],
        "media_id long, payload binary",
    )
    def fake_real_image(p):
        if not p:
            raise ValueError("undecodable")  # real decoders raise too
        return (640, 480, 0.5)

    stub = multimodal.image_features(df)
    real = multimodal.image_features(df, decoder=fake_real_image)
    assert stub.schema == real.schema == multimodal.IMAGE_FEATURES_SCHEMA
    # both drop the undecodable rows (empty/None payloads)
    assert {r.media_id for r in stub.collect()} == {r.media_id for r in real.collect()} == {1}
    assert real.first().width == 640 and real.first().mean_luma == 0.5
    def fake_real_audio(p):
        if not p:
            raise ValueError("undecodable")
        return (44100, 1.5, 0.25)

    a_stub = multimodal.audio_features(df)
    a_real = multimodal.audio_features(df, decoder=fake_real_audio)
    assert a_stub.schema == a_real.schema == multimodal.AUDIO_FEATURES_SCHEMA
    assert a_real.first().sample_rate == 44100
    # plan shape is decoder-independent: a single Arrow-batched
    # MapInPandas over the scan, no exchange introduced either side
    for d in (stub, real, a_stub, a_real):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert "Exchange" not in plan


def test_wav_audio_decoder_real_decode(spark):
    """REAL PCM-WAV decode (stdlib wave + numpy): a generated 16-bit
    mono square wave decodes to its exact sample rate, duration, and
    RMS (|±0.5| square wave ⇒ rms 0.5) through the same mapInPandas
    pipeline the stub runs in — the audio path is no longer stub-only."""
    import io
    import wave

    import numpy as np

    from tada_spark.functions import multimodal

    def make_wav(sr: int, seconds: float, amp: float) -> bytes:
        n = int(sr * seconds)
        samples = (np.resize([amp, -amp], n) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    df = spark.createDataFrame(
        [
            (1, bytearray(make_wav(8000, 0.5, 0.5))),
            (2, bytearray(make_wav(16000, 0.25, 1.0))),
            (3, bytearray(b"not a wav")),  # undecodable -> dropped
        ],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in multimodal.audio_features(df, decoder=multimodal.wav_audio_decoder).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].sample_rate == 8000 and out[1].duration_s == 0.5
    assert out[2].sample_rate == 16000 and out[2].duration_s == 0.25
    # astype('<i2') truncates 0.5*32767 to 16383
    assert abs(out[1].rms - 16383 / 32768) < 1e-6
    assert abs(out[2].rms - 32767 / 32768) < 1e-6


def test_pil_image_decoder_real_decode_if_available(spark):
    """Real PIL decode — runs the moment the container gains Pillow,
    skips (documented constraint) until then."""
    import pytest

    from tada_spark.functions import multimodal

    try:
        import PIL  # noqa: F401
    except ImportError:
        pytest.skip("no Pillow in container — pil_image_decoder wired but dormant")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (32, 16), color=128).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "media_id long, payload binary")
    row = multimodal.image_features(df, decoder=multimodal.pil_image_decoder).first()
    assert (row.width, row.height) == (32, 16)
    assert abs(row.mean_luma - 128 / 255) < 1e-6


def test_with_values_preserves_int_type_with_none(spark):
    """int values with a None must land as a LONG column with a null —
    not pandas' silent float64 coercion."""
    f = Frame(spark.createDataFrame([(1,), (2,), (3,)], "k long")).ordered("k")
    out = f.with_values("x", [10, None, 30])
    assert dict(out.df.dtypes)["x"] == "bigint"
    assert [r.x for r in out.sort(("k", True)).df.collect()] == [10, None, 30]
    import pytest

    with pytest.raises(ValueError, match="zero values"):
        Frame(spark.createDataFrame([], "k long")).ordered("k").with_values("x", [])


def test_with_values_mixed_numerics_coerce_to_double(spark):
    """Mixed int/float driver-side values coerce to double (a mixed
    numeric list means double was intended); non-numeric mixes raise
    the friendly ValueError, not a raw Spark merge error."""
    import pytest

    f = Frame(spark.createDataFrame([(1,), (2,)], "k long")).ordered("k")
    out = f.with_values("x", [1, 2.5])
    assert dict(out.df.dtypes)["x"] == "double"
    assert [r.x for r in out.sort(("k", True)).df.collect()] == [1.0, 2.5]
    with pytest.raises(ValueError, match="could not infer"):
        f.with_values("y", [1, "zzz"])


def test_bare_string_accepted_for_column_list_args(spark):
    """order_by/partition_by/subset/key-list args accept a bare string
    as ONE column name — a plain str satisfies Sequence[str] but must
    not iterate as characters (order_by="ts" resolving columns t, s)."""
    f = Frame(
        spark.createDataFrame(
            [(1, 10, None), (2, None, 5), (3, 30, 6)], "ts long, value long, other long"
        )
    )
    assert [r.value for r in f.shift("value", 1, order_by="ts").sort(("ts", True)).df.collect()] == [None, 10, None]
    assert [r.cumsum_value for r in f.cum_sum("value", order_by="ts").sort(("ts", True)).df.collect()] == [10, 10, 40]
    assert [r.value for r in f.fill_null("forward", subset="value", order_by="ts").sort(("ts", True)).df.collect()] == [10, 10, 30]
    g = Frame(spark.createDataFrame([(1, 7)], "ts long, value long"))
    assert f.semi_join(g, left_on="ts", right_on="ts").df.count() == 1
    assert f.anti_join(g, left_on="ts", right_on="ts").df.count() == 2
    assert f.get_values("value", order_by="ts") == [10, None, 30]
    grp = Frame(
        spark.createDataFrame([(1, 1, 4), (1, 2, 9), (2, 3, 2)], "k long, ts long, v long"),
        labels=["k"],
    ).group_by("k")
    first = {r.k: r.first_v for r in grp.first("v", order_by="ts").df.collect()}
    assert first == {1: 4, 2: 2}
