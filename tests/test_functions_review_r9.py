"""Regression pins for the round-9 text/dedup/similarity review.

Fourth targeted review pass: degenerate-input defects in the
training-data tier — zero-norm embeddings killing every cosine operator
under ANSI, blank needles/documents flagging or pairing entire corpora,
NULL texts collapsing into one exact-dedup group, hardcoded numeric id
assumptions, and an unreachable empty-text guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_cosine_zero_norm_is_null_not_crash(spark):
    from tada_spark.functions.similarity import cosine, cosine_topk

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 4.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # before: DIVIDE_BY_ZERO under the session's default ANSI mode
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert {r.neighbor_id for r in out} == {1}  # zero-norm row unranked
    val = spark.range(1).select(
        cosine(F.lit(None).cast("array<double>"), F.array(F.lit(1.0))).alias("c")
    ).collect()[0].c
    assert val is None


def test_exact_substring_blank_needle_matches_nothing(spark):
    from tada_spark.functions.text import exact_substring_hits

    corpus = spark.createDataFrame([(1, "one two"), (2, "three")], "doc_id long, text string")
    needles = spark.createDataFrame([(10, ""), (11, "two")], "needle_id long, needle string")
    out = [(r.doc_id, r.needle_id) for r in exact_substring_hits(
        corpus, needles, corpus_id="doc_id", corpus_text="text",
        needle_id="needle_id", needle_text="needle",
    ).collect()]
    # before: the blank needle "hit" every doc at position 1
    assert out == [(1, 11)]


def test_exact_dedup_null_text_not_grouped(spark):
    from tada_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "hello"), (4, None)], "doc_id long, text string"
    )
    out = exact_dedup(df).collect()
    # before: one fp=NULL group (keep_id=1, n_dups=3) declared docs
    # 2 and 4 duplicates of doc 1 with no content compared
    assert len(out) == 1 and out[0].n_dups == 1 and out[0].keep_id == 3


def test_simhash_blank_docs_generate_no_candidates(spark):
    from tada_spark.functions.dedup import simhash, simhash_bands

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text here"), (4, None)], "doc_id long, text string"
    )
    # before: all blank docs shared one fingerprint -> m^2 pairs
    assert simhash_bands(df).count() == 0
    vals = df.select(simhash(F.col("text")).alias("sh")).collect()
    assert [v.sh is None for v in vals] == [True, True, False, True]


def test_contamination_hits_ignores_phantom_shingles(spark):
    from tada_spark.functions.text import contamination_hits

    corpus = spark.createDataFrame(
        [(1, ""), (2, "x" * 30)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("",), ("y" * 10,)], "text string")
    # before: char_shingles('') = [''] and sub-24-char docs emitted one
    # whole-text shingle — doc 1 was reported contaminated by the blank
    # benchmark row
    assert contamination_hits(corpus, bench, ngram_chars=24).count() == 0


def test_kcenter_accepts_string_ids(spark):
    from tada_spark.functions.similarity import kcenter_select

    df = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [3.0, 0.0]), ("c", [0.0, 4.0])],
        "vec_id string, embedding array<double>",
    )
    rows = kcenter_select(df, k=2).collect()
    # seed = lowest id 'a'; farthest point is 'c' (d2=16 > 9)
    assert [(r.sel_order, r.vec_id) for r in rows] == [(0, "a"), (1, "c")]


def test_kcenter_numeric_semantics_unchanged(spark):
    from tada_spark.functions.similarity import kcenter_select

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_select(df, k=2).collect()
    # distance tie (9 vs 9) -> LOWEST id wins, as before
    assert [(r.sel_order, r.vec_id) for r in rows] == [(0, 1), (1, 2)]


def test_lsh_cosine_pairs_empty_tables_raises(spark):
    from tada_spark.functions.similarity import lsh_cosine_pairs

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-empty"):
        lsh_cosine_pairs(df, tables=[])


def test_equal_structs_empty_want_failure_has_diff(spark):
    import dataclasses

    from tada_spark.frame import Frame
    from tada_spark.testing.equal import equal_structs

    @dataclasses.dataclass
    class Row:
        a: int

    f = Frame(spark.createDataFrame([(1,), (2,)], "a int"))
    ok, diffs = equal_structs(f, [])
    assert not ok and diffs == ["row count: got 2 != want 0"]


def test_stopword_ratio_empty_is_null(spark):
    from tada_spark.functions.text import stopword_ratio

    rows = spark.createDataFrame([("",), ("   ",), (None,), ("the cat",)], "t string").select(
        stopword_ratio(F.col("t")).alias("r")
    ).collect()
    assert [r.r for r in rows[:3]] == [None, None, None]
    assert rows[3].r == 0.5
