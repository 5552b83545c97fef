"""End-to-end golden pipeline — the reference's README flow
(readme_test.go:12-144): messy CSV → HasCols → DropNull → Cast →
Filter → Sort → GroupBy.Mean → EqualRecords / EqualStructs.

This is the M0 vertical slice from SURVEY §7.2 — it proves ingest,
null shim, cast, filter, sort, grouped reduce, and both golden
comparison harnesses in one chain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from tada_spark.frame import Frame
from tada_spark.sources.records import read_records
from tada_spark.testing import equal_records, equal_structs


CSV_RECORDS = [
    ["name", "score"],
    ["joe doe", "120"],
    ["jane doe", "x"],          # unparseable → null after cast
    ["john doe", "-100"],       # out of range
    ["jane doe", "8"],
    ["joe doe", "7"],
    ["jane doe", "6"],
]


@dataclass
class MeanScore:
    name: str
    mean_score: float


def _pipeline(spark) -> Frame:
    f = read_records(spark, CSV_RECORDS, header_rows=1)
    f = f.has_cols("name", "score")
    f = f.cast(score="double")          # "x" → null (parse failure)
    f = f.drop_null("score")
    f = f.filter((F.col("score") >= 0) & (F.col("score") <= 10))
    g = f.group_by("name").mean("score")
    return g.rename({"mean_score": "mean_score"}).sort("name")


def test_readme_pipeline_equal_records(spark):
    out = _pipeline(spark)
    ok, diffs = equal_records(
        out,
        [
            ["name", "mean_score"],
            ["jane doe", "7"],
            ["joe doe", "7"],
        ],
    )
    assert ok, diffs


def test_readme_pipeline_equal_structs(spark):
    out = _pipeline(spark)
    ok, diffs = equal_structs(
        out,
        [MeanScore("jane doe", 7.0), MeanScore("joe doe", 7.0)],
        sort_key="name",
    )
    assert ok, diffs


def test_pipeline_bin_with_open_edges(spark):
    f = read_records(spark, CSV_RECORDS, header_rows=1).cast(score="double")
    out = f.bin("score", [0, 5, 10], and_less=True, and_more=True, as_col="b")
    rows = {r.name + str(r.score): r.b for r in out.df.collect()}
    assert rows["joe doe120.0"] == ">10"
    assert rows["john doe-100.0"] == "<=0"
    assert rows["jane doe8.0"] == "5-10"
    assert rows["jane doex" if "jane doex" in rows else "jane doeNone"] is None


def test_lookup_right_anchor(spark):
    left = Frame(spark.createDataFrame([("k1", 1.0)], "k string, v double"), labels=["k"])
    right = Frame(spark.createDataFrame([("k1", "a"), ("k9", "b")], "k string, s string"), labels=["k"])
    out = left.lookup(right, how="right")
    rows = {r.k: (r.s, r.v) for r in out.df.collect()}
    assert rows == {"k1": ("a", 1.0), "k9": ("b", None)}  # anchored on right


def test_iter_groups(spark):
    f = Frame(spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int"))
    groups = {key[0]: frame.count() for key, frame in f.group_by("k").iter_groups()}
    assert groups == {"a": 2, "b": 1}


def test_read_slices_and_from_pandas(spark):
    import pandas as pd

    from tada_spark.sources.records import from_pandas, read_slices

    f = read_slices(spark, {"k": ["a", "b"], "v": [1.0, 2.0]}, labels=["k"])
    assert f.labels == ["k"] and f.count() == 2
    pf = from_pandas(spark, pd.DataFrame({"x": [1.0, float("nan")]}))
    vals = [r.x for r in pf.df.collect()]
    assert vals[0] == 1.0 and vals[1] is None  # NaN normalized to NULL
