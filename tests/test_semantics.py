"""Semantics-shim unit tests (reference parity quirks, SURVEY §1.4, §1.6)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tada_spark.frame import Frame
from tada_spark.plans.semantics import canon_str, normalize_nulls, null_safe_div


def test_canon_str_integral_float(spark):
    """fmt.Sprint parity: 1.0 prints '1', 1.5 prints '1.5'."""
    df = spark.createDataFrame([(1.0,), (1.5,), (None,)], "v double")
    out = df.select(canon_str(F.col("v"), T.DoubleType()).alias("s")).collect()
    assert [r.s for r in out] == ["1", "1.5", "\x00null"]


def test_canon_str_cross_type_join_key(spark):
    """Int 7 and string '7' canonicalize identically (reference §1.6)."""
    a = spark.createDataFrame([(7,)], "k long")
    b = spark.createDataFrame([("7",)], "k string")
    va = a.select(canon_str(F.col("k"), T.LongType()).alias("c")).first().c
    vb = b.select(canon_str(F.col("k"), T.StringType()).alias("c")).first().c
    assert va == vb == "7"


def test_normalize_nulls_nan_and_null_strings(spark):
    df = spark.createDataFrame(
        [(float("nan"), "(null)"), (1.0, "x"), (2.0, "")],
        "f double, s string",
    )
    out = normalize_nulls(df, blank_as_null=True).collect()
    assert out[0].f is None and out[0].s is None
    assert out[1].f == 1.0 and out[1].s == "x"
    assert out[2].s is None


def test_null_safe_div(spark):
    df = spark.createDataFrame([(1.0, 0.0), (6.0, 2.0)], "a double, b double")
    out = df.select(null_safe_div(F.col("a"), F.col("b")).alias("r")).collect()
    assert out[0].r is None and out[1].r == 3.0


def test_filters_never_match_null(spark):
    """Reference internal.go:1184: null rows never pass a filter."""
    f = Frame(spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double"))
    assert f.filter(F.col("v") != 3.0).df.count() == 1
    assert f.filter(F.col("v") < 100).df.count() == 2


def test_sort_nulls_last_both_directions(spark):
    f = Frame(spark.createDataFrame([(None,), (2.0,), (1.0,)], "v double"))
    asc = [r.v for r in f.sort(("v", True)).df.collect()]
    desc = [r.v for r in f.sort(("v", False)).df.collect()]
    assert asc == [1.0, 2.0, None]
    assert desc == [2.0, 1.0, None]


def test_all_null_group_aggregates_to_null(spark):
    """Reference internal.go:1979-2170: all-null group ⇒ null result."""
    f = Frame(spark.createDataFrame([("a", None), ("a", None), ("b", 1.0)], "k string, v double"))
    rows = {r.k: r.sum_v for r in f.group_by("k").sum("v").df.collect()}
    assert rows["a"] is None and rows["b"] == 1.0


def test_stddev_is_population(spark):
    """Reference internal.go:2042-2057: std divides by n, not n-1."""
    f = Frame(spark.createDataFrame([("a", 1.0), ("a", 3.0)], "k string, v double"))
    std = f.group_by("k").std("v").df.first().std_v
    assert math.isclose(std, 1.0)  # pop-std of {1,3}; sample std would be sqrt(2)


def test_nunique_stringified(spark):
    """Reference internal.go:2076-2094: distinct on stringified values."""
    f = Frame(spark.createDataFrame([("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", None)], "k string, v double"))
    assert f.group_by("k").nunique("v").df.first().nunique_v == 2


def test_canon_str_null_boolean_hits_sentinel(spark):
    """NULL boolean must render the null sentinel, not 'false' —
    otherwise canon-keyed grouping merges NULL with false."""
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    out = df.select(canon_str(F.col("b"), T.BooleanType()).alias("s")).collect()
    assert [r.s for r in out] == ["true", "false", "\x00null"]


def test_canon_str_decimal_trailing_zeros(spark):
    """Decimal '1.50' and double 1.5 must canonicalize identically
    (fmt.Sprint strips scale); integral decimals print as ints."""
    from decimal import Decimal

    from tada_spark.plans.semantics import py_canon

    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("2.00"),), (Decimal("0.25"),), (None,)],
        "d decimal(10,2)",
    )
    out = df.select(canon_str(F.col("d"), T.DecimalType(10, 2)).alias("s")).collect()
    assert [r.s for r in out] == ["1.5", "2", "0.25", "\x00null"]
    assert py_canon(Decimal("1.50")) == "1.5"
    assert py_canon(Decimal("2.00")) == "2"
    assert py_canon(Decimal("0.25")) == "0.25"


def test_cast_full_reference_format_list(spark):
    """Every reference datetime format (reference options.go:20-23)
    parses; garbage -> null; 2-digit years follow the C/Go century
    convention (69-99 -> 19xx), not Java's 2000-2099 window."""
    import datetime as dt

    rows = [
        ("2006-01-02",),                        # ISO date
        ("01-02-2006",),                        # US dash
        ("01/02/2006",),                        # US slash
        ("1/2/06",),                            # short yy (-> 2006)
        ("1/2/96",),                            # short yy (-> 1996, not 2096)
        ("2006-01-02T15:04:05Z",),              # RFC3339
        ("2006-01-02T15:04:05.999999999Z",),    # RFC3339Nano
        ("02 Jan 06 15:04",),                   # RFC822 (zone-free)
        ("3:04PM",),                            # kitchen
        ("3:04pm",),                            # kitchen lowercase
        ("definitely not a date",),
        ("2006-01-02 15:04:05 -0700 MST",),     # Go default render
    ]
    f = Frame(spark.createDataFrame(rows, "s string")).cast(s="timestamp")
    got = [r.s for r in f.df.collect()]
    d = dt.datetime
    assert got[0] == d(2006, 1, 2)
    assert got[1] == got[2] == d(2006, 1, 2)
    assert got[3] == d(2006, 1, 2)
    assert got[4] == d(1996, 1, 2)
    assert got[5] == d(2006, 1, 2, 15, 4, 5)
    assert got[6] == d(2006, 1, 2, 15, 4, 5, 999999)
    assert got[7] == d(2006, 1, 2, 15, 4)
    assert got[8] == got[9] == d(1970, 1, 1, 15, 4)
    assert got[10] is None
    assert got[11] == d(2006, 1, 2, 22, 4, 5)  # -0700 -> UTC session tz


def test_cast_yy_century_from_source_string_not_utc_year(spark):
    """The 69/99 century rule must read the 2-digit year from the SOURCE
    string: a zoned local-2068 New-Year's-Eve timestamp crosses into
    UTC-2069 and would otherwise be shifted back a century."""
    import datetime as dt

    rows = [
        ("31 Dec 68 23:30 EST",),   # local 2068 -> UTC 2069-01-01 04:30; stays 2068-source
        ("02 Jan 69 15:04",),       # 69 -> 1969
    ]
    f = Frame(spark.createDataFrame(rows, "s string")).cast(s="timestamp")
    got = [r.s for r in f.df.collect()]
    assert got[0] == dt.datetime(2069, 1, 1, 4, 30)   # NOT shifted to 1969
    assert got[1] == dt.datetime(1969, 1, 2, 15, 4)
