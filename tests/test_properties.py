"""Property-based tests (hypothesis) for the load-bearing semantics.

The reference has no property testing (SURVEY.md §5 "Not present");
these pin the invariants the whole engine leans on — null discipline,
canon-key equality, sort stability, fill order — against independent
pandas replicas on randomized inputs. Examples are kept small and few:
every example is a real Spark job.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tada_spark.frame import Frame
from tada_spark.plans.semantics import canon_str

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats = st.one_of(
    st.none(),
    st.integers(-1000, 1000).map(float),
    st.floats(-1e6, 1e6, allow_nan=False, width=32).map(float),
)
keys = st.sampled_from(["a", "b", "c", None])


@given(data=st.lists(st.tuples(keys, floats), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_grouped_sum_matches_pandas_null_skipping(spark, data):
    f = Frame(spark.createDataFrame(data, "k string, v double"))
    got = {r.k: r.sum_v for r in f.group_by("k").agg(sum_v=F.sum("v")).df.collect()}
    pdf = pd.DataFrame(data, columns=["k", "v"])
    for k, grp in pdf.groupby("k", dropna=False):
        k = None if (not isinstance(k, str) and pd.isna(k)) else k
        vals = grp["v"].dropna()
        want = None if vals.empty else float(vals.sum())  # all-null group ⇒ null
        assert got[k] == want or (want is not None and math.isclose(got[k], want))


@given(data=st.lists(st.tuples(floats, st.integers(0, 3)), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_sort_nulls_last_and_stable(spark, data):
    rows = [(i, v, g) for i, (v, g) in enumerate(data)]
    f = Frame(spark.createDataFrame(rows, "idx long, v double, g long")).ordered("idx")
    got = [r.idx for r in f.sort(("g", True)).df.collect()]
    pdf = pd.DataFrame(rows, columns=["idx", "v", "g"])
    want = list(pdf.sort_values("g", kind="stable", na_position="last")["idx"])
    assert got == want  # equal keys keep ingest order; nulls always last


@given(data=st.lists(floats, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_ffill_bfill_match_pandas(spark, data):
    rows = list(enumerate(data))
    f = Frame(spark.createDataFrame(rows, "idx long, v double")).ordered("idx")
    for how, pd_how in [("forward", "ffill"), ("backward", "bfill")]:
        got = [r.v for r in f.fill_null(how, subset=["v"], order_by=["idx"]).df.orderBy("idx").collect()]
        want = list(getattr(pd.Series(data, dtype="float64"), pd_how)())
        assert all(
            (g is None and pd.isna(w)) or (g is not None and not pd.isna(w) and g == w)
            for g, w in zip(got, want)
        )


@given(data=st.lists(st.tuples(keys, floats), min_size=1, max_size=20), thr=floats)
@settings(**SETTINGS)
def test_filter_partition_nulls_never_match(spark, data, thr):
    if thr is None:
        thr = 0.0
    f = Frame(spark.createDataFrame(data, "k string, v double"))
    p = F.col("v") > thr
    matched = f.filter(p).df.count()
    inverse = f.filter(~p).df.count()
    nulls = f.df.filter(F.col("v").isNull()).count()
    assert matched + inverse + nulls == len(data)  # tri-valued partition


@given(vals=st.lists(st.one_of(st.integers(-10**6, 10**6).map(float),
                               st.floats(-1e6, 1e6, allow_nan=False)),
                     min_size=1, max_size=20))
@settings(**SETTINGS)
def test_canon_str_float_fmt_sprint_parity(spark, vals):
    """Integral floats print with no decimal part — Go fmt.Sprint parity
    (reference valueContainers.go:194-196): canon('1.0') == canon(1)."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx long, v double")
    got = {
        r.idx: r.c
        for r in df.select("idx", canon_str(F.col("v"), df.schema["v"].dataType).alias("c")).collect()
    }
    for i, v in rows:
        if v == int(v) and abs(v) < 2**63:
            assert got[i] == str(int(v))
        else:
            assert got[i] != str(v).rstrip("0").rstrip(".") or "." in got[i] or "E" in got[i]


@given(
    left=st.lists(st.tuples(keys, floats), min_size=1, max_size=15),
    right=st.lists(st.tuples(keys, floats), min_size=0, max_size=30),
)
@settings(**SETTINGS)
def test_lookup_never_multiplies_rows(spark, left, right):
    """Dictionary-lookup joins use ONE right match: whatever the right-
    side duplication, the left row count is preserved exactly
    (reference internal.go:1486-1517)."""
    lf = Frame(spark.createDataFrame(left, "k string, v double"))
    rf = Frame(spark.createDataFrame(right, "k string, w double") if right
               else spark.createDataFrame([], "k string, w double"))
    out = lf.lookup(rf, left_on=["k"], right_on=["k"])
    assert out.df.count() == len(left)


@given(ints=st.lists(st.integers(-50, 50), min_size=1, max_size=15))
@settings(**SETTINGS)
def test_canon_grouping_type_blind(spark, ints):
    """§1.6 stringified-key equality: grouping a DOUBLE column with
    canon=True lands integral floats in the same group as their integer
    string form — canon('7.0') == canon(7) == '7'."""
    f = Frame(
        spark.createDataFrame([(float(i),) for i in ints], "k double")
        .select(F.col("k"), F.lit(1).alias("one"))
    )
    got = {r.k: r.n for r in f.group_by("k", canon=True).agg(n=F.sum("one")).df.collect()}
    from collections import Counter

    want = Counter(str(i) for i in ints)
    assert got == dict(want)  # keys are canon strings, counts match


@given(days=st.lists(st.integers(0, 364), min_size=1, max_size=15))
@settings(**SETTINGS)
def test_resample_idempotent(spark, days):
    """resample(resample(x)) == resample(x) for truncations."""
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(days)], "idx long, d long"
    ).selectExpr("idx", "timestampadd(DAY, d, timestamp'2024-01-01 07:31:00') AS ts")
    f = Frame(df)
    for by in ("month", "week"):
        once = f.resample("ts", by)
        twice = once.resample("ts", by)
        a = {r.idx: r.ts for r in once.df.collect()}
        b = {r.idx: r.ts for r in twice.df.collect()}
        assert a == b


@given(vals=st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=15))
@settings(**SETTINGS)
def test_bin_edges_left_exclusive_right_inclusive(spark, vals):
    """Reference Bin semantics (internal.go:2208-2300): (lo, hi] —
    value == left edge of the lowest bin is uncategorized."""
    edges = [0.0, 25.0, 50.0, 100.0]
    f = Frame(spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "idx long, v double"))
    got = {r.idx: r.bin_v for r in f.bin("v", edges).df.collect()}
    for i, v in enumerate(vals):
        if v <= edges[0] or v > edges[-1]:
            assert got[i] is None
        else:
            lo = max(e for e in edges[:-1] if e < v)
            hi = min(e for e in edges[1:] if v <= e)
            assert got[i] is not None and f"{lo:g}" in got[i] and f"{hi:g}" in got[i]
