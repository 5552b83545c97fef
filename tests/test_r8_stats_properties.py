"""Round-8 stats family checked against independent brute-force Python
oracles on randomized inputs (the test_r5/r6/r7_properties model):
mutual information, ROC-AUC, Theil-Sen, seasonal decomposition,
retrieval metrics. Each example builds ONE small DataFrame and
compares exact values — py_det_ln is bit-equal to the Spark tree, so
even the ln-based MI matches to the quantized unit.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tada_spark.plans.semantics import py_det_ln

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# mutual_information ≡ brute cell sums over py_det_ln
# ---------------------------------------------------------------------------


def _brute_mi_e6(xs: list[str], ys: list[str]) -> tuple[int, int]:
    n = len(xs)
    cells = Counter(zip(xs, ys))
    mx = Counter(xs)
    my = Counter(ys)
    tot = 0
    for (x, y), nxy in cells.items():
        ratio = (float(nxy) * float(n)) / (float(mx[x]) * float(my[y]))
        term = (float(nxy) / float(n)) * py_det_ln(ratio)
        tot += math.floor(term * 1e6 + 0.5)
    return n, tot


@given(
    data=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("pqrs")),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_mutual_information_matches_brute(spark, data):
    from tada_spark.functions.stats import mutual_information

    df = spark.createDataFrame(data, "x string, y string")
    row = mutual_information(df, F.col("x"), [("p", F.col("y"))]).first()
    n, mi = _brute_mi_e6([x for x, _ in data], [y for _, y in data])
    assert (row.pair, row.n, row.mi_e6) == ("p", n, mi)
    # MI of any observed joint distribution is non-negative up to the
    # per-cell quantization (each cell may round down by < 1 unit)
    assert row.mi_e6 >= -len(set(data))


# ---------------------------------------------------------------------------
# roc_auc_by_group ≡ brute pair counting (P(s+ > s-) + ties/2)
# ---------------------------------------------------------------------------


@given(
    pos=st.lists(st.integers(-20, 20), min_size=0, max_size=25),
    neg=st.lists(st.integers(-20, 20), min_size=0, max_size=25),
)
@settings(**SETTINGS)
def test_roc_auc_matches_pair_counting(spark, pos, neg):
    from tada_spark.functions.stats import roc_auc_by_group

    rows = [("g", 1, s) for s in pos] + [("g", 0, s) for s in neg]
    if not rows:
        return
    df = spark.createDataFrame(rows, "g string, pos int, s long")
    row = roc_auc_by_group(df, "g", F.col("pos"), F.col("s")).first()
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    if not pos or not neg:
        assert row.auc_e6 is None
        return
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    # the operator computes U·2/(2·n1·n0) — same rational, one division
    assert row.auc_e6 == math.floor(
        (2 * wins + ties) / (2.0 * len(pos) * len(neg)) * 1e6 + 0.5
    )
    assert abs(row.auc_e6 / 1e6 - auc) < 1e-5


# ---------------------------------------------------------------------------
# theil_sen_by_group ≡ brute pairwise-slope median (after per-x collapse)
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(-1000, 1000)),
        min_size=2,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_theil_sen_matches_brute(spark, pts):
    from tada_spark.functions.stats import theil_sen_by_group

    # collapse duplicate x by summing y — the operator's spine rule
    spine = defaultdict(int)
    for x, y in pts:
        spine[x] += y
    if len(spine) < 2:
        return
    df = spark.createDataFrame([("g", x, y) for x, y in pts], "g string, x long, y long")
    row = theil_sen_by_group(df, "g", F.col("x"), F.col("y")).first()
    xs = sorted(spine)
    slopes = sorted(
        math.floor((spine[xb] - spine[xa]) / float(xb - xa) * 1e6 + 0.5)
        for i, xa in enumerate(xs)
        for xb in xs[i + 1:]
    )
    m = len(slopes)
    lo, hi = slopes[(m + 1) // 2 - 1], slopes[(m + 2) // 2 - 1]
    assert (row.n_points, row.n_pairs) == (len(xs), m)
    assert row.slope_med_e6_x2 == lo + hi


# ---------------------------------------------------------------------------
# seasonal_decompose_weekday ≡ brute rolling replay (positive series)
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
    start=st.integers(0, 6),
)
@settings(**SETTINGS)
def test_seasonal_decompose_matches_brute(spark, vals, start):
    import datetime

    from tada_spark.functions.stats import seasonal_decompose_weekday

    days = [datetime.date(2024, 1, 1) + datetime.timedelta(days=start + i) for i in range(len(vals))]
    df = spark.createDataFrame(list(zip(days, vals)), "d date, c long")
    out = {r.day: r for r in seasonal_decompose_weekday(df, F.col("d"), F.col("c")).collect()}

    u = [v * 10000 for v in vals]
    n = len(vals)
    trend = [
        sum(u[i - 3:i + 4]) // 7 if 3 <= i <= n - 4 else None for i in range(n)
    ]
    det = [u[i] - trend[i] if trend[i] is not None else None for i in range(n)]
    by_wd = defaultdict(list)
    for i, d in enumerate(days):
        if det[i] is not None:
            by_wd[d.isoweekday() % 7].append(det[i])  # Sunday = 0
    seas = {wd: math.floor(sum(v) / len(v) + 0.5) for wd, v in by_wd.items()}
    for i, d in enumerate(days):
        r = out[d]
        assert r.revenue_c == vals[i]
        if trend[i] is None:
            assert r.trend_e6 is None and r.seasonal_e6 is None and r.remainder_e6 is None
        else:
            assert r.trend_e6 == trend[i]
            assert r.seasonal_e6 == seas[d.isoweekday() % 7]
            assert r.remainder_e6 == det[i] - seas[d.isoweekday() % 7]


# ---------------------------------------------------------------------------
# retrieval_metrics_at_k ≡ brute
# ---------------------------------------------------------------------------


@given(rels=st.lists(st.booleans(), min_size=1, max_size=30), k=st.integers(1, 10))
@settings(**SETTINGS)
def test_retrieval_metrics_match_brute(spark, rels, k):
    from tada_spark.functions.stats import retrieval_metrics_at_k

    rows = [("g", i + 1, int(r)) for i, r in enumerate(rels)]
    df = spark.createDataFrame(rows, "g string, rk long, rel int")
    row = retrieval_metrics_at_k(df, "g", "rk", "rel", k).first()
    n_rel = sum(rels)
    hits = sum(rels[:k])
    assert row.n_rel == n_rel
    if n_rel == 0:
        assert row.first_rel_rank is None
        assert getattr(row, f"recall_at_{k}_e6") is None
        return
    first = rels.index(True) + 1
    assert row.first_rel_rank == first
    assert row.rr_e6 == math.floor(1.0 / first * 1e6 + 0.5)
    assert getattr(row, f"recall_at_{k}_e6") == math.floor(hits / n_rel * 1e6 + 0.5)
    assert getattr(row, f"precision_at_{k}_e6") == math.floor(hits / float(k) * 1e6 + 0.5)
