"""Late-round-7 stats family checked against independent brute-force
Python oracles on randomized inputs (the test_r5/r6/r7_properties
model): Mann-Whitney, Gini, weighted quantile, trimmed mean, CUSUM,
clamped balance, best split, interpolate. Each example builds ONE
small DataFrame and compares exact values.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(st.integers(-50, 50), min_size=1, max_size=30)


# ---------------------------------------------------------------------------
# mann_whitney_u ≡ brute midranks
# ---------------------------------------------------------------------------


def _brute_u1_x2(g1: list[int], g2: list[int]) -> int:
    pooled = sorted(g1 + g2)
    # doubled midrank of value v: 2·(#strictly below) + (#equal) + 1
    r1_x2 = 0
    for v in g1:
        below = sum(1 for x in pooled if x < v)
        eq = sum(1 for x in pooled if x == v)
        r1_x2 += 2 * below + eq + 1
    return r1_x2 - len(g1) * (len(g1) + 1)


@given(g1=_vals, g2=_vals)
@settings(**SETTINGS)
def test_mann_whitney_matches_brute(spark, g1, g2):
    """The brute oracle must replicate the operator's FLOAT binning:
    floor((v/100)·100) is not the identity (floor(0.29·100) = 28), and
    the operator is defined over the binned values on both engines."""
    from tada_spark.functions.stats import mann_whitney_u

    rows = [("a", float(v) / 100.0) for v in g1] + [("b", float(v) / 100.0) for v in g2]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "v", "g", "a", "b", scale=100).first()
    b1 = [math.floor(float(v) / 100.0 * 100.0) for v in g1]
    b2 = [math.floor(float(v) / 100.0 * 100.0) for v in g2]
    assert (r.n_g1, r.n_g2) == (len(g1), len(g2))
    assert r.u1_x2 == _brute_u1_x2(b1, b2)


# ---------------------------------------------------------------------------
# gini_by_group ≡ brute sorted formula
# ---------------------------------------------------------------------------


@given(xs=st.lists(st.integers(0, 100), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_gini_matches_brute(spark, xs):
    from tada_spark.functions.stats import gini_by_group

    df = spark.createDataFrame([("g", x) for x in xs], "g string, x long")
    rows = gini_by_group(df, "g", F.col("x")).collect()
    sx = sum(xs)
    if sx == 0:
        assert rows == []
        return
    s = sorted(xs)
    n = len(s)
    six = sum((i + 1) * v for i, v in enumerate(s))
    g = 2.0 * six / (n * sx) - (n + 1.0) / n
    assert rows[0].gini_e6 == math.floor(g * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# weighted_quantile ≡ brute crossing scan
# ---------------------------------------------------------------------------


@given(
    pairs=st.lists(
        st.tuples(st.integers(-30, 30), st.integers(1, 9)), min_size=1, max_size=25
    ),
    q=st.sampled_from([(1, 4), (1, 2), (9, 10)]),
)
@settings(**SETTINGS)
def test_weighted_quantile_matches_brute(spark, pairs, q):
    from tada_spark.functions.stats import weighted_quantile_by_group

    qn, qd = q
    df = spark.createDataFrame([("g", v, w) for v, w in pairs], "g string, v long, w long")
    r = weighted_quantile_by_group(df, "g", F.col("v"), F.col("w"), q_num=qn, q_den=qd).first()
    W = sum(w for _, w in pairs)
    cum = 0
    expect = None
    for v, w in sorted(pairs):
        cum += w
        if cum * qd >= qn * W:
            expect = v
            break
    assert (r.wq_value, r.total_weight) == (expect, W)


# ---------------------------------------------------------------------------
# trimmed_mean ≡ brute slice
# ---------------------------------------------------------------------------


@given(xs=st.lists(st.integers(-100, 100), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_trimmed_mean_matches_brute(spark, xs):
    from tada_spark.frame import Frame

    f = Frame(spark.createDataFrame([("g", x) for x in xs], "g string, x long"), labels=["g"])
    rows = f.group_by("g").trimmed_mean("x", 0.2, out="tm").df.collect()
    k = math.floor(len(xs) * 0.2)
    kept = sorted(xs)[k : len(xs) - k]
    if not kept:
        assert rows == []
        return
    assert rows[0].n_kept == len(kept)
    assert rows[0].tm == sum(kept) / len(kept)


# ---------------------------------------------------------------------------
# cusum_changepoint ≡ brute argmax
# ---------------------------------------------------------------------------


@given(xs=st.lists(st.integers(-20, 20), min_size=2, max_size=25))
@settings(**SETTINGS)
def test_cusum_matches_brute(spark, xs):
    from tada_spark.functions.stats import cusum_changepoint

    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "g string, t long, x long"
    )
    r = cusum_changepoint(df, "g", "t", F.col("x")).first()
    n, sx = len(xs), sum(xs)
    best = None
    cum = 0
    for i, x in enumerate(xs, start=1):
        cum += x
        dev = abs(n * cum - i * sx)
        if best is None or dev > best[0]:
            best = (dev, i - 1)
    assert r.change_at == best[1]
    assert r.cusum_e6 == math.floor(best[0] / n * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# clamped balance closed form ≡ recurrence
# ---------------------------------------------------------------------------


@given(xs=st.lists(st.integers(-15, 15), min_size=1, max_size=25))
@settings(**SETTINGS)
def test_clamped_balance_closed_form_matches_recurrence(spark, xs):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "g string, t long, d long"
    )
    w = Window.partitionBy("g").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    stepped = df.select("t", F.sum("d").over(w).alias("p"))
    out = stepped.select(
        "t",
        (
            F.col("p")
            - F.least(
                F.lit(0),
                F.min("p").over(
                    Window.partitionBy().orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        ).alias("b"),
    )
    got = [r.b for r in out.orderBy("t").collect()]
    b, expect = 0, []
    for x in xs:
        b = max(0, b + x)
        expect.append(b)
    assert got == expect


# ---------------------------------------------------------------------------
# best_split ≡ brute enumeration
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10), st.booleans()), min_size=2, max_size=25
    )
)
@settings(**SETTINGS)
def test_best_split_matches_brute(spark, rows):
    from tada_spark.functions.stats import best_split_by_group

    df = spark.createDataFrame([("g", f, y) for f, y in rows], "g string, f long, y boolean")
    got = best_split_by_group(df, "g", F.col("f"), F.col("y")).collect()
    feats = sorted({f for f, _ in rows})
    best = None
    for s in feats:
        aL = sum(1 for f, y in rows if f <= s and y)
        bL = sum(1 for f, y in rows if f <= s and not y)
        aR = sum(1 for f, y in rows if f > s and y)
        bR = sum(1 for f, y in rows if f > s and not y)
        nL, nR = aL + bL, aR + bR
        if nL == 0 or nR == 0:
            continue
        # the TRUE objective: per-side purity sum, e6-quantized like
        # the operator (the r8 cross-multiplied numerator was NOT
        # order-equivalent — this brute force used to replicate it,
        # which is why it couldn't catch the bug)
        score = math.floor(
            ((aL * aL + bL * bL) / nL + (aR * aR + bR * bR) / nR) * 1e6 + 0.5
        )
        if best is None or score > best[0] or (score == best[0] and s < best[1]):
            best = (score, s, nL, nR)
    if best is None:
        assert got == []
        return
    r = got[0]
    assert (r.score_e6, r.split_at, r.n_left, r.n_right) == best
    # the r8 counterexample shape: a perfect separation must always win
    df2 = spark.createDataFrame(
        [("h", 1, True)] + [("h", 2 + i, False) for i in range(9)],
        "g string, f long, y boolean",
    )
    r2 = best_split_by_group(df2, "g", F.col("f"), F.col("y")).collect()[0]
    assert r2.split_at == 1  # impurity 0; the old score picked f=5


# ---------------------------------------------------------------------------
# Frame.interpolate ≡ brute linear interpolation
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-100, 100)), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_interpolate_matches_brute(spark, vals):
    from tada_spark.frame import Frame

    f = Frame(
        spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)], "k long, x long, v long"
        )
    )
    got = {
        r.x: r.v
        for r in f.interpolate("v", x_col="x", partition_by="k").df.collect()
    }
    known = [(i, v) for i, v in enumerate(vals) if v is not None]
    for i, v in enumerate(vals):
        if v is not None:
            assert got[i] == v
            continue
        prev = max(((x, y) for x, y in known if x < i), default=None)
        nxt = min(((x, y) for x, y in known if x > i), default=None)
        if prev is None or nxt is None:
            assert got[i] is None
        else:
            expect = prev[1] + (nxt[1] - prev[1]) * ((i - prev[0]) / (nxt[0] - prev[0]))
            assert got[i] == expect


# ---------------------------------------------------------------------------
# spearman ≡ brute Pearson over doubled midranks (same IEEE tree)
# ---------------------------------------------------------------------------


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(-5, 5)), min_size=2, max_size=25
    )
)
@settings(**SETTINGS)
def test_spearman_matches_brute(spark, pairs):
    from tada_spark.functions.stats import spearman_by_group

    df = spark.createDataFrame([("g", x, y) for x, y in pairs], "g string, x long, y long")
    r = spearman_by_group(df, "g", F.col("x"), F.col("y")).first()

    def ranks_x2(vs):
        s = sorted(vs)
        return [2 * sum(1 for t in s if t < v) + sum(1 for t in s if t == v) + 1 for v in vs]

    xs = ranks_x2([x for x, _ in pairs])
    ys = ranks_x2([y for _, y in pairs])
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    denx = float(n) * float(sxx) - float(sx) * float(sx)
    deny = float(n) * float(syy) - float(sy) * float(sy)
    if denx > 0 and deny > 0:
        rho = (float(n) * float(sxy) - float(sx) * float(sy)) / (
            math.sqrt(denx) * math.sqrt(deny)
        )
        assert r.spearman_e6 == math.floor(rho * 1e6 + 0.5)
    else:
        assert r.spearman_e6 is None
