"""Round-7 property suites: gaps-and-islands, skyline, PSI, SemDeDup,
PQ/ADC and period growth checked against independent brute-force
Python oracles on randomized inputs (the test_r5/r6_properties model).
Each example builds ONE small DataFrame and compares exact values.
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


# ---------------------------------------------------------------------------
# merge_intervals ≡ brute-force interval union per key
# ---------------------------------------------------------------------------

_intervals = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 50), st.integers(1, 30)),
    min_size=1,
    max_size=25,
)


def _brute_islands(rows):
    out = {}
    by_key = {}
    for k, s, ln in rows:
        by_key.setdefault(k, []).append((s, s + ln))
    for k, ivs in by_key.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        out[k] = islands
    return out


@given(rows=_intervals)
@settings(**SETTINGS)
def test_merge_intervals_matches_brute_union(spark, rows):
    from tada_spark.operators.interval import merge_intervals

    df = spark.createDataFrame(
        [(k, s, s + ln) for k, s, ln in rows], "k string, s long, e long"
    )
    got = {}
    for r in merge_intervals(df, key_cols=["k"], start_col="s", end_col="e").collect():
        got.setdefault(r.k, []).append((r.island_start, r.island_end))
    for k in got:
        got[k].sort()
    assert got == _brute_islands(rows)


# ---------------------------------------------------------------------------
# pareto_frontier_2d ≡ O(n²) dominance scan
# ---------------------------------------------------------------------------

_points = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=25
)


@given(pts=_points)
@settings(**SETTINGS)
def test_pareto_matches_quadratic_scan(spark, pts):
    from tada_spark.operators.skyline import pareto_frontier_2d

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long").repartition(3)
    got = sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect())
    # plain definition: keep iff no strict dominator exists
    expect = sorted(
        i
        for i, x, y in rows
        if not any((x2 <= x and y2 >= y and (x2 < x or y2 > y)) for _, x2, y2 in rows)
    )
    assert got == expect


# ---------------------------------------------------------------------------
# psi_drift ≡ python recompute (py_det_ln), and PSI >= 0
# ---------------------------------------------------------------------------

_psi_rows = st.lists(st.integers(-50, 50), min_size=4, max_size=40)


@given(vals=_psi_rows)
@settings(**SETTINGS)
def test_psi_matches_python_recompute(spark, vals):
    from tada_spark.functions.stats import psi_drift
    from tada_spark.plans.semantics import py_det_ln

    n_bins = 10
    rows = [("g", v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, v long, us long")
    out = psi_drift(df, "grp", F.col("v"), F.col("us"), n_bins=n_bins).collect()
    assert len(out) == 1

    smin, smax = 0, len(vals) - 1
    mid = smin + (smax - smin) // 2
    vmin, vmax = min(vals), max(vals)
    rng = vmax - vmin + 1
    c0: dict[int, int] = {}
    c1: dict[int, int] = {}
    for i, v in enumerate(vals):
        b = min(n_bins - 1, ((v - vmin) * n_bins) // rng)
        (c0 if i <= mid else c1)[b] = (c0 if i <= mid else c1).get(b, 0) + 1
    t0, t1 = sum(c0.values()), sum(c1.values())
    psi = 0
    for b in range(n_bins):
        p = (c0.get(b, 0) + 1) / (t0 + n_bins)
        q = (c1.get(b, 0) + 1) / (t1 + n_bins)
        psi += math.floor((p - q) * py_det_ln(p / q) * 1e6 + 0.5)
    r = out[0]
    assert (r.n_first, r.n_second, r.psi_e6) == (t0, t1, psi)
    # PSI is a sum of (p-q)ln(p/q) >= 0 terms; quantization admits at
    # most one ulp of slack per bin
    assert r.psi_e6 >= -n_bins


# ---------------------------------------------------------------------------
# semdedup ≡ brute-force python replication
# ---------------------------------------------------------------------------

_vecs = st.lists(
    st.tuples(
        st.integers(0, 1), st.integers(0, 3)
    ),  # tiny grid so duplicates happen often
    min_size=2,
    max_size=12,
)


@given(vs=_vecs, tau=st.sampled_from([500000, 900000, 1000000]))
@settings(**SETTINGS)
def test_semdedup_matches_brute(spark, vs, tau):
    from tada_spark.functions.similarity import semdedup

    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = 2
    got = {r.vec_id: (r.cluster, r.kept) for r in semdedup(df, k=k, tau_e6=tau).collect()}

    # python replication: integer grid, init = k lowest ids, 1 assignment
    grid = {i: [round(a * 1e6), round(b * 1e6)] for i, (a, b) in enumerate(vs)}
    cents = {i: grid[i] for i in sorted(grid)[:k]}
    assign = {}
    for i, v in grid.items():
        best = min(
            cents.items(),
            key=lambda kv: (sum((x - c) ** 2 for x, c in zip(v, kv[1])), kv[0]),
        )
        assign[i] = best[0]
    pruned = set()
    for a in grid:
        for b in grid:
            if a < b and assign[a] == assign[b]:
                na = sum(x * x for x in grid[a])
                nb = sum(x * x for x in grid[b])
                if na > 0 and nb > 0:
                    cos = sum(x * y for x, y in zip(grid[a], grid[b])) / (
                        math.sqrt(float(na)) * math.sqrt(float(nb))
                    )
                    if math.floor(cos * 1e6 + 0.5) >= tau:
                        pruned.add(b)
    expect = {i: (assign[i], i not in pruned) for i in grid}
    assert got == expect


# ---------------------------------------------------------------------------
# pq_adc_topk: adc distances ≡ python replication
# ---------------------------------------------------------------------------

_pq_vecs = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 2), st.integers(0, 2)),
    min_size=3,
    max_size=10,
)


@given(vs=_pq_vecs)
@settings(**SETTINGS)
def test_pq_adc_matches_python(spark, vs):
    from tada_spark.functions.similarity import pq_adc_topk

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m_sub, k_cent, n_probes = 2, 2, 2
    got = {
        (r.query_id, r.neighbor_id): (r.adc_dist, r.rank)
        for r in pq_adc_topk(df, m_sub=m_sub, k_cent=k_cent, n_probes=n_probes, k=100).collect()
    }

    grid = {i: [round(x * 1e6) for x in v] for i, (v) in enumerate([list(v) for v in vs])}
    nd = 4
    sub_len = nd // m_sub
    cents = {i: grid[i] for i in sorted(grid)[:k_cent]}

    def sdist(v, c, sub):
        lo, hi = sub * sub_len, (sub + 1) * sub_len
        return sum((v[d] - c[d]) ** 2 for d in range(lo, hi))

    codes = {}
    d1 = {}
    for i, v in grid.items():
        for sub in range(m_sub):
            best = min(cents.items(), key=lambda kv: (sdist(v, kv[1], sub), kv[0]))
            codes[(i, sub)] = best[0]
            for cid, c in cents.items():
                d1[(i, sub, cid)] = sdist(v, c, sub)
    probes = sorted(grid)[:n_probes]
    expect = {}
    for p in probes:
        scored = []
        for i in grid:
            if i == p:
                continue
            scored.append((sum(d1[(p, s, codes[(i, s)])] for s in range(m_sub)), i))
        scored.sort()
        for rank, (dist, i) in enumerate(scored, 1):
            expect[(p, i)] = (dist, rank)
    assert got == expect


# ---------------------------------------------------------------------------
# period_growth ≡ python recompute
# ---------------------------------------------------------------------------

_growth = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=30
)


@given(rows=_growth)
@settings(**SETTINGS)
def test_period_growth_matches_python(spark, rows):
    from tada_spark.functions.stats import period_growth

    df = spark.createDataFrame(
        [(f"p{b}", v) for b, v in rows], "b string, v long"
    )
    got = {
        r.bucket: (r.total_cents, r.growth_e6)
        for r in period_growth(df, F.col("b"), F.col("v")).collect()
    }
    totals: dict[str, int] = {}
    for b, v in rows:
        totals[f"p{b}"] = totals.get(f"p{b}", 0) + v
    expect = {}
    prev = None
    for b in sorted(totals):
        t = totals[b]
        g = None
        if prev is not None and prev != 0:
            g = math.floor((t - prev) / abs(prev) * 1e6 + 0.5)
        expect[b] = (t, g)
        prev = t
    assert got == expect
