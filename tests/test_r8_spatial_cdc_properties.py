"""Round-8 spatial/CDC/selection operators vs brute-force Python
oracles on randomized inputs: DBSCAN classification, containment
join, point-in-time join, k-center greedy. Small worlds, exact
comparison — the grid/carry/fold plans must be semantically invisible.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_pt = st.tuples(st.integers(0, 60), st.integers(0, 60))


@given(pts=st.lists(_pt, min_size=1, max_size=25, unique=True),
       eps=st.integers(3, 15), min_pts=st.integers(2, 5))
@settings(**SETTINGS)
def test_dbscan_matches_brute(spark, pts, eps, min_pts):
    from tada_spark.operators.spatial import dbscan_classify

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, x long, y long")
    got = {r.pid: (r.n_in_eps, r.role) for r in
           dbscan_classify(df, id_col="pid", x_col="x", y_col="y",
                           eps=eps, min_pts=min_pts).collect()}

    def d2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    nbr = {i: [j for j, q in enumerate(pts) if d2(p, q) <= eps * eps]
           for i, p in enumerate(pts)}
    core = {i for i, ns in nbr.items() if len(ns) >= min_pts}
    for i in range(len(pts)):
        if i in core:
            role = "core"
        elif any(j in core for j in nbr[i] if j != i):
            role = "border"
        else:
            role = "noise"
        assert got[i] == (len(nbr[i]), role), f"point {i}"


_rect = st.tuples(st.integers(0, 50), st.integers(0, 30),
                  st.integers(0, 50), st.integers(0, 30))


@given(pts=st.lists(_pt, min_size=1, max_size=20, unique=True),
       rects=st.lists(_rect, min_size=1, max_size=6),
       cell=st.sampled_from([2, 5, 16, 64]))
@settings(**SETTINGS)
def test_containment_matches_brute(spark, pts, rects, cell):
    from tada_spark.operators.spatial import grid_containment_join

    prow = [(i, x, y) for i, (x, y) in enumerate(pts)]
    rrow = [(i, x0, x0 + w, y0, y0 + h) for i, (x0, w, y0, h) in enumerate(rects)]
    p = spark.createDataFrame(prow, "pid long, x long, y long")
    r = spark.createDataFrame(rrow, "rid long, x0 long, x1 long, y0 long, y1 long")
    got = sorted((row.rid, row.pid) for row in grid_containment_join(
        p, r, point_id="pid", x_col="x", y_col="y",
        rect_id="rid", xmin="x0", xmax="x1", ymin="y0", ymax="y1",
        cell=cell).collect())
    want = sorted(
        (ri, pi)
        for ri, x0, x1, y0, y1 in rrow
        for pi, x, y in prow
        if x0 <= x <= x1 and y0 <= y <= y1
    )
    assert got == want


@given(
    versions=st.lists(st.integers(0, 9), min_size=1, max_size=5, unique=True),
    close_last=st.booleans(),
    facts=st.lists(st.integers(0, 12), min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_pit_join_matches_brute(spark, versions, close_last, facts):
    """Random version start positions (value = 10·start), optionally a
    delete closing the final interval; facts probe random positions
    and must see exactly the covering version."""
    from tada_spark.operators.cdc import pit_join

    starts = sorted(versions)
    hist = []
    for i, s in enumerate(starts):
        vt = starts[i + 1] if i + 1 < len(starts) else (starts[-1] + 2 if close_last else None)
        hist.append((1, float(s * 10), s, vt, vt is None))
    hdf = spark.createDataFrame(
        hist, "k long, price double, valid_from long, valid_to long, is_current boolean"
    )
    fdf = spark.createDataFrame([(1, t, i) for i, t in enumerate(facts)],
                                "k long, t long, fid long")
    got = {r.fid: (r.price, r.valid_from) for r in
           pit_join(fdf, hdf, "k", "t").collect()}
    for i, t in enumerate(facts):
        cover = [h for h in hist if h[2] <= t and (h[3] is None or h[3] > t)]
        assert len(cover) <= 1
        want = (cover[0][1], cover[0][2]) if cover else (None, None)
        assert got[i] == want, f"fact at t={t}"
    assert len(got) == len(facts)


@given(
    vecs=st.lists(
        st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
        min_size=2, max_size=15, unique=True,
    ),
    k=st.integers(2, 5),
)
@settings(**SETTINGS)
def test_kcenter_matches_brute_greedy(spark, vecs, k):
    from tada_spark.functions.similarity import kcenter_select

    k = min(k, len(vecs))
    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r.sel_order, r.vec_id, r.maxmin_d2_e6)
           for r in kcenter_select(df, k=k).collect()]

    # brute greedy with the operator's exact rules: e6-floored d2,
    # argmax with lowest-id tiebreak, seed = lowest id
    chosen = [0]
    expect = [(0, 0, None)]
    for step in range(1, k):
        best = None
        for i, v in enumerate(vecs):
            d2 = min(
                (v[0] - vecs[c][0]) ** 2 + (v[1] - vecs[c][1]) ** 2
                for c in chosen
            )
            d2e6 = math.floor(d2 * 1e6 + 0.5)
            cand = (d2e6, -i)
            if best is None or cand > best:
                best = cand
        expect.append((step, -best[1], best[0]))
        chosen.append(-best[1])
    assert got == expect
