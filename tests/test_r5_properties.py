"""Round-5 property suites: as-of join and the rolling windows checked
against independent brute-force Python oracles on randomized inputs
(the reference repo's test model, SURVEY §5 — same style as
test_r3_properties, applied to the window/join surface the floor-idiom
migration touched this round).

Each example builds ONE small DataFrame and compares every output row,
so a window-frame off-by-one (rowsBetween vs rangeBetween bounds,
inclusive vs strict as-of) cannot hide behind aggregate statistics.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tada_spark.frame import Frame

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# asof_join ≡ per-left-row argmax over right times <= t (or < t, strict)
# ---------------------------------------------------------------------------

_asof_inputs = st.tuples(
    # left: (sym, t) pairs; right: sym -> {t: bid} (unique right times per
    # sym so the expected value is unambiguous)
    st.lists(
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 40)),
        min_size=1, max_size=12,
    ),
    st.dictionaries(
        st.sampled_from(["A", "B"]),
        st.dictionaries(st.integers(0, 40), st.integers(1, 9), min_size=1, max_size=8),
        min_size=1, max_size=2,
    ),
    st.booleans(),
)


@given(args=_asof_inputs)
@settings(**SETTINGS)
def test_asof_join_equals_bruteforce(spark, args):
    lefts, rights, strict = args
    left_rows = [(s, t, i) for i, (s, t) in enumerate(lefts)]
    right_rows = [(s, t, float(b)) for s, ts in rights.items() for t, b in ts.items()]
    trades = Frame(spark.createDataFrame(left_rows, "sym string, t long, rid long"))
    quotes = Frame(spark.createDataFrame(right_rows, "sym string, t long, bid double"))
    out = trades.asof_join(quotes, on="t", by=["sym"], value_cols=["bid"], strict=strict)
    rows = out.df.collect()
    assert len(rows) == len(left_rows)  # never multiplies or drops rows
    got = {r.rid: r.bid for r in rows}
    for s, t, rid in left_rows:
        cand = [
            (rt, b) for rt, b in rights.get(s, {}).items()
            if (rt < t if strict else rt <= t)
        ]
        want = float(max(cand)[1]) if cand else None
        assert got[rid] == want, (s, t, strict, got[rid], want)


# ---------------------------------------------------------------------------
# rolling_n (forward & trailing) ≡ python slice over the ordered group
# ---------------------------------------------------------------------------

_roll_inputs = st.tuples(
    st.lists(
        st.tuples(st.sampled_from([10, 20]), st.integers(-5, 5)),
        min_size=1, max_size=14,
    ),
    st.integers(1, 4),
    st.booleans(),
)


@given(args=_roll_inputs)
@settings(**SETTINGS)
def test_rolling_n_equals_python_slices(spark, args):
    rows, n, forward = args
    data = [(uid, i, float(v)) for i, (uid, v) in enumerate(rows)]
    f = Frame(spark.createDataFrame(data, "uid long, seq long, v double"))
    out = (
        f.group_by("uid")
        .rolling_n(n, "v", "sum", order_by=["seq"], out="r", forward=forward)
        .df.collect()
    )
    by_uid: dict[int, list] = {}
    for uid, seq, v in data:
        by_uid.setdefault(uid, []).append((seq, v))
    want = {}
    for uid, items in by_uid.items():
        items.sort()
        vals = [v for _, v in items]
        for i, (seq, _) in enumerate(items):
            window = vals[i : i + n] if forward else vals[max(0, i - n + 1) : i + 1]
            want[(uid, seq)] = sum(window) if len(window) == n else None
    got = {(r.uid, r.seq): r.r for r in out}
    assert got == pytest.approx(want)


# ---------------------------------------------------------------------------
# rolling_duration ≡ python filter over [t, t+d), duplicate times included
# ---------------------------------------------------------------------------

_dur_inputs = st.tuples(
    st.lists(
        st.tuples(st.sampled_from([1, 2]), st.integers(0, 30), st.integers(-4, 4)),
        min_size=1, max_size=14,
    ),
    st.integers(1, 10),
)


@given(args=_dur_inputs)
@settings(**SETTINGS)
def test_rolling_duration_equals_python_filter(spark, args):
    rows, seconds = args
    data = [(uid, e, float(v), i) for i, (uid, e, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, epoch long, v double, rid long").withColumn(
        "ts", F.timestamp_seconds(F.col("epoch"))
    )
    out = (
        Frame(df).group_by("uid").rolling_duration(seconds, "ts", "v", "sum", out="r").df.collect()
    )
    got = {r.rid: r.r for r in out}
    for uid, e, v, rid in data:
        want = sum(v2 for u2, e2, v2, _ in data if u2 == uid and e <= e2 < e + seconds)
        assert got[rid] == pytest.approx(want), (uid, e, seconds)


# ---------------------------------------------------------------------------
# bm25_rank ≡ brute-force python replica over randomized corpora
# ---------------------------------------------------------------------------

_bm25_inputs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
    min_size=1, max_size=10,
)


@given(docs=_bm25_inputs)
@settings(**SETTINGS)
def test_bm25_rank_equals_bruteforce(spark, docs):
    import math

    from tada_spark.functions.text import bm25_rank
    from tada_spark.plans.semantics import py_det_ln

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.score_e6, r.n_terms_hit)
           for r in bm25_rank(df, ("a", "b"), top_k=100).collect()}

    toks = {i: t for i, t in enumerate(docs)}
    n_docs = len(docs)
    total = sum(len(t) for t in toks.values())
    want = {}
    if total:
        avgdl = total / n_docs
        for term in ("a", "b"):
            dft = sum(1 for t in toks.values() if term in t)
            for d, t in toks.items():
                tf = t.count(term)
                if not tf:
                    continue
                idf = py_det_ln(((n_docs - dft) + 0.5) / (dft + 0.5))
                tf_part = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(t) / avgdl)))
                s, n = want.get(d, (0, 0))
                want[d] = (s + math.floor(idf * tf_part * 1e6 + 0.5), n + 1)
    assert out == want


# ---------------------------------------------------------------------------
# snapshot_diff ≡ dict-based python diff on randomized snapshots
# ---------------------------------------------------------------------------

_snap_inputs = st.tuples(
    st.dictionaries(st.integers(0, 15), st.sampled_from(["x", "y", "z", None]),
                    min_size=0, max_size=12),
    st.dictionaries(st.integers(0, 15), st.sampled_from(["x", "y", "z", None]),
                    min_size=0, max_size=12),
)


@given(args=_snap_inputs)
@settings(**SETTINGS)
def test_snapshot_diff_equals_dict_diff(spark, args):
    from tada_spark.functions.dedup import snapshot_diff

    old_d, new_d = args
    schema = "doc_id long, text string"
    old = spark.createDataFrame(list(old_d.items()) or [(None, None)], schema).filter(
        F.col("doc_id").isNotNull()
    )
    new = spark.createDataFrame(list(new_d.items()) or [(None, None)], schema).filter(
        F.col("doc_id").isNotNull()
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in old_d:
            want[k] = "added"
        elif k not in new_d:
            want[k] = "removed"
        elif old_d[k] != new_d[k]:  # null-safe: None == None is unchanged
            want[k] = "changed"
    assert got == want


# ---------------------------------------------------------------------------
# embedding_outliers ≡ numpy replica on the integer grid
# ---------------------------------------------------------------------------

_emb_inputs = st.lists(
    st.tuples(
        st.integers(0, 1),  # label
        st.lists(st.floats(-2, 2, allow_nan=False, width=32), min_size=4, max_size=4),
    ),
    min_size=2, max_size=10,
)


@given(rows=_emb_inputs)
@settings(**SETTINGS)
def test_embedding_outliers_equals_numpy_grid(spark, rows):
    import math

    from tada_spark.functions.similarity import embedding_outliers

    data = [(i, lab, [float(x) for x in v]) for i, (lab, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "vec_id long, label int, embedding array<float>")
    got = {(r.label, r.rank): (r.vec_id, r.dist2)
           for r in embedding_outliers(df, top_k=2).collect()}

    # python replica: quantize float32 values through the same double path
    import numpy as np

    by_label = {}
    for i, lab, v in data:
        q = [math.floor(float(np.float32(x)) * 1e6 + 0.5) for x in v]
        by_label.setdefault(lab, []).append((i, q))
    want = {}
    for lab, vecs in by_label.items():
        dims = list(zip(*[q for _, q in vecs]))
        cent = [math.floor(sum(d) / len(d) + 0.5) for d in dims]
        scored = sorted(
            ((sum((a - c) * (a - c) for a, c in zip(q, cent)), i) for i, q in vecs),
            key=lambda t: (-t[0], t[1]),
        )
        for rk, (d2, i) in enumerate(scored[:2], 1):
            want[(lab, rk)] = (i, d2)
    assert got == want


# ---------------------------------------------------------------------------
# cdc.apply_changes ≡ python dict replay; scd2_history ≡ interval derivation
# ---------------------------------------------------------------------------

_cdc_inputs = st.tuples(
    # base: key -> value
    st.dictionaries(st.integers(0, 8), st.integers(0, 5), min_size=0, max_size=6),
    # changes: list of (key, seq, op, value); seqs deduplicated per key
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(1, 6),
                  st.sampled_from(["I", "U", "D"]), st.integers(10, 19)),
        min_size=0, max_size=10,
    ),
)


def _dedupe_seqs(changes):
    """One op per (key, seq): a well-formed CDC log never has two —
    keep the first generated, matching no particular engine rule."""
    seen, out = set(), []
    for k, s, op, v in changes:
        if (k, s) not in seen:
            seen.add((k, s))
            out.append((k, s, op, v))
    return out


@given(args=_cdc_inputs)
@settings(**SETTINGS)
def test_apply_changes_equals_dict_replay(spark, args):
    from tada_spark.operators.cdc import apply_changes

    base_d, raw_changes = args
    changes = _dedupe_seqs(raw_changes)
    base = spark.createDataFrame(
        list(base_d.items()) or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull())
    ch = spark.createDataFrame(
        changes or [(None, None, None, None)], "k long, seq int, op string, v long"
    ).filter(F.col("k").isNotNull()).select("k", "v", "seq", "op")
    got = {r.k: r.v for r in apply_changes(base, ch, "k").collect()}

    # python replay: latest (seq desc) change per key wins
    want = dict(base_d)
    latest = {}
    for k, s, op, v in changes:
        if k not in latest or s > latest[k][0]:
            latest[k] = (s, op, v)
    for k, (_s, op, v) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@given(args=_cdc_inputs)
@settings(**SETTINGS)
def test_scd2_history_equals_interval_derivation(spark, args):
    from tada_spark.operators.cdc import scd2_history

    _base, raw_changes = args
    changes = _dedupe_seqs(raw_changes)
    ch = spark.createDataFrame(
        changes or [(None, None, None, None)], "k long, seq int, op string, v long"
    ).filter(F.col("k").isNotNull()).select("k", "v", "seq", "op")
    got = {(r.k, r.valid_from): (r.v, r.valid_to, r.is_current)
           for r in scd2_history(ch, "k").collect()}

    by_key = {}
    for k, s, op, v in changes:
        by_key.setdefault(k, []).append((s, op, v))
    want = {}
    for k, items in by_key.items():
        items.sort()
        for i, (s, op, v) in enumerate(items):
            nxt = items[i + 1][0] if i + 1 < len(items) else None
            if op != "D":
                want[(k, s)] = (v, nxt, nxt is None)
    assert got == want
