"""Round-6 property suites: det_ln, weighted sampling, PageRank,
entropy/KL, OLS/correlation, and the bloom prefilter checked against
independent brute-force Python oracles on randomized inputs (the
test_r5_properties model). Each example builds ONE small DataFrame and
compares exact values — det_ln's bit-identity claim means == on longs,
never approx.
"""

from __future__ import annotations

import math

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
# det_ln ≡ py_det_ln bit-for-bit on randomized positive doubles
# ---------------------------------------------------------------------------

_lnx = st.lists(
    st.one_of(
        st.floats(min_value=1e-7, max_value=9e6, allow_nan=False, allow_infinity=False),
        st.integers(1, 10**6).map(lambda n: n / 7.0),
    ),
    min_size=1,
    max_size=40,
)


_DUCK_DET_LN = """
WITH v AS (SELECT idx, x FROM inp),
r0 AS (SELECT idx,
       GREATEST(CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT), CAST(1 AS BIGINT)) AS r FROM v),
k0 AS (SELECT idx, r, (LENGTH(BIN(r)) - 1) AS k FROM r0),
z0 AS (SELECT idx, k,
       (((CAST(r AS DOUBLE) / CAST((CAST(1 AS BIGINT) << k) AS DOUBLE)) - 1.0)
        / ((CAST(r AS DOUBLE) / CAST((CAST(1 AS BIGINT) << k) AS DOUBLE)) + 1.0)) AS z FROM k0)
SELECT idx,
       ((CAST(k AS DOUBLE) * 0.6931471805599453)
        + ((2.0 * z) * (1.0 + (z*z) * ((1.0/3.0) + (z*z) * ((1.0/5.0) + (z*z) * ((1.0/7.0)
           + (z*z) * ((1.0/9.0) + (z*z) * ((1.0/11.0) + (z*z) * ((1.0/13.0) + (z*z) * (1.0/15.0)))))))))
       ) - 13.815510557964274 AS y
FROM z0
"""


@given(vals=_lnx)
@settings(**SETTINGS)
def test_det_ln_bit_equals_python_and_duckdb(spark, vals):
    import duckdb

    from tada_spark.plans.semantics import det_ln

    df = spark.createDataFrame(list(enumerate(vals)), "idx long, x double")
    got = {r.idx: r.y for r in df.select("idx", det_ln(F.col("x")).alias("y")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE inp(idx BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO inp VALUES (?, ?)", list(enumerate(vals)))
    duck = {i: y for i, y in con.execute(_DUCK_DET_LN).fetchall()}
    for i, v in enumerate(vals):
        assert got[i] == py_det_ln(v) == duck[i], (v, got[i], py_det_ln(v), duck[i])


# ---------------------------------------------------------------------------
# weighted_sample ≡ python A-ES top-k on randomized weights
# ---------------------------------------------------------------------------

_ws = st.lists(st.integers(1, 10**6), min_size=1, max_size=30)


@given(weights=_ws)
@settings(**SETTINGS)
def test_weighted_sample_equals_python_topk(spark, weights):
    import hashlib

    from tada_spark.functions.sampling import weighted_sample

    rows = list(enumerate(weights))
    df = spark.createDataFrame(rows, "doc_id long, w long")
    k = max(1, len(rows) // 2)
    got = [
        (r.priority_e6, r.doc_id)
        for r in weighted_sample(df, F.col("w").cast("double"), k).collect()
    ]

    def pri(i, w):
        h = int(hashlib.md5(f"ws#{i}".encode()).hexdigest()[:8], 16)
        u = ((h % 1048576) + 1) / 1048577.0
        return math.floor(((0.0 - py_det_ln(u)) / float(w)) * 1e6 + 0.5)

    want = sorted((pri(i, w), i) for i, w in rows)[:k]
    assert got == want


# ---------------------------------------------------------------------------
# pagerank_quantized ≡ python replica on randomized graphs
# ---------------------------------------------------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@given(edges=_edges)
@settings(**SETTINGS)
def test_pagerank_equals_python_on_random_graphs(spark, edges):
    from tada_spark.functions.dedup import pagerank_quantized

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.node: (r.pagerank_e9, r.deg) for r in pagerank_quantized(df).collect()}

    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({a for a, _ in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in nodes}
    n = len(nodes)
    base = math.floor((10**9 * 15 // 100) / n)
    r = {v: math.floor(10**9 / n) for v in nodes}
    for _ in range(3):
        inc = {v: 0 for v in nodes}
        for a, b in sym:
            inc[b] += math.floor(r[a] / deg[a])
        r = {v: base + math.floor((85 * inc[v]) / 100) for v in nodes}
    assert out == {v: (r[v], deg[v]) for v in nodes}


# ---------------------------------------------------------------------------
# token_entropy / kl_divergence ≡ python on randomized corpora
# ---------------------------------------------------------------------------

_docs = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=6),
    ),
    min_size=1,
    max_size=10,
)


@given(docs=_docs)
@settings(**SETTINGS)
def test_entropy_and_kl_equal_python(spark, docs):
    from tada_spark.functions.text import kl_divergence, token_entropy

    rows = [(i, src, " ".join(toks)) for i, (src, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    counts: dict[str, dict[str, int]] = {}
    for _, src, toks in [(i, s, t) for i, (s, t) in enumerate(docs)]:
        for tok in toks:
            counts.setdefault(src, {})[tok] = counts.get(src, {}).get(tok, 0) + 1

    ent = {r.source: r for r in token_entropy(df, "source", "text").collect()}
    assert set(ent) == {s for s, c in counts.items() if c}
    for src, c in counts.items():
        if not c:
            continue
        t = sum(c.values())
        want = sum(
            math.floor((0.0 - (n / t) * py_det_ln(n / t)) * 1e6 + 0.5) for n in c.values()
        )
        assert ent[src].entropy_e6 == want
        assert ent[src].total_tokens == t and ent[src].n_terms == len(c)

    kl = {r.source: r for r in kl_divergence(df, "source", "text").collect()}
    corpus: dict[str, int] = {}
    for c in counts.values():
        for tok, n in c.items():
            corpus[tok] = corpus.get(tok, 0) + n
    tc = sum(corpus.values())
    for src, c in counts.items():
        if not c:
            continue
        t = sum(c.values())
        want = sum(
            math.floor(
                ((n / t) * (py_det_ln(n / t) - py_det_ln(corpus[tok] / tc))) * 1e6 + 0.5
            )
            for tok, n in c.items()
        )
        assert kl[src].kl_e6 == want


# ---------------------------------------------------------------------------
# ols / corr ≡ python closed forms on randomized integer data
# ---------------------------------------------------------------------------

_xy = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(-1000, 1000)), min_size=1, max_size=25
)


@given(pts=_xy)
@settings(**SETTINGS)
def test_ols_corr_equal_python_closed_forms(spark, pts):
    from tada_spark.functions.stats import corr_by_group, ols_by_group

    df = spark.createDataFrame([("g", x, y) for x, y in pts], "grp string, x long, y long")
    o = ols_by_group(df, "grp", F.col("x"), F.col("y")).collect()[0]
    c = corr_by_group(df, "grp", F.col("x"), F.col("y")).collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = float(n) * float(sxx) - float(sx) * float(sx)
    deny = float(n) * float(syy) - float(sy) * float(sy)
    if den == 0:
        assert o.slope_e6 is None and o.intercept_2dp is None
    else:
        assert o.slope_e6 == math.floor((num / den) * 1e6 + 0.5)
        assert o.intercept_2dp == math.floor(
            ((float(sy) - (num / den) * float(sx)) / float(n)) * 100.0 + 0.5
        ) / 100.0
    if den > 0 and deny > 0:
        assert c.corr_e6 == math.floor(
            (num / (math.sqrt(den) * math.sqrt(deny))) * 1e6 + 0.5
        )
    else:
        assert c.corr_e6 is None


# ---------------------------------------------------------------------------
# bloom prefilter: no false negatives, exact end result, on random sets
# ---------------------------------------------------------------------------

_sets = st.tuples(
    st.sets(st.integers(0, 300), max_size=40),
    st.sets(st.integers(0, 300), min_size=1, max_size=60),
)


@given(sets=_sets)
@settings(**SETTINGS)
def test_bloom_exactness_on_random_sets(spark, sets):
    from tada_spark.operators.bloomjoin import bloom_bitmap, bloom_prefilter

    dim_keys, fact_keys = sets
    dim = spark.createDataFrame([(k,) for k in dim_keys] or [(None,)], "k long").filter(
        F.col("k").isNotNull()
    )
    fact = spark.createDataFrame([(k,) for k in fact_keys], "k long")
    pre = bloom_prefilter(fact, "k", bloom_bitmap(dim, "k"))
    got = sorted(r.k for r in pre.join(dim, "k", "left_semi").collect())
    assert got == sorted(fact_keys & dim_keys)
    # no false negatives: the prefilter keeps every true match
    assert {r.k for r in pre.collect()} >= (fact_keys & dim_keys)
