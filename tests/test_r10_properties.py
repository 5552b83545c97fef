"""Property tests for the round-10 operators: the Spark implementations
vs independent pure-Python references on hypothesis-generated inputs.

The references re-implement the CONTRACT (Laplace-smoothed NB scoring
over md5-hashed buckets; greedy integer MMR), not the Spark code — a
shared bug would have to be invented twice."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _det_ln(x: float) -> float:
    """plans/semantics.det_ln replicated in pure Python."""
    r = max(math.floor(x * 1e6 + 0.5), 1)
    k = r.bit_length() - 1
    m = r / float(1 << k)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    s = 1.0 / 15.0
    for c in (13, 11, 9, 7, 5, 3):
        s = 1.0 / c + z2 * s
    lnm = (2.0 * z) * (1.0 + z2 * s)
    return k * 0.6931471805599453 + lnm - 13.815510557964274


def _nb_reference(train, test, n_buckets):
    """(doc_id, label) -> score_e6 for every test doc × train label."""
    from collections import Counter, defaultdict

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    def bucket(w):
        return _md5_32("nb#" + w) % n_buckets

    c_lb: dict = defaultdict(Counter)
    d_l: Counter = Counter()
    for _i, text, lab in train:
        if lab is None or text is None or not text.strip():
            continue
        d_l[lab] += 1
        for w in toks(text):
            c_lb[lab][bucket(w)] += 1
    n_l = {lab: sum(c.values()) for lab, c in c_lb.items()}
    D, L = sum(d_l.values()), len(d_l)
    out = {}
    for i, text in test:
        if text is None or not text.strip():
            continue
        bs = Counter(bucket(w) for w in toks(text))
        if not bs:
            continue
        for lab in d_l:
            prior = math.floor(_det_ln((d_l[lab] + 1) / (D + L)) * 1e6 + 0.5)
            s = prior
            for b, c in bs.items():
                lw = math.floor(
                    _det_ln((c_lb[lab].get(b, 0) + 1) / (n_l.get(lab, 0) + n_buckets)) * 1e6 + 0.5
                )
                s += c * lw
            out[(i, lab)] = s
    return out


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "zz", "q1", "longword"])
texts = st.lists(words, min_size=0, max_size=8).map(" ".join)
labels = st.sampled_from(["x", "y", "z"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    train=st.lists(st.tuples(texts, st.one_of(st.none(), labels)), min_size=1, max_size=10),
    test=st.lists(texts, min_size=1, max_size=6),
)
def test_nb_scores_match_python_reference(spark, train, test):
    from tada_spark.functions.classify import naive_bayes_scores

    train_rows = [(i, t, lab) for i, (t, lab) in enumerate(train)]
    test_rows = [(100 + i, t) for i, t in enumerate(test)]
    if not any(lab is not None and t.strip() for t, lab in train):
        return  # no trainable rows: operator output is empty by contract
    tr = spark.createDataFrame(train_rows, "doc_id int, text string, lang string")
    te = spark.createDataFrame(test_rows, "doc_id int, text string")
    got = {
        (r["doc_id"], r["label"]): r["score_e6"]
        for r in naive_bayes_scores(tr, te, n_buckets=32).collect()
    }
    ref = _nb_reference(train_rows, [(i, t) for i, t in test_rows], 32)
    assert got == ref


def _mmr_reference(qv, cands, k):
    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return None
        return float(np.dot(a, b) / (na * nb))

    rel, ids = {}, []
    for i, v in cands.items():
        c = cos(qv, v)
        if c is not None:
            rel[i] = int(np.floor(c * 1e6 + 0.5))
            ids.append(i)
    ids = sorted(ids, key=lambda i: (-rel[i], i))[: len(ids)]
    sim = {}
    for i in ids:
        for j in ids:
            if i != j:
                c = cos(cands[i], cands[j])
                sim[(i, j)] = int(np.floor(c * 1e6 + 0.5))
    selected = []
    for _ in range(min(k, len(ids))):
        best = None
        for i in ids:
            if i in selected:
                continue
            pen = max((sim[(i, s)] for s in selected), default=0)
            score = 7 * rel[i] - 3 * pen if selected else 7 * rel[i]
            key = (-score, i)
            if best is None or key < best:
                best, best_i = key, i
        selected.append(best_i)
    return selected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=3, max_size=3),
        min_size=3,
        max_size=7,
    ),
)
def test_mmr_matches_python_reference(spark, data):
    from tada_spark.functions.similarity import mmr_rerank

    vecs = {i + 1: np.array(v, dtype=np.float64) for i, v in enumerate(data)}
    qv = np.array([1.0, 1.0, 0.0])
    rows = [(0, [1.0, 1.0, 0.0])] + [(i, [float(x) for x in v]) for i, v in vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pool = len(vecs)
    k = min(3, pool)
    got = [
        r["sel_id"]
        for r in mmr_rerank(emb, emb.filter(F.col("vec_id") == 0), k=k, pool=pool)
        .orderBy("step")
        .collect()
    ]
    # float32 storage: the reference must see the same rounded vectors
    f32 = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in vecs.items()}
    ref = _mmr_reference(qv, f32, k)
    assert got == ref


def test_nb_scores_affine_in_token_multiset(spark):
    """NB scores decompose as prior + Σ per-token weights, so for docs
    built from the same vocabulary: s(AB) − s(A) − s(B) = −prior, and
    adding one more copy of a token shifts the score by exactly that
    token's weight — pinned without ever computing prior or weights
    directly."""
    from tada_spark.functions.classify import naive_bayes_scores

    tr = spark.createDataFrame(
        [(1, "alpha beta", "x"), (2, "zz q1 gamma", "y")],
        "doc_id int, text string, lang string",
    )
    te = spark.createDataFrame(
        [(10, "alpha"), (11, "zz"), (12, "alpha zz"), (13, "alpha alpha zz")],
        "doc_id int, text string",
    )
    s = {
        (r["doc_id"], r["label"]): r["score_e6"]
        for r in naive_bayes_scores(tr, te, n_buckets=32).collect()
    }
    for lab in ("x", "y"):
        # s12 = prior + w(alpha) + w(zz); s10 = prior + w(alpha);
        # s11 = prior + w(zz) ⇒ prior = s10 + s11 − s12
        prior = s[(10, lab)] + s[(11, lab)] - s[(12, lab)]
        # doc 13 = doc 12 + one more alpha ⇒ s13 − s12 = w(alpha) = s10 − prior
        assert s[(13, lab)] - s[(12, lab)] == s[(10, lab)] - prior
