"""Round-10 operators: Naive Bayes classifier, leakage-safe splits,
mojibake audit, MMR diversity re-ranking.

Semantic tests on hand-built inputs (the oracle gate checks arithmetic
against DuckDB; these check the operators DO the right thing)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- NB --
def test_nb_learns_separable_vocab(spark):
    from tada_spark.functions.classify import naive_bayes_classify

    train = spark.createDataFrame(
        [
            (1, "apple banana cherry apple fruit", "fruit"),
            (2, "banana apple apple cherry sweet", "fruit"),
            (3, "cpu gpu ram disk kernel", "tech"),
            (4, "kernel cpu disk gpu cache", "tech"),
        ],
        "doc_id int, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "apple cherry banana"), (11, "gpu kernel cpu")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in naive_bayes_classify(train, test, n_buckets=64).collect()}
    assert out[10]["pred_label"] == "fruit"
    assert out[11]["pred_label"] == "tech"
    assert out[10]["margin_e6"] > 0 and out[11]["margin_e6"] > 0
    assert out[10]["n_toks"] == 3


def test_nb_blank_and_null_test_docs_drop(spark):
    from tada_spark.functions.classify import naive_bayes_classify

    train = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e f", "y")], "doc_id int, text string, lang string"
    )
    test = spark.createDataFrame(
        [(10, "a b"), (11, None), (12, "   ")], "doc_id int, text string"
    )
    rows = naive_bayes_classify(train, test, n_buckets=16).collect()
    assert [r["doc_id"] for r in rows] == [10]


def test_nb_null_label_train_rows_ignored(spark):
    from tada_spark.functions.classify import naive_bayes_scores

    train = spark.createDataFrame(
        [(1, "a b", "x"), (2, "c d", None)], "doc_id int, text string, lang string"
    )
    test = spark.createDataFrame([(10, "a c")], "doc_id int, text string")
    labels = {r["label"] for r in naive_bayes_scores(train, test, n_buckets=16).collect()}
    assert labels == {"x"}  # the NULL-label row trained nothing


def test_nb_prior_shifts_ties_toward_majority(spark):
    from tada_spark.functions.classify import naive_bayes_classify

    # identical token distributions; label 'big' has 3 docs, 'small' 1 —
    # an unseen-ish doc must break toward the majority prior
    train = spark.createDataFrame(
        [(1, "z z", "big"), (2, "z z", "big"), (3, "z z", "big"), (4, "z z", "small")],
        "doc_id int, text string, lang string",
    )
    test = spark.createDataFrame([(10, "z")], "doc_id int, text string")
    out = naive_bayes_classify(train, test, n_buckets=16).collect()[0]
    assert out["pred_label"] == "big"


# ------------------------------------------------------------- splits --
def test_leakage_safe_split_keeps_duplicates_together(spark):
    from tada_spark.queries import CATALOG

    df = CATALOG["leakage_safe_split_docs"][0](spark, "/root/testdata/sf0.001")
    # invariant: one split per fingerprint, by construction
    bad = df.groupBy("fp").agg(F.countDistinct("split").alias("n")).filter(F.col("n") > 1)
    assert bad.count() == 0


def test_split_leakage_report_flags_straddling_chunks(spark):
    from tada_spark.functions.dedup import paragraph_chunks
    from tada_spark.functions.sampling import assign_split

    # doc 3 and doc 11 hash to different splits under assign_split and
    # share an exact 20-word chunk; the report must surface it
    shared = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(3, shared), (11, shared), (5, "unique text only here")],
        "doc_id long, text string",
    )
    ch = assign_split(paragraph_chunks(docs), "doc_id")
    splits = {r["doc_id"]: r["split"] for r in ch.select("doc_id", "split").distinct().collect()}
    report = (
        ch.select(F.md5("chunk").alias("chunk_fp"), "doc_id", "split")
        .groupBy("chunk_fp")
        .agg(F.countDistinct("split").alias("n_splits"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_splits") >= 2)
    )
    if splits[3] != splits[11]:
        assert report.count() == 1
    else:  # hash collision put both in one split: nothing straddles
        assert report.count() == 0


def test_leakage_report_empty_on_content_keyed_split(spark):
    """The acting half fixes what the measuring half reports: re-run
    the chunk-leakage audit with the CONTENT-keyed split — exact-dup
    chunks from exact-dup docs can never straddle."""
    from tada_spark.functions.dedup import paragraph_chunks
    from tada_spark.functions.text import fingerprint, md5_hash32

    shared = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(3, shared), (11, shared)], "doc_id long, text string"
    )
    b = F.pmod(md5_hash32(fingerprint(F.col("text"))), F.lit(100))
    with_split = docs.withColumn(
        "split", F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    ch = paragraph_chunks(with_split.select("doc_id", "text")).join(
        with_split.select("doc_id", "split"), "doc_id"
    )
    report = (
        ch.groupBy(F.md5("chunk"))
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") >= 2)
    )
    assert report.count() == 0


# ----------------------------------------------------------- mojibake --
def test_mojibake_counts_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "cafÃ© menu", "a"),          # 'Ã©' — one moji_a
            (2, "said â€œhi", "a"),      # 'â€œ' — one moji_punct
            (3, "clean text", "a"),
            (4, "bad � byte �", "b"),          # two replacement chars
            (5, None, "b"),
        ],
        "doc_id long, text string, source string",
    )
    docs.createOrReplaceTempView("___moji_in")

    def occ(s):
        return F.coalesce(
            (F.length("text") - F.length(F.regexp_replace(F.col("text"), F.lit(s), F.lit(""))))
            / F.lit(len(s)),
            F.lit(0.0),
        ).cast("long")

    out = (
        docs.select("source", occ("Ã").alias("a"), occ("â€").alias("p"), occ("�").alias("r"))
        .groupBy("source")
        .agg(F.sum("a").alias("a"), F.sum("p").alias("p"), F.sum("r").alias("r"))
    )
    rows = {r["source"]: r for r in out.collect()}
    assert (rows["a"]["a"], rows["a"]["p"], rows["a"]["r"]) == (1, 1, 0)
    assert (rows["b"]["a"], rows["b"]["p"], rows["b"]["r"]) == (0, 0, 2)


# ---------------------------------------------------------------- MMR --
def _greedy_mmr_numpy(qv, cand_ids, cand_vecs, k):
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    rel = {i: int(np.floor(cos(qv, v) * 1e6 + 0.5)) for i, v in zip(cand_ids, cand_vecs)}
    sim = {
        (i, j): int(np.floor(cos(vi, vj) * 1e6 + 0.5))
        for i, vi in zip(cand_ids, cand_vecs)
        for j, vj in zip(cand_ids, cand_vecs)
        if i != j
    }
    selected = []
    for _ in range(k):
        best = None
        for i in cand_ids:
            if i in selected:
                continue
            pen = max((sim[(i, s)] for s in selected), default=0)
            score = 7 * rel[i] - 3 * pen if selected else 7 * rel[i]
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        selected.append(best[1])
    return selected


def test_mmr_matches_reference_greedy_and_diversifies(spark):
    from tada_spark.functions.similarity import mmr_rerank

    # 2-D geometry where diversity genuinely beats the twin at λ=0.7:
    # A at +10° (rel .985), its twin A' at +11° (sim(A',A)=cos1°≈1, so
    # penalty ≈ 3·1e6), B at −20° on the OPPOSITE side (rel .94 but
    # sim(B,A)=cos30°≈.866). Step 2: 7·.982−3·.9998=3.87 for the twin
    # vs 7·.940−3·.866=3.98 for B — MMR must pick B.
    def v(deg):
        th = np.deg2rad(deg)
        return [float(np.cos(th)), float(np.sin(th))]

    vecs = {0: v(0), 1: v(10), 2: v(11), 3: v(-20), 4: v(170)}
    emb = spark.createDataFrame(
        [(i, vec) for i, vec in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    out = (
        mmr_rerank(emb, emb.filter(F.col("vec_id") == 0), k=3, pool=4)
        .orderBy("step")
        .collect()
    )
    got = [r["sel_id"] for r in out]
    cand_ids = [i for i in vecs if i != 0]
    np_vecs = {i: np.array(vec, dtype=np.float32) for i, vec in vecs.items()}
    ref = _greedy_mmr_numpy(np_vecs[0], cand_ids, [np_vecs[i] for i in cand_ids], 3)
    assert got == ref
    # step 1 is pure relevance: A wins
    assert got[0] == 1
    # diversity: the redundant twin of A must NOT be second; B is
    assert got[1] == 3


def test_mmr_rejects_bad_k(spark):
    from tada_spark.functions.similarity import mmr_rerank

    emb = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="mmr_rerank"):
        mmr_rerank(emb, emb, k=5, pool=3)
    with pytest.raises(ValueError, match="mmr_rerank"):
        mmr_rerank(emb, emb, k=0, pool=3)
