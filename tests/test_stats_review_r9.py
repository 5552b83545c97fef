"""Regression pins for the round-9 stats/validate review findings.

Fifth targeted review pass. The headline: best_split_by_group's r8
integer score was NOT order-equivalent to Gini minimization (the
cross-multiplied numerator's implicit nL*nR denominator varies per
split), so a perfect separation could lose to an impure middle split —
and the brute-force property test replicated the same wrong formula,
which is why it never caught it. Plus NaN-to-0 degenerate statistics,
a NULL-predicate expectations bypass, duplicate fk labels, and
negative-relevance shift masking.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_best_split_perfect_separation_wins(spark):
    from tada_spark.functions.stats import best_split_by_group

    rows = [("g", 1, True)] + [("g", 2 + i, False) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, f long, y boolean")
    r = best_split_by_group(df, "g", F.col("f"), F.col("y")).collect()[0]
    # the r8 score picked split_at=5 (score 210 vs 90); impurity-0 must win
    assert r.split_at == 1 and r.n_left == 1 and r.n_right == 9
    assert r.score_e6 == 10_000_000  # 1/1 + 81/9 = 10 exactly


def test_expectations_null_predicate_counts_as_violation(spark):
    from tada_spark.operators.validate import expect_in_set, validate

    df = spark.createDataFrame([("zzz",), ("a",), (None,)], "status string")
    # None in the value set makes isin() return SQL NULL for 'zzz';
    # before, ~NULL was skipped by count(when(...)) and the rule
    # reported ok=True over a column of invalid values
    rep = {r.rule: (r.n_violations, r.ok) for r in validate(
        df, [expect_in_set("status", ["a", "b", None])]
    ).collect()}
    n_violations, ok = next(iter(rep.values()))
    assert n_violations == 1 and not ok


def test_fk_candidates_duplicate_labels_raise(spark):
    from tada_spark.operators.validate import fk_candidates

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="duplicate column label"):
        fk_candidates([(df, "k", "x"), (df, "k", "x")])


def test_ks_statistic_one_sided_input_is_null(spark):
    from tada_spark.functions.stats import ks_statistic

    df = spark.createDataFrame([(1.0, "a")] * 3, "v double, g string")
    out = ks_statistic(df, "v", "g", g1="a", g2="MISSPELLED").collect()[0]
    # before: 0/0 -> NaN -> floor cast 0, reading "identical"
    assert out.d_e6 is None


def test_benford_empty_input_is_null(spark):
    from tada_spark.functions.stats import benford_chi2

    df = spark.createDataFrame([(0,), (-5,)], "v long")  # nothing positive
    out = benford_chi2(df, F.col("v")).collect()[0]
    assert out.n == 0 and out.chi2_e6 is None


def test_ndcg_negative_relevance_fails_loudly(spark):
    from tada_spark.functions.stats import ndcg_at_10

    good = spark.createDataFrame([("q", 1, 2), ("q", 2, 0)], "g string, rk int, rel int")
    assert ndcg_at_10(good, "g", "rk", "rel").count() == 1
    bad = spark.createDataFrame([("q", 1, -1)], "g string, rk int, rel int")
    with pytest.raises(Exception, match="negative relevance"):
        ndcg_at_10(bad, "g", "rk", "rel").collect()
