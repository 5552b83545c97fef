"""Round-8 fixes: the three ADVICE items made load-bearing.

Each test here exercises the exact latent path the advisor flagged —
unseen CMS keys, fractional Benford inputs — so the fixes can't
regress silently."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_cms_estimate_unseen_key_is_zero(spark):
    """A probe key the build never saw must return est_n = 0 (absent
    sparse cells ≡ 0), not an inflated min over whatever populated
    cells it collides into — and it must never vanish from the
    output."""
    from tada_spark.functions.sketches import cms_build, cms_estimate

    build = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "k string")
    sketch = cms_build(build, F.col("k"), depth=4, width=256)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("never-seen-key",)], "k string"
    )
    out = {r.k: r.est_n for r in
           cms_estimate(probes, sketch, "k", depth=4, width=256).collect()}
    assert set(out) == {"a", "b", "never-seen-key"}
    # present keys can only overcount, never undercount
    assert out["a"] >= 7 and out["b"] >= 3
    # width 256 with 2 distinct build keys: at least one of the 4
    # cells of an unseen key is empty with near-certainty for this
    # fixed key; the estimate must floor to the true count 0
    assert out["never-seen-key"] == 0


def test_cms_estimate_tiny_width_collision_floor(spark):
    """Degenerate width=1: every key shares one cell per row, so every
    probe — seen or not — estimates the TOTAL count. Pins that the
    left-join fix did not change the populated-cell path."""
    from tada_spark.functions.sketches import cms_build, cms_estimate

    build = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "k string")
    sketch = cms_build(build, F.col("k"), depth=3, width=1)
    probes = spark.createDataFrame([("a",), ("zzz",)], "k string")
    out = {r.k: r.est_n for r in
           cms_estimate(probes, sketch, "k", depth=3, width=1).collect()}
    assert out == {"a": 7, "zzz": 7}


def test_benford_fractional_values_keep_n_consistent(spark):
    """Values in (0, 1) truncate to 0 and drop entirely: n equals
    Σ obs_d, so no phantom mass inflates every χ² deviation term."""
    from tada_spark.functions.stats import BENFORD_P, benford_chi2

    df = spark.createDataFrame(
        [(0.5,), (0.01,), (1.0,), (19.75,), (2.5,), (-3.0,), (None,)],
        "v double",
    )
    row = benford_chi2(df, F.col("v")).first()
    obs = [getattr(row, f"obs_{i}") for i in range(1, 10)]
    assert row.n == sum(obs) == 3          # 1.0, 19.75, 2.5 survive
    assert (row.obs_1, row.obs_2) == (2, 1)
    exp = 0
    got = {1: 2, 2: 1}
    for i, p in enumerate(BENFORD_P, start=1):
        e = 3.0 * p
        d = got.get(i, 0) - e
        exp += math.floor(d * d / e * 1e6 + 0.5)
    assert row.chi2_e6 == exp
