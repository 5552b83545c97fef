"""Tests for JSON codec, matrix IO, and introspection surface."""

from __future__ import annotations

from tada_spark.frame import Frame
from tada_spark.sources.codec import frame_from_json, frame_to_json, read_matrix


def test_json_codec_roundtrip_with_nulls(spark):
    f = Frame(
        spark.createDataFrame([("a", 1.0), ("b", None)], "k string, v double"),
        labels=["k"],
        name="t",
    )
    payload = frame_to_json(f)
    back = frame_from_json(spark, payload)
    assert back.name == "t" and back.labels == ["k"]
    rows = {r.k: r.v for r in back.df.collect()}
    assert rows == {"a": 1.0, "b": None}


def test_read_matrix(spark):
    f = read_matrix(spark, [[1, 2], [3, 4]], ["x", "y"])
    assert dict(f.df.dtypes) == {"x": "double", "y": "double"}
    assert f.df.count() == 2


def test_at_and_set_nulls(spark):
    f = Frame(spark.createDataFrame([(0, "a"), (1, "b")], "idx long, s string")).ordered("idx")
    assert f.at(1, "s") == "b"
    out = f.set_nulls("s", [0])
    assert {r.idx: r.s for r in out.df.collect()} == {0: None, 1: "b"}


def test_deduplicate_names(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int").toDF("x", "x")
    f = Frame(df).deduplicate_names()
    assert f.columns == ["x", "x_1"]


def test_render_ascii(spark):
    f = Frame(spark.createDataFrame([("a", 1.0), ("a", None)], "k string, v double"))
    s = f.render(merge_repeated=True)
    assert "| k" in s and "(null)" in s
    # merged repeated group value renders blank the second time
    assert s.count(" a ") == 1


def test_introspection_tail(spark):
    from tada_spark.frame import Frame
    from pyspark.sql import functions as F

    f = Frame(
        spark.createDataFrame(
            [(0, 1.5, "x"), (1, None, "y")], "idx long, v double, `lvl|sub` string"
        ),
        labels=["idx"],
    )
    assert f.index_of("v") == 0 and f.index_of("idx", in_labels=True) == 0
    assert f.index_of("nope") == -1
    assert f.name_of_col(1) == "lvl|sub" and f.name_of_label(0) == "idx"
    assert f.list_col_names_at_level(0) == ["v", "lvl"]
    assert f.list_col_names_at_level(1) == ["", "sub"]
    assert f.has_type("double") == ["v"] and f.has_type("string") == ["lvl|sub"]
    assert f.get_values("v", order_by=["idx"]) == [1.5, None]
    assert f.get_nulls("v", order_by=["idx"]) == [False, True]


def test_cache_roundtrip(spark):
    from tada_spark.frame import Frame

    f = Frame(spark.createDataFrame([(1, 2.0)], "a long, b double")).cache()
    assert f.df.count() == 1
    assert f.df.is_cached
    f.unpersist()
    assert not f.df.is_cached


def test_load_scan_cache_reuses_plan_per_session(spark):
    """queries.load keeps one immutable scan DataFrame per (session,
    path) — repeated loads share the plan (no repeated driver-side file
    analysis) but wrap it in fresh Frame objects."""
    from tada_spark import queries as Q

    a = Q.load(spark, "/root/testdata/sf0.001", "region")
    b = Q.load(spark, "/root/testdata/sf0.001", "region")
    assert a.df is b.df          # shared logical plan
    assert a is not b            # independent Frame wrappers
    assert a.df.count() == b.df.count() == 5


class _FakeCtx:
    """Stand-in SparkContext with a controllable liveness answer."""

    def __init__(self, stopped: bool):
        self._jsc = None if stopped else self

    def sc(self):  # py4j shape: sc._jsc.sc().isStopped()
        return self

    def isStopped(self):
        return False


def test_load_scan_cache_evicts_dead_sessions(spark):
    """On a cache miss, plans keyed to STOPPED applicationIds are
    dropped so cycling SparkSessions can't accumulate py4j handles."""
    from tada_spark import queries as Q

    Q._SCAN_CACHE["app-that-stopped"] = (_FakeCtx(stopped=True), {"/nowhere.parquet": "x"})
    app = spark.sparkContext.applicationId
    if app in Q._SCAN_CACHE:  # force a miss
        Q._SCAN_CACHE[app][1].pop("/root/testdata/sf0.001/nation.parquet", None)
    Q.load(spark, "/root/testdata/sf0.001", "nation")
    assert "app-that-stopped" not in Q._SCAN_CACHE
    assert "/root/testdata/sf0.001/nation.parquet" in Q._SCAN_CACHE[app][1]


def test_load_scan_cache_keeps_live_sibling_sessions(spark):
    """Two LIVE interleaved sessions must not evict each other's plans
    on every call (r4 verdict nit): a miss evicts only stopped apps."""
    from tada_spark import queries as Q

    sibling = "app-still-live"
    Q._SCAN_CACHE[sibling] = (_FakeCtx(stopped=False), {"/sibling.parquet": "plan"})
    try:
        app = spark.sparkContext.applicationId
        if app in Q._SCAN_CACHE:  # force a miss so the eviction path runs
            Q._SCAN_CACHE[app][1].pop("/root/testdata/sf0.001/region.parquet", None)
        a = Q.load(spark, "/root/testdata/sf0.001", "region")
        assert sibling in Q._SCAN_CACHE  # live sibling survived the miss
        assert Q._SCAN_CACHE[sibling][1] == {"/sibling.parquet": "plan"}
        # and the current session re-uses its plan (no re-read) afterwards
        b = Q.load(spark, "/root/testdata/sf0.001", "region")
        assert a.df is b.df
    finally:
        Q._SCAN_CACHE.pop(sibling, None)


def test_round_lint_contract():
    """Pin tools/check_oracle.round_lint: two-arg ROUND in any spelling
    is flagged; the single-arg exact-cents idiom and the floor idiom
    pass. (The lint runs up-front over every oracle at gate start.)"""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rl = mod.round_lint
    assert rl("SELECT ROUND(SUM(x), 2) AS t") == ["ROUND(SUM(x), 2)"]
    assert rl("select round(sum(x), 2)") == ["round(sum(x), 2)"]     # case
    assert rl("ROUND (SUM(x), 2)") == ["ROUND (SUM(x), 2)"]          # space
    assert rl("ROUND(ROUND(x, 6), 4)") == ["ROUND(ROUND(x, 6), 4)"]  # nested: outer flagged
    assert rl("SUM(ROUND(x * 100)::BIGINT)") == []                   # cents idiom OK
    assert rl("FLOOR((SUM(x)) * 100 + 0.5) / 100") == []             # floor idiom OK
    assert rl("AROUND(x, 2)") == []                                  # word boundary
    # and the live catalog is clean
    import __spark_entry__ as entrymod

    assert {n: h for n, sql in entrymod.oracle_sql().items() if (h := rl(sql))} == {}

def test_transcendental_lint_contract():
    """Pin tools/check_oracle.transcendental_lint: native LN/LOG/EXP/
    POW(ER) in oracle SQL is flagged (library libm vs Java last-ulp
    divergence — det_ln exists instead); the live catalog is clean
    outside the documented allowlist."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod2",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tl = mod.transcendental_lint
    assert tl("SELECT LN(x)") == ["LN("]
    assert tl("select pow(x, 2)") == ["pow("]
    assert tl("POWER (x, 2)") == ["POWER ("]
    assert tl("EXPLODE(x)") == []        # word boundary
    assert tl("BLN(x)") == []
    assert tl("FLOOR(x * 1e6 + 0.5)") == []
    import __spark_entry__ as entrymod

    dirty = {
        n: h for n, sql in entrymod.oracle_sql().items()
        if n not in mod.TRANSCENDENTAL_ALLOWED and (h := tl(sql))
    }
    assert dirty == {}
