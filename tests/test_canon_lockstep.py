"""Property suite: canon_str (Spark) / py_canon (driver) lockstep.

py_canon is the driver-side twin of canon_str — filter_by_value routes
user literals through it while the column side renders via canon_str
(frame.py:336-380), so any rendering divergence is a silent wrong-result
bug. This suite (VERDICT r3 ask #8) hammers the pair with randomized
float / decimal / NTZ / LTZ / date values, batched many-per-Spark-job.

It already earned its keep: writing it surfaced (a) an ANSI-mode crash —
canon_str's integral-rule ``cast("long")`` THREW on |v| >= 2^63 under
Spark 4's default ANSI mode (now try_cast), and (b) py_canon rendering
floats Python-style ("0.0005") where Spark's string cast is Java-style
("5.0E-4") outside [1e-3, 1e7) — both fixed in plans/semantics.py.

Known exclusions, documented at _java_double_str: subnormal doubles
(|v| < 2.3e-308, Java 17's legacy digit generator is not shortest) and
NaN (normalized to NULL at ingest by the null shim, never reaches canon).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tada_spark.frame import Frame
from tada_spark.plans.semantics import canon_str, py_canon

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# normal-range doubles only: subnormals documented-divergent (Java 17
# legacy Double.toString is not shortest below ~2.3e-308)
_doubles = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, allow_subnormal=False),
    st.integers(-(10**18), 10**18).map(float),
    st.floats(-1e-3, 1e-3, allow_nan=False, allow_subnormal=False),
    st.floats(1e6, 1e20, allow_nan=False, allow_infinity=False),
)

# the r3 probe's divergence corpus — every one of these disagreed (or
# crashed) before the r4 fixes; keep them as pinned examples
_EDGE_DOUBLES = [
    0.0005, -0.0005, 2.5e-4, 1e-7, 12345678.5, 1234567.5, 9999999.5,
    1e7, 1e16, 1e19, 1000000000000000.5, 1.7976931348623157e308,
    0.30000000000000004, -0.0, 0.001, 0.0011, float(2**63), float(2**63 - 512),
]


@given(vals=st.lists(_doubles, min_size=1, max_size=64))
@example(vals=_EDGE_DOUBLES)
@settings(**SETTINGS)
def test_canon_double_lockstep(spark, vals):
    """Doubles: value-exact lockstep. Byte-equality can't hold globally —
    Java 17's legacy Double.toString occasionally emits non-shortest
    digits (2^-24 -> '5.9604644775390625E-8' vs repr's 16) — so the
    invariant is: equal strings, OR both strings parse back to exactly
    the original double. This still catches every value-level bug this
    suite found pre-fix: the ANSI long-cast crash, and try_cast's
    MAX_LONG saturation rendering 2^63 as ...807 (parse-back != v)."""
    schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    got = {
        r["idx"]: r["c"]
        for r in df.select(
            "idx", canon_str(F.col("v"), T.DoubleType()).alias("c")
        ).collect()
    }
    for i, v in enumerate(vals):
        p = py_canon(v)
        if got[i] == p:
            continue
        assert float(got[i]) == v and float(p) == v, (repr(v), got[i], p)


@given(vals=st.lists(_doubles, min_size=1, max_size=16, unique=True))
@example(vals=_EDGE_DOUBLES)
@settings(**SETTINGS)
def test_filter_by_value_double_roundtrip(spark, vals):
    """End-to-end: a double stored in a column is FOUND by
    filter_by_value with that same double as the literal — the actual
    load-bearing property behind the canon lockstep (literal routed
    JVM-side through canon_str(F.lit(v)))."""
    rows = [(i, v) for i, v in enumerate(vals)]
    f = Frame(
        spark.createDataFrame(
            rows,
            T.StructType(
                [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
            ),
        )
    )
    probe = vals[0]
    want = sorted(i for i, v in rows if v == probe)  # -0.0 == 0.0 duplicates
    got = sorted(r.id for r in f.filter_by_value(v=probe).df.collect())
    assert got == want, (repr(probe), got, want)


_decimals = st.decimals(
    min_value=Decimal("-1e20"),
    max_value=Decimal("1e20"),
    allow_nan=False,
    allow_infinity=False,
    places=6,
)


@given(vals=st.lists(_decimals, min_size=1, max_size=64))
@example(vals=[Decimal("1.500000"), Decimal("2.000000"), Decimal("0.250000"),
               Decimal("10000000000000000001.000000"),  # integral > 2^63: long-cast null path
               # just below MIN_LONG: double-rounds to exactly -2^63 so the
               # range guard alone passes while try_cast nulls — pre-fix this
               # rendered the NULL sentinel for a real value
               Decimal("-9223372036854775809.000000"),
               Decimal("-9223372036854776833.000000"),
               Decimal("-0.000001"), Decimal("123456789012345678.900000")])
@settings(**SETTINGS)
def test_canon_decimal_lockstep(spark, vals):
    """DecimalType(38,6): scale-preserving string cast + trailing-zero
    strip must agree with py_canon's format(v, 'f') rendering, including
    integral values too large for the long-cast integral rule (try_cast
    NULL -> plain-digits fallback, not an ANSI throw)."""
    schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("v", T.DecimalType(38, 6))]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    got = {
        r["idx"]: r["c"]
        for r in df.select(
            "idx", canon_str(F.col("v"), T.DecimalType(38, 6)).alias("c")
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == py_canon(v), (repr(v), got[i], py_canon(v))


_datetimes = st.datetimes(
    min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2262, 1, 1)
)


@given(vals=st.lists(_datetimes, min_size=1, max_size=64))
@settings(**SETTINGS)
def test_canon_timestamp_families_lockstep(spark, vals):
    """NTZ and LTZ columns holding the same wall clock render identically
    to each other AND to py_canon, including sub-second truncation (both
    sides floor to whole seconds; session zone pinned UTC)."""
    schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("v", T.TimestampNTZType())]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema).withColumn(
        "v_ltz", F.col("v").cast("timestamp")
    )
    got = {
        r["idx"]: (r["c_ntz"], r["c_ltz"])
        for r in df.select(
            "idx",
            canon_str(F.col("v"), T.TimestampNTZType()).alias("c_ntz"),
            canon_str(F.col("v_ltz"), T.TimestampType()).alias("c_ltz"),
        ).collect()
    }
    for i, v in enumerate(vals):
        want = py_canon(v)
        assert got[i] == (want, want), (v, got[i], want)


@given(
    vals=st.lists(
        st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)),
        min_size=1,
        max_size=64,
    )
)
@settings(**SETTINGS)
def test_canon_date_lockstep(spark, vals):
    schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("v", T.DateType())]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    got = {
        r["idx"]: r["c"]
        for r in df.select("idx", canon_str(F.col("v"), T.DateType()).alias("c")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == py_canon(v), (v, got[i], py_canon(v))


def test_filter_by_value_extreme_float_literals(spark):
    """End-to-end regression for the divergence this suite caught:
    filter_by_value with a literal outside Java's plain-decimal range
    must still match the stored value (pre-fix, py_canon rendered
    '0.0005' vs the column's '5.0E-4' -> silent empty result)."""
    rows = [(1, 0.0005), (2, 12345678.5), (3, 1e19), (4, 7.0), (5, 0.25)]
    f = Frame(spark.createDataFrame(rows, "id long, v double"))
    for rid, v in rows:
        got = [r.id for r in f.filter_by_value(v=v).df.collect()]
        assert got == [rid], (v, got)


def test_canon_decimal_scale_family_lockstep(spark):
    """DECIMAL(38,x) beyond the property suite's fixed scale 6 (r4
    verdict stretch #9): scales 0 / 2 / 18 each exercise the integral
    rule, the trailing-zero strip, and the beyond-long fallback. Scale
    18 additionally pins the double-precision-loss fix: its beyond-long
    boundary values were exactly the class the r4 lockstep sweep caught
    (decimal-integral canon routed through a lossy double pre-fix)."""
    from decimal import Decimal

    cases = {
        0: ["0", "-1", "42", "9223372036854775807", "-9223372036854775808",
            "9223372036854775808", "-9223372036854775809",
            "99999999999999999999999999999999999999"],
        2: ["0.00", "1.50", "-0.25", "123456789012345678.90",
            "92233720368547758.08", "-92233720368547758.09",
            "999999999999999999999999999999999999.99"],
        18: ["0.000000000000000000", "1.000000000000000001",
             "-2.500000000000000000", "9.223372036854775807",
             "-9.223372036854775809", "12345678901234567890.000000000000000000"],
    }
    for scale, strs in cases.items():
        vals = [Decimal(s) for s in strs]
        schema = T.StructType(
            [T.StructField("idx", T.LongType()), T.StructField("v", T.DecimalType(38, scale))]
        )
        df = spark.createDataFrame(list(enumerate(vals)), schema)
        got = {
            r["idx"]: r["c"]
            for r in df.select(
                "idx", canon_str(F.col("v"), T.DecimalType(38, scale)).alias("c")
            ).collect()
        }
        for i, v in enumerate(vals):
            assert got[i] == py_canon(v), (scale, repr(v), got[i], py_canon(v))


def test_canon_subnormal_divergence_boundary(spark):
    """Pin the documented Java-17 subnormal rendering divergence
    (semantics.py _java_double_str docstring) with tests instead of
    prose (r4 verdict stretch #9): AT and ABOVE the smallest normal
    double the two sides agree byte-for-byte; BELOW it Java's legacy
    digit generator may emit non-shortest digits, so the contract
    weakens to parse-back equality (both strings are still the same
    VALUE — the driver hash would differ, which is why subnormal
    columns are documented out of oracle outputs)."""
    import sys

    tiny = sys.float_info.min  # 2.2250738585072014e-308, smallest normal
    normals = [tiny, 2 * tiny, -tiny, 1e-300, 4.9e-307]
    subnormals = [5e-324, -5e-324, 1e-320, tiny / 2]

    def spark_canon(vals):
        schema = T.StructType(
            [T.StructField("idx", T.LongType()), T.StructField("v", T.DoubleType())]
        )
        df = spark.createDataFrame(list(enumerate(vals)), schema)
        return {
            r["idx"]: r["c"]
            for r in df.select(
                "idx", canon_str(F.col("v"), T.DoubleType()).alias("c")
            ).collect()
        }

    got_n = spark_canon(normals)
    for i, v in enumerate(normals):
        assert got_n[i] == py_canon(v), (repr(v), got_n[i], py_canon(v))

    got_s = spark_canon(subnormals)
    for i, v in enumerate(subnormals):
        s = got_s[i]
        assert float(s) == v, (repr(v), s)  # value-level lockstep always
    # the boundary is real: the canonical subnormal renders differently
    # byte-wise on Java 17 (legacy '4.9E-324') vs py_canon (shortest)
    assert float(got_s[0]) == float(py_canon(5e-324)) == 5e-324


def test_canon_time_of_day_lockstep(spark):
    """TIME dtype (reference civil.Time): canon renders 'HH:MM:SS' on
    both sides, and a datetime.time literal round-trips filter_by_value
    through the py_canon fallback path."""
    f = Frame(
        spark.createDataFrame([("09:30:00",), ("15:04:05",), ("00:00:00",)], "t string")
    ).cast(t="time")
    ttype = f.df.schema["t"].dataType
    got = sorted(
        r.c for r in f.df.select(canon_str(F.col("t"), ttype).alias("c")).collect()
    )
    want = sorted(py_canon(v) for v in (dt.time(9, 30), dt.time(15, 4, 5), dt.time(0)))
    assert got == want, (got, want)
    assert [r.t for r in f.filter_by_value(t=dt.time(9, 30)).df.collect()] == [dt.time(9, 30)]


def test_det_ln_three_engine_lockstep(spark):
    """det_ln bit-identity across Spark, DuckDB and the Python replica
    over 6 decades of input, plus accuracy vs math.log within the
    documented envelope (~1e-6 relative-quantize error for x >= 0.5)."""
    import math

    import duckdb

    from tada_spark.plans.semantics import det_ln, py_det_ln

    vals = [
        1e-6, 2e-6, 1e-3, 0.1, 0.5, 0.999999, 1.0, 1.000001, 1.5,
        2.0, math.e, 3.0, 10.0, 99.5, 1234.567, 1e5, 9.9e5, 7.7e6,
    ] + [0.5 + i * 0.37 for i in range(40)]
    df = spark.createDataFrame(list(enumerate(vals)), "idx long, x double")
    got_spark = {
        r.idx: r.y for r in df.select("idx", det_ln(F.col("x")).alias("y")).collect()
    }
    duck_sql = """
    WITH v AS (SELECT idx, x FROM inp),
    r0 AS (SELECT idx, x,
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
    con = duckdb.connect()
    con.execute("CREATE TABLE inp(idx BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO inp VALUES (?, ?)", list(enumerate(vals)))
    got_duck = {idx: y for idx, y in con.execute(duck_sql).fetchall()}
    for i, v in enumerate(vals):
        py = py_det_ln(v)
        # BIT identity, not approx: all three are the same IEEE tree
        assert got_spark[i] == py == got_duck[i], (v, got_spark[i], py, got_duck[i])
        if v >= 0.5:
            assert abs(py - math.log(v)) < 2e-6, (v, py, math.log(v))


# ---------------------------------------------------------------------------
# r4 verdict #9 carryover, closed in r8: DECIMAL(38,x) across scales and
# subnormal doubles were prose-documented exclusions — now test-pinned.
# ---------------------------------------------------------------------------

_SUBNORMALS = [
    5e-324,                    # smallest positive subnormal
    -5e-324,
    1e-310, -3.7e-320,
    2.225073858507201e-308,    # largest subnormal
    -2.225073858507201e-308,
    2.2250738585072014e-308,   # smallest NORMAL (the boundary itself)
]


@given(vals=st.lists(
    st.floats(min_value=-2.3e-308, max_value=2.3e-308,
              allow_nan=False, allow_subnormal=True),
    min_size=1, max_size=64))
@example(vals=_SUBNORMALS)
@settings(**SETTINGS)
def test_canon_subnormal_double_lockstep(spark, vals):
    """Subnormals were a documented byte-level exclusion (Java 17's
    legacy digit generator is not shortest: '4.9E-324' vs repr
    '5e-324'). The load-bearing invariant is VALUE exactness, and that
    holds even there: canon strings either match byte-for-byte or both
    parse back to exactly the original double — pinned here so the
    exclusion can never silently widen into a wrong-value bug."""
    schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    got = {
        r["idx"]: r["c"]
        for r in df.select(
            "idx", canon_str(F.col("v"), T.DoubleType()).alias("c")
        ).collect()
    }
    for i, v in enumerate(vals):
        p = py_canon(v)
        if got[i] == p:
            continue
        assert float(got[i]) == v and float(p) == v, (repr(v), got[i], p)


def _dec_edges(scale: int) -> list[Decimal]:
    """Edge corpus for DecimalType(38, scale): integral-rule boundaries
    (2^63 and the MIN_LONG double-rounding trap), full-precision
    extremes, trailing-zero strips, and sub-1 fractions."""
    import decimal as _d

    _d.setcontext(_d.Context(prec=60))  # default 28 can't hold 38 digits
    q = Decimal(1).scaleb(-scale) if scale else Decimal(1)
    ipart = 38 - scale  # available integral digits
    vals = [Decimal(0), Decimal(7), Decimal(-3)]
    if ipart >= 20:
        vals += [
            Decimal(2**63),                    # == MAX_LONG+1: fallback path
            Decimal(2**63 - 1),                # MAX_LONG: integral rule
            Decimal(-(2**63)),                 # MIN_LONG: integral rule
            Decimal(-(2**63) - 1),             # double-rounds to -2^63
            Decimal(-(2**63) - 1024),
            Decimal(10**19 + 1),               # > 2^63, not a power of 2
        ]
    vals.append(Decimal(10**ipart - 1))        # max integral magnitude
    vals.append(-Decimal(10**ipart - 1))
    if scale:
        vals += [
            Decimal("1.5").quantize(q) if scale >= 1 else None,
            Decimal(1).scaleb(-scale),          # smallest positive step
            -Decimal(1).scaleb(-scale),
            Decimal("2.50").quantize(q),        # trailing-zero strip
            (Decimal(10**ipart - 1) + Decimal(1) - Decimal(1).scaleb(-scale)),
        ]
    return [v.quantize(q) for v in vals if v is not None]


def test_canon_decimal_38x_lockstep_across_scales(spark):
    """DecimalType(38, x) for x in {0, 2, 18, 37}: the suite previously
    pinned only (38,6). Same invariant — canon_str and py_canon agree
    byte-for-byte (decimals render exactly; no parse-back escape
    needed), including integral values beyond the long range where the
    try_cast fallback must emit plain digits, at every scale."""
    for scale in (0, 2, 18, 37):
        vals = _dec_edges(scale)
        schema = T.StructType(
            [T.StructField("idx", T.LongType()),
             T.StructField("v", T.DecimalType(38, scale))]
        )
        df = spark.createDataFrame(list(enumerate(vals)), schema)
        got = {
            r["idx"]: r["c"]
            for r in df.select(
                "idx", canon_str(F.col("v"), T.DecimalType(38, scale)).alias("c")
            ).collect()
        }
        for i, v in enumerate(vals):
            assert got[i] == py_canon(v), (scale, str(v), got[i], py_canon(v))


@given(vals=st.lists(
    st.decimals(min_value=Decimal("-1e19"), max_value=Decimal("1e19"),
                allow_nan=False, allow_infinity=False, places=18),
    min_size=1, max_size=48))
@settings(**SETTINGS)
def test_canon_decimal_38_18_lockstep_random(spark, vals):
    """Randomized (38,18) sweep — the scale where integral values can
    exceed the long range AND 18 fractional digits stress the
    trailing-zero strip in the same value."""
    import decimal as _d

    _d.setcontext(_d.Context(prec=60))
    vals = [v.quantize(Decimal(1).scaleb(-18)) for v in vals]
    schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("v", T.DecimalType(38, 18))]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    got = {
        r["idx"]: r["c"]
        for r in df.select(
            "idx", canon_str(F.col("v"), T.DecimalType(38, 18)).alias("c")
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == py_canon(v), (str(v), got[i], py_canon(v))
