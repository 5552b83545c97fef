"""Regression pins for the round-9 sixth review pass (bloom, layout,
sources, skew): NULL dim keys crashing bitmap construction, cross-type
bloom false negatives, the single-slash Hadoop URI bypassing the
compaction guard, by-column ragged input silently truncating,
Decimal/binary columns crashing the JSON codec, write_structs
rejecting defaulted fields, and duplicate hot keys multiplying
salted-join output.
"""

from __future__ import annotations

import dataclasses
import decimal

import pytest
from pyspark.sql import functions as F

from tada_spark.frame import Frame


def test_bloom_bitmap_null_keys_and_cross_type_probe(spark):
    from tada_spark.operators.bloomjoin import bloom_bitmap, bloom_prefilter

    dim = spark.createDataFrame([(1,), (2,), (None,)], "k bigint")
    bm = bloom_bitmap(dim, "k")  # before: 'Cannot use null as map key'
    fact = spark.createDataFrame([(1.0,), (2.0,), (99.0,)], "k double")
    kept = {r.k for r in bloom_prefilter(fact, "k", bm).collect()}
    # before: bigint 1 hashed '1' but double 1.0 hashed '1.0' — false
    # negatives dropped BOTH matching fact rows
    assert {1.0, 2.0} <= kept  # no false negatives (99.0 may fp-pass)


def test_same_target_single_slash_uri():
    from tada_spark.operators.layout import _same_target

    assert _same_target("file:/tmp/t", "/tmp/t")
    assert _same_target("file:/tmp/t", "file:///tmp/t")
    assert not _same_target("file:/tmp/t", "/tmp/u")
    assert _same_target("hdfs:/data/t", "hdfs://data/t") or True  # forms differ; just no crash


def test_read_records_by_column_ragged_raises(spark):
    from tada_spark.sources.records import read_records

    with pytest.raises(ValueError, match="ragged"):
        read_records(spark, [["a", "1", "2"], ["b", "9"]], by_column=True)


def test_json_codec_decimal_and_binary_roundtrip(spark):
    from tada_spark.sources.codec import frame_from_json, frame_to_json

    df = spark.createDataFrame(
        [(decimal.Decimal("12345678901234.57"), bytearray(b"\x00\xffabc"))],
        "d decimal(20,2), b binary",
    )
    rt = frame_from_json(spark, frame_to_json(Frame(df)))
    assert dict(rt.df.dtypes) == {"d": "decimal(20,2)", "b": "binary"}
    row = rt.df.collect()[0]
    assert row.d == decimal.Decimal("12345678901234.57")
    assert bytes(row.b) == b"\x00\xffabc"


def test_write_structs_defaulted_field_may_be_absent(spark):
    from tada_spark.sources.structs import write_structs

    @dataclasses.dataclass
    class Rec:
        a: int
        b: int = 7

    f = Frame(spark.createDataFrame([(1,)], "a int"))
    out = write_structs(f, Rec)  # before: KeyError despite the default
    assert out == [Rec(a=1, b=7)]
    with pytest.raises(KeyError, match="missing"):
        write_structs(f, Rec, strict=True)  # strict still requires all


def test_salted_join_duplicate_hot_keys_no_multiplication(spark):
    from tada_spark.operators.skew import salted_join

    left = spark.createDataFrame([("u1", 1), ("u2", 2)], "k string, lv int")
    right = spark.createDataFrame([("u1", 10), ("u2", 20)], "k string, rv int")
    dup_hot = spark.createDataFrame([("u1",), ("u1",)], "k string")
    out = salted_join(left, right, on=["k"], hot_keys=dup_hot)
    rows = sorted((r.k, r.lv, r.rv) for r in out.collect())
    # before: each u1 pair appeared 4x (2 left copies x 2 right copies)
    assert rows == [("u1", 1, 10), ("u2", 2, 20)]


def test_transcendental_lint_covers_log_variants():
    import importlib.util

    spec = importlib.util.spec_from_file_location("co", "tools/check_oracle.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    # LOG10/LOG2 previously sailed past the LN|LOG|EXP pattern
    assert m.transcendental_lint("SELECT LOG10(x), LOG2(y) FROM t") == ["LOG10(", "LOG2("]
    assert m.transcendental_lint("SELECT det_ln_term FROM t") == []


def test_replica_preserves_doc_embedding_id_domain(tmp_path):
    import subprocess
    import sys

    import duckdb

    out = str(tmp_path / "rep")
    subprocess.run(
        [sys.executable, "tools/make_replica.py", "/root/testdata/sf0.001", out, "2"],
        check=True, capture_output=True,
    )
    # doc_id == vec_id pairs rows ACROSS tables (rrf fusion depends on
    # it); mismatched shifts previously left copy i>=1 unpaired
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{out}/documents.parquet' d "
        f"JOIN '{out}/embeddings.parquet' e ON d.doc_id = e.vec_id"
    ).fetchone()[0]
    base = duckdb.sql(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.001/documents.parquet' d "
        "JOIN '/root/testdata/sf0.001/embeddings.parquet' e ON d.doc_id = e.vec_id"
    ).fetchone()[0]
    assert n == 2 * base
