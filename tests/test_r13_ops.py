"""Round-13 optimization regression tests.

Each test pins an internals change made for performance this round so
that a later refactor cannot silently undo it (round rule: add a
focused test when an optimization changes an operator's internals).
"""

import pytest


# ---------------------------------------------------------------------------
# _stream_state_partitions: Hadoop-FS sizing (r12 verdict item 2)
# ---------------------------------------------------------------------------


def test_stream_state_partitions_nested_partitioned_dir(spark, tmp_path):
    """The old os.listdir probe only summed *.parquet files at the top
    level of the directory, so a nested/partitioned layout sized to 0
    bytes -> 1 partition. getContentSummary is recursive."""
    from tada_spark.queries import _stream_state_partitions

    d = tmp_path / "events.parquet" / "day=2026-01-01"
    d.mkdir(parents=True)
    (d / "part-0000.parquet").write_bytes(b"\0" * (2 * (1 << 20) + 1024))
    n = _stream_state_partitions(spark, str(tmp_path))
    assert n == 3  # 2 MB + change -> 2 // 1MB + 1


def test_stream_state_partitions_nonlocal_uri_falls_back_wide(spark):
    """A URI whose scheme has no FileSystem impl must fall back to full
    fan-out (4 x parallelism), NEVER to a serial state store — the r12
    silent-degradation bug (verdict item 2 / advice medium #2)."""
    from tada_spark.queries import _stream_state_partitions

    par = max(int(spark.sparkContext.defaultParallelism), 1)
    n = _stream_state_partitions(spark, "nosuchscheme://bucket/prefix")
    assert n == 4 * par
    assert n != 1


def test_stream_state_partitions_env_override(spark, monkeypatch, tmp_path):
    from tada_spark.queries import _stream_state_partitions

    monkeypatch.setenv("TADA_STREAM_SHUFFLE_PARTITIONS", "17")
    assert _stream_state_partitions(spark, str(tmp_path)) == 17


def test_fs_input_bytes_matches_flat_file(spark, tmp_path):
    from tada_spark.queries import _fs_input_bytes

    p = tmp_path / "events.parquet"
    p.write_bytes(b"x" * 4096)
    assert _fs_input_bytes(spark, str(p)) == 4096
