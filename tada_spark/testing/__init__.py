"""Test-equality harness — the reference's identity feature.

The reference markets itself as "test-driven data pipelines"
(README.md:9): golden-record comparison (EqualRecords io.go:562-570,
cell-level diffs via tablediff) and typed-struct comparison
(EqualStructs io.go:575-597). Reproduced here over collect()'d
canonical records.
"""

from tada_spark.testing.equal import diff_records, equal_records, equal_structs
from tada_spark.testing.mock import write_mock_csv

__all__ = ["diff_records", "equal_records", "equal_structs", "write_mock_csv"]
