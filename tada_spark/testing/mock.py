"""Mock-data generation (reference WriteMockCSV io.go:537-557).

Infers per-column dtypes from a source CSV's first rows (same
majority-vote used by RecordReader) and emits n rows of seeded
deterministic mock data.
"""

from __future__ import annotations

import csv
import io
import random

from tada_spark.sources.records import _infer_dtype

_MOCK_STRINGS = ["foo", "bar", "baz", "qux", "quuz"]


def write_mock_csv(src_csv: str, n: int, *, seed: int = 42) -> str:
    """Read a CSV (text), infer column types, emit header + n mock rows."""
    rows = list(csv.reader(io.StringIO(src_csv)))
    if not rows:
        raise ValueError("write_mock_csv: empty source")
    header, data = rows[0], rows[1:]
    rng = random.Random(seed)
    dtypes = [_infer_dtype([r[i] for r in data if i < len(r)]) for i in range(len(header))]
    out = io.StringIO()
    w = csv.writer(out)
    w.writerow(header)
    for _ in range(n):
        row = []
        for dt in dtypes:
            if dt == "double":
                row.append(f"{rng.uniform(0, 100):.2f}")
            elif dt == "timestamp":
                row.append(f"2020-01-{rng.randint(1, 28):02d} {rng.randint(0, 23):02d}:00:00")
            elif dt == "date":
                row.append(f"2020-01-{rng.randint(1, 28):02d}")
            else:
                row.append(rng.choice(_MOCK_STRINGS))
        w.writerow(row)
    return out.getvalue()
