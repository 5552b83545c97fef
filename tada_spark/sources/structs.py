"""Struct/dataclass IO (reference StructReader/Writer io.go:437-500).

The reference maps Go structs ↔ DataFrames via `json` tags; the Python
analog is dataclasses (field name = column name). ``strict`` mirrors the
reference's Strict mode (all fields required, no extras).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from pyspark.sql import SparkSession

from tada_spark.frame import Frame


def read_structs(spark: SparkSession, items: list[Any], *, labels: list[str] = ()) -> Frame:
    """list-of-dataclasses → Frame."""
    if not items:
        raise ValueError("read_structs: empty input")
    if not dataclasses.is_dataclass(items[0]):
        raise TypeError("read_structs: expected dataclass instances")
    rows = [dataclasses.asdict(x) for x in items]
    df = spark.createDataFrame(rows)
    # preserve declared field order (createDataFrame sorts dict keys)
    order = [f.name for f in dataclasses.fields(items[0])]
    return Frame(df.select(*order), labels=list(labels))


def write_structs(frame: Frame, cls: type, *, strict: bool = False) -> list[Any]:
    """Frame → list-of-dataclasses. ``strict``: every dataclass field must
    exist as a column and (if no default) be present (reference Strict,
    io.go:470-500). Driver-side sink."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError("write_structs: cls must be a dataclass")
    cols = set(frame.columns)
    has_default = {
        f.name: (
            f.default is not dataclasses.MISSING
            or f.default_factory is not dataclasses.MISSING
        )
        for f in dataclasses.fields(cls)
    }
    # the documented contract: outside strict, a field WITH a default
    # may be absent from the frame (it takes its default); only
    # defaultless fields are required
    required = [
        f for f, dflt in has_default.items() if not dflt or strict
    ]
    missing = [f for f in required if f not in cols]
    if missing:
        raise KeyError(f"write_structs: columns missing for fields {missing}")
    if strict:
        extra = [c for c in frame.columns if c not in has_default]
        if extra:
            raise KeyError(f"write_structs (strict): extra columns {extra}")
    present = [f in cols for f in has_default]
    use = [f for f, p in zip(has_default, present) if p]
    rows = frame.to_df().select(*use).collect()
    return [cls(**{f: row[f] for f in use}) for row in rows]
