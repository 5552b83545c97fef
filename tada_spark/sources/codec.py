"""Column-oriented JSON codec + matrix IO (reference io.go:45-97, 505-532).

The reference's JSON form is column-oriented with explicit null masks:
  {"name": ..., "labels": [{name, values, nulls}], "columns": [...]}
Driver-side (test/interop scale). The 100 TB JSON path is
spark.read/write.json, which Frame exposes directly.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import SparkSession

from tada_spark.frame import Frame


def frame_to_json(frame: Frame) -> str:
    """Frame → column-oriented JSON with null masks."""
    df = frame.to_df()
    rows = df.collect()
    cols = []
    for i, name in enumerate(df.columns):
        values = [r[i] for r in rows]
        nulls = [v is None or (isinstance(v, float) and math.isnan(v)) for v in values]
        cols.append(
            {
                "name": name,
                "values": [None if n else _jsonable(v) for v, n in zip(values, nulls)],
                "nulls": nulls,
                "is_label": name in frame.labels,
                # dtype rides along so an all-null column round-trips —
                # bare-name schema inference fails with no non-null value
                "dtype": df.schema[name].dataType.simpleString(),
            }
        )
    return json.dumps({"name": frame.name, "columns": cols})


def _jsonable(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def frame_from_json(spark: SparkSession, payload: str) -> Frame:
    """Column-oriented JSON → Frame (strings re-parse via Frame.cast)."""
    doc = json.loads(payload)
    cols = doc["columns"]
    if not cols:
        raise ValueError("frame_from_json: no columns")
    names = [c["name"] for c in cols]
    n = len(cols[0]["values"])
    rows = [
        tuple(None if c["nulls"][i] else c["values"][i] for c in cols) for i in range(n)
    ]
    if all("dtype" in c for c in cols):
        # timestamps/dates serialized as ISO strings — declare string and
        # let Frame.cast re-parse; everything else keeps its dtype
        def sql_type(c):
            return "string" if c["dtype"] in ("timestamp", "date") else c["dtype"]

        schema = ", ".join(f"`{c['name']}` {sql_type(c)}" for c in cols)
    else:
        schema = names  # legacy payloads without dtype hints
    df = spark.createDataFrame(rows, schema=schema)
    return Frame(df, labels=[c["name"] for c in cols if c.get("is_label")], name=doc.get("name", ""))


def read_matrix(spark: SparkSession, matrix, col_names: list[str] | None = None) -> Frame:
    """2-D numeric array (numpy / nested lists) → all-float64 Frame
    (reference MatrixReader io.go:505-532)."""
    data = [[float(x) for x in row] for row in matrix]
    if not data:
        raise ValueError("read_matrix: empty matrix")
    names = col_names or [str(i) for i in range(len(data[0]))]
    df = spark.createDataFrame([tuple(r) for r in data], schema=", ".join(f"`{n}` double" for n in names))
    return Frame(df)
