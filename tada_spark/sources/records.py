"""Record-oriented IO (reference RecordReader/Writer io.go:213-299).

Records are [][]str (row- or column-major) with N header rows and M
label levels. Type inference samples 10 values per column and
majority-votes Float64/DateTime/Date/String (reference
internal.go:844-892). These are small-data constructors (test authoring,
interop) — the 100 TB path is parquet; nothing here appears in an
operator hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tada_spark.frame import Frame
from tada_spark.plans.semantics import NULL_STRINGS, canon_str

#: Reference multi-level column-name separator (options.go:9).
LEVEL_SEP = "|"

NULL_OUT = "(null)"


def _infer_dtype(values: list[str]) -> str:
    """10-sample majority vote (reference internal.go:844-892)."""
    import datetime

    sample = [v for v in values if v not in (None, "", *NULL_STRINGS)][:10]
    if not sample:
        return "string"
    votes = {"double": 0, "timestamp": 0, "date": 0, "string": 0}
    for v in sample:
        try:
            float(v)
            votes["double"] += 1
            continue
        except ValueError:
            pass
        for fmt, kind in (
            ("%Y-%m-%d %H:%M:%S", "timestamp"),
            ("%Y-%m-%dT%H:%M:%S", "timestamp"),
            ("%Y-%m-%d", "date"),
            ("%m/%d/%Y", "date"),
        ):
            try:
                datetime.datetime.strptime(v, fmt)
                votes[kind] += 1
                break
            except ValueError:
                continue
        else:
            votes["string"] += 1
    return max(votes, key=lambda k: (votes[k], k != "string"))


def read_records(
    spark: SparkSession,
    records: list[list[str]],
    *,
    by_column: bool = False,
    header_rows: int = 1,
    label_levels: int = 0,
    infer_types: bool = False,
    blank_as_null: bool = False,
) -> Frame:
    """[][]string → Frame (reference io.go:213-268)."""
    if not records:
        raise ValueError("read_records: must have at least one record")
    if by_column:
        # zip(*ragged) TRUNCATES to the shortest column before the
        # width check below could ever see the discrepancy — silent
        # data loss where the row-major path correctly raises
        if any(len(c) != len(records[0]) for c in records):
            raise ValueError("read_records: ragged records (columns differ in length)")
    rows = [list(r) for r in (zip(*records) if by_column else records)]
    width = len(rows[0])
    if any(len(r) != width for r in rows):
        raise ValueError("read_records: ragged records (rows differ in length)")

    headers = rows[:header_rows]
    data = rows[header_rows:]
    if headers:
        names = [LEVEL_SEP.join(h[i] for h in headers) for i in range(width)]
    else:
        names = [str(i) for i in range(width)]
    # default label level names (reference *0 convention, internal.go:160-174)
    for i in range(label_levels):
        if not headers or not names[i]:
            names[i] = f"*{i}"

    nulls = set(NULL_STRINGS) | ({""} if blank_as_null else set())
    py_rows = [tuple(None if v in nulls else v for v in r) for r in data]
    df = spark.createDataFrame(py_rows, schema=", ".join(f"`{n}` string" for n in names))
    f = Frame(df, labels=names[:label_levels])
    if infer_types:
        casts = {}
        for i, n in enumerate(names):
            dtype = _infer_dtype([r[i] for r in data])
            if dtype != "string":
                casts[n] = dtype
        if casts:
            f = f.cast(**casts)
    return f


def read_slices(
    spark: SparkSession,
    columns: dict[str, list],
    *,
    labels: list[str] = (),
    name: str = "",
) -> Frame:
    """Column slices → Frame (reference SliceReader io.go:142-208)."""
    if not columns:
        raise ValueError("read_slices: no columns")
    lengths = {k: len(v) for k, v in columns.items()}
    if len(set(lengths.values())) > 1:
        raise ValueError(f"read_slices: unequal column lengths {lengths}")
    names = list(columns)
    rows = [tuple(columns[c][i] for c in names) for i in range(next(iter(lengths.values())))]
    df = spark.createDataFrame(rows, schema=names)
    return Frame(df, labels=list(labels), name=name)


def from_pandas(spark: SparkSession, pdf, *, labels: list[str] = ()) -> Frame:
    """pandas → Frame via Arrow (reference tada-io Arrow interop,
    README.md:147-150); NaN→NULL normalization applied."""
    from tada_spark.plans.semantics import normalize_nulls

    return Frame(normalize_nulls(spark.createDataFrame(pdf)), labels=list(labels))


def read_interface_records(spark: SparkSession, records: list[dict], labels: list[str] = ()) -> Frame:
    """[]map records (reference InterfaceRecordReader io.go:363-432)."""
    df = spark.createDataFrame(records)
    return Frame(df, labels=list(labels))


def write_records(frame: Frame, *, include_labels: bool = True) -> list[list[str]]:
    """Frame → [][]string with nulls as "(null)" (reference
    io.go:271-299). Driver-side sink — test/interop scale only."""
    df = frame.to_df()
    cols = frame.columns if include_labels else frame.value_columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    out = df.select(*[canon_str(F.col(c), fields[c]).alias(c) for c in cols]).collect()
    header = [list(cols)]
    body = [[NULL_OUT if v == "\x00null" else v for v in row] for row in out]
    return header + body
