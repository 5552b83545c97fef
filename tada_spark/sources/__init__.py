"""Sources / sinks (reference io.go Reader/Writer protocol, §2.1).

The reference is pluggable via Reader/Writer interfaces (io.go:99-135);
here each reader is a function → Frame and each writer a function from
Frame. Spark natively adds parquet/json/jdbc/orc breadth the reference
lacks; the reference-specific formats (records, structs, matrix, mock
CSV) are reproduced for parity.
"""

from tada_spark.sources.bucketed import read_table, write_bucketed
from tada_spark.sources.records import (
    read_interface_records,
    read_records,
    write_records,
)
from tada_spark.sources.structs import read_structs, write_structs

__all__ = [
    "read_interface_records",
    "read_records",
    "read_structs",
    "read_table",
    "write_bucketed",
    "write_records",
    "write_structs",
]
