"""Physical-layout helpers: multi-dimensional clustering keys.

Range-partitioning sorts ONE dimension; scans filtered on a second key
then read every file. A Z-order (Morton) key interleaves the bits of
two keys so that sorting by it clusters BOTH dimensions at once — the
Delta/Iceberg OPTIMIZE ZORDER technique, here as a plain Column
expression usable with repartitionByRange + write_parquet on bare
parquet. Pure integer bit arithmetic: deterministic, engine-replicable
(the oracle mirrors it with the same shifts), and scan-speed (codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative int
    columns: result bit 2i holds a's bit i, bit 2i+1 holds b's bit i.
    Callers bucket/normalize their dimensions into the bit range first
    (e.g. pmod of a key, days-since-epoch of a date)."""
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z
