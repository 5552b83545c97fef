"""Build a key-shifted Nx replica of a testdata SF directory — the
scale-probe fixture generator behind SCALE.md's 10x/100x tables.

Key shifts keep join relationships intact while multiplying volume:
orders/lineitem share the +1e7*i orderkey shift, customer/orders/events
share the +1e6*i custkey/userkey shift, and c_name is re-suffixed so
name tiebreaks stay unique (the r7 q21 lesson). Dates, prices, texts
and embeddings repeat verbatim — so calendar-bounded day spines stay
fixed (the Theil-Sen/seasonal design point) while fact volume scales.
Replicating documents multiplies every duplicate cluster by N: pairwise
near-dup TRUTH grows ~N^2 by construction (an artifact of replication,
not of any plan — see SCALE.md).

Usage: python tools/make_replica.py SRC_DIR OUT_DIR N
e.g.:  python tools/make_replica.py /root/testdata/sf0.1 /tmp/sf10rep 100
"""

from __future__ import annotations

import shutil
import sys


def build(src: str, out: str, n: int) -> None:
    import os

    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # key ranges must fit under the shift constants or copies collide
    # and the "join relationships intact" invariant silently breaks
    # (e.g. chaining the tool on its own output)
    shifts = {
        "lineitem": [("l_orderkey", 10_000_000)],
        "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
        "customer": [("c_custkey", 1_000_000)],
        "events": [("event_id", 1_000_000), ("user_id", 1_000_000)],
        # documents and embeddings SHARE an id domain (doc_id == vec_id
        # pairs rows across the tables — rrf_hybrid_retrieval's fusion
        # depends on it), so they must share ONE shift or every copy
        # i >= 1 would fuse unrelated rows
        "documents": [("doc_id", 5_000_000)],
        "embeddings": [("vec_id", 5_000_000)],
    }
    for table, cols in shifts.items():
        for kc, shift in cols:
            mx = con.execute(
                f"SELECT MAX({kc}) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            if mx is not None and mx >= shift:
                raise ValueError(
                    f"make_replica: {table}.{kc} max {mx} >= shift {shift} — "
                    f"copies would collide; replicate from the base SF instead"
                )
    rng = f"(SELECT UNNEST(RANGE({n})) AS i)"
    copies = {
        "lineitem": f"""
            SELECT l_orderkey + i * 10000000 AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', {rng}""",
        "orders": f"""
            SELECT o_orderkey + i * 10000000 AS o_orderkey,
                   o_custkey + i * 1000000 AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet', {rng}""",
        "customer": f"""
            SELECT c_custkey + i * 1000000 AS c_custkey, c_name || '#' || i AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', {rng}""",
        "events": f"""
            SELECT event_id + i * 1000000 AS event_id, ts,
                   user_id + i * 1000000 AS user_id, event_type, value, props
            FROM '{src}/events.parquet', {rng}""",
        "documents": f"""
            SELECT doc_id + i * 5000000 AS doc_id, text, lang, source, n_chars
            FROM '{src}/documents.parquet', {rng}""",
        "embeddings": f"""
            SELECT vec_id + i * 5000000 AS vec_id, embedding, label
            FROM '{src}/embeddings.parquet', {rng}""",
    }
    for table, sql in copies.items():
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(table, con.execute(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0])
    for table in ("region", "nation", "supplier", "part"):
        shutil.copy(f"{src}/{table}.parquet", f"{out}/{table}.parquet")


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2], int(sys.argv[3]))
