"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its
oracle_sql() twin on DuckDB against the same parquet tables, then
compares row count, sorted-column schema, and an order-insensitive
value hash (columns sorted by name, rows sorted by stringified values,
values canonicalized). Run before every commit that touches queries or
operator semantics.

Usage:
  python tools/check_oracle.py [--sf DIR] [-q NAME ...]

Entries without an oracle always run and are marked [rows-only].
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from datetime import date, datetime

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        # tz-aware values (DuckDB TIMESTAMPTZ) canon differently from
        # naive on purpose: an engine emitting the wrong timestamp
        # family must hash-mismatch here, like it does at the driver
        if v.tzinfo is not None:
            from datetime import timezone

            return v.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def spark_type_class(dt) -> str:
    """Coarse dtype class for cross-engine schema comparison. Integer
    widths collapse (DuckDB SUM(BIGINT) is HUGEINT) but the timestamp
    FAMILIES stay distinct — NTZ vs LTZ drift is exactly the schema bug
    the driver catches and a names-only check missed in round 2."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "ts_ntz"
    if isinstance(dt, T.TimestampType):
        return "ts_ltz"
    if isinstance(dt, T.ArrayType):
        return "list"
    return "other"


def duckdb_type_class(name: str) -> str:
    u = name.upper()
    if u.endswith("[]"):
        return "list"
    if u.startswith("DECIMAL"):
        return "decimal"
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if u in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if u == "VARCHAR":
        return "str"
    if u == "BOOLEAN":
        return "bool"
    if u == "DATE":
        return "date"
    if "TIMESTAMP" in u and "TIME ZONE" in u:
        return "ts_ltz"
    if u.startswith("TIMESTAMP"):
        return "ts_ntz"
    return "other"


def spark_unsafe(dt) -> str | None:
    """Driver-canon-unsafe Spark output type, or None. The driver's
    canonicalizer renders wide decimals via a float path ('56.2') while
    narrow engines keep scale ('56.20') — every round-3 hash-red traced
    to this class. Output columns must be long/double/narrow types."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType) and dt.precision > 18:
        return f"decimal({dt.precision},{dt.scale})"
    return None


def duckdb_unsafe(name: str) -> str | None:
    """Driver-canon-unsafe DuckDB oracle output type, or None. Bare
    SUM(int) is HUGEINT (int128 -> driver float path -> '123.0' vs
    Spark LONG '123'); SUM(DECIMAL(18,2)) widens to DECIMAL(38,2).
    Oracles must cast sums ::BIGINT / ::DOUBLE or use the cents idiom."""
    u = name.upper()
    if u == "HUGEINT" or u == "UHUGEINT":
        return u
    if u.startswith("DECIMAL"):
        import re

        m = re.match(r"DECIMAL\((\d+)", u)
        if m and int(m.group(1)) > 18:
            return u
    return None


def round_lint(sql: str) -> list[str]:
    """Two-arg ROUND(x, n) left in oracle SQL — the engine-native-ROUND
    divergence class (Spark BigDecimal vs DuckDB std::round disagree on
    boundary values; r4 verdict 'what's wrong' #1). Oracles must use the
    floor idiom FLOOR(x * 10^n + 0.5) / 10^n; the ONLY sanctioned ROUND
    is the single-arg exact-cents idiom ROUND(x * 100)::BIGINT. Returns
    the offending call snippets (paren-aware, so FILTER/OVER clauses and
    nested calls don't fool it)."""
    import re

    hits = []
    pos = 0
    while True:
        # case-insensitive, whitespace-tolerant: 'round (x, 2)' is legal
        # DuckDB and must not slip past the gate
        m = re.compile(r"\bROUND\s*\(", re.IGNORECASE).search(sql, pos)
        if m is None:
            return hits
        i, j = m.start(), m.end() - 1
        depth, top_commas = 0, 0
        while j < len(sql):
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                top_commas += 1
            j += 1
        if top_commas >= 1:
            hits.append(re.sub(r"\s+", " ", sql[i : j + 1])[:80])
        pos = j + 1


#: Oracles allowed to keep a native transcendental, with why. Native
#: log/exp/pow differ from Java's in the last ulp, so hash safety rests
#: on the output's rounding granularity — new oracles must use det_ln
#: (plans/semantics.py) / explicit self-multiplication instead.
TRANSCENDENTAL_ALLOWED: set[str] = set()  # emptied in r6: tfidf migrated to det_ln


def transcendental_lint(sql: str) -> list[str]:
    """Native LN/LOG/EXP/POW/POWER in oracle SQL — the library-
    transcendental divergence class (engines' libm differ in the last
    ulp; det_ln exists precisely so hash-compared outputs never call
    them). Returns offending snippets."""
    import re

    return [
        m.group(0)
        for m in re.finditer(r"\b(?:LN|LOG2|LOG10|LOG|EXP|POW|POWER)\s*\(", sql, re.IGNORECASE)
    ]


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--query", action="append")
    ap.add_argument(
        "--cpus", type=int, default=8,
        help="local[N] parallelism — run the gate at two different N to prove partition-count invariance",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from tada_spark.session import get_spark

    spark = get_spark(cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from tada_spark.queries import TABLES

    con = duckdb.connect()
    # Spark pins spark.sql.session.timeZone=UTC; DuckDB defaults to the
    # SYSTEM zone — any instant->naive cast in an oracle (::TIMESTAMP on
    # to_timestamp) would shift by the local offset on a non-UTC machine
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # lint EVERY oracle string up front (pure string check, milliseconds)
    # so a violation is reported before any Spark run pays for it, and a
    # -q-filtered invocation still gates the whole catalog
    lint_hits = {n: rl for n, sql in oracles.items() if (rl := round_lint(sql))}
    if lint_hits:
        for n, rl in lint_hits.items():
            print(f"LINT  {n}: engine-native two-arg ROUND in oracle SQL: {rl[:3]}")
        print(f"\n{len(lint_hits)} oracle(s) fail the ROUND lint — fix before running")
        return 1
    tr_hits = {
        n: tl
        for n, sql in oracles.items()
        if n not in TRANSCENDENTAL_ALLOWED and (tl := transcendental_lint(sql))
    }
    if tr_hits:
        for n, tl in tr_hits.items():
            print(f"LINT  {n}: native transcendental in oracle SQL (use det_ln): {tl[:3]}")
        print(f"\n{len(tr_hits)} oracle(s) fail the transcendental lint — fix before running")
        return 1
    names = args.query or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(qs)[:5]}...")
        return 2
    n_pass = n_fail = 0
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            stypes = {f.name: spark_type_class(f.dataType) for f in sdf.schema.fields}
            s_unsafe = {
                f.name: u for f in sdf.schema.fields if (u := spark_unsafe(f.dataType))
            }
            srows = [tuple(r) for r in sdf.collect()]
            s_hash, s_n = table_hash(scols, srows)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if s_unsafe:
            print(f"FAIL  {name}: driver-canon-unsafe spark output types: {s_unsafe}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "rows-only"
            print(f"OK?   {name}: {s_n} rows [{status}] ({spark_t:.1f}s)")
            n_pass += 1
            continue
        try:
            draw = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()}
            dtypes = {c: duckdb_type_class(t) for c, t in draw.items()}
            d_unsafe = {c: u for c, t in draw.items() if (u := duckdb_unsafe(t))}
            if d_unsafe:
                print(f"FAIL  {name}: driver-canon-unsafe oracle output types: {d_unsafe}")
                n_fail += 1
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            d_hash, d_n = table_hash(dcols, drows)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        type_diffs = {
            c: (stypes.get(c), dtypes.get(c))
            for c in set(scols) | set(dcols)
            if stypes.get(c) != dtypes.get(c)
        }
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} duckdb={sorted(dcols)}")
            n_fail += 1
        elif type_diffs:
            print(f"FAIL  {name}: dtype mismatch (spark, duckdb): {type_diffs}")
            n_fail += 1
        elif s_n != d_n:
            print(f"FAIL  {name}: rowcount spark={s_n} duckdb={d_n}")
            n_fail += 1
        elif s_hash != d_hash:
            print(f"FAIL  {name}: value hash mismatch ({s_n} rows)")
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(canon_value(r[i]) for i in order) for r in srows)
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = sorted("|".join(canon_value(r[i]) for i in dorder) for r in drows)
            diffs = [(a, b) for a, b in zip(sset, dset) if a != b]
            for a, b in diffs[:3]:
                print(f"      spark : {a[:200]}")
                print(f"      duckdb: {b[:200]}")
            print(f"      ({len(diffs)} differing rows)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {s_n} rows hash={s_hash} ({spark_t:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
