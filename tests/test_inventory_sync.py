"""Drift guards: the numbers the docs claim must match the code.

README's inventory counts went stale twice in one session as the
catalog grew — cheap to pin, embarrassing to ship wrong."""

from __future__ import annotations

import re


def test_readme_counts_match_catalog():
    from tada_spark.queries import CATALOG

    readme = open("README.md").read()
    m = re.search(r"the (\d+)-query inventory", readme)
    assert m, "README inventory sentence missing"
    assert int(m.group(1)) == len(CATALOG)
    m = re.search(r"(\d+) of (\d+) queries are oracle-checked", readme)
    assert m, "README oracle-count sentence missing"
    n_oracle = sum(1 for _n, (_f, sql) in CATALOG.items() if sql is not None)
    assert (int(m.group(1)), int(m.group(2))) == (n_oracle, len(CATALOG))


def test_driver_window_is_50_known_entries():
    import __spark_entry__ as entry
    from tada_spark.queries import CATALOG

    prio = entry._DRIVER_PRIORITY
    assert len(prio) == 50
    assert len(set(prio)) == 50
    missing = [n for n in prio if n not in CATALOG]
    assert not missing, f"driver window names unknown entries: {missing}"
    # the full ordering covers the catalog exactly once
    q = entry.queries()
    assert list(q)[:50] == prio
    assert len(q) == len(CATALOG)


def test_every_oracle_parses_in_duckdb():
    """EXPLAIN every oracle against empty views — catches SQL typos
    without running the data (the driver would find them a round
    later)."""
    import duckdb

    from tada_spark.queries import CATALOG

    from tada_spark.queries import TABLES

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # empty twins with the REAL schemas (epoch_us is a DuckDB builtin)
    for t in TABLES:
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet') WHERE FALSE"
        )
    bad = []
    for name, (_fn, sql) in CATALOG.items():
        if sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
