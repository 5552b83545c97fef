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


def test_driver_order_is_artifact_derived():
    """The window rule (rotation.py): never-green newest-first, then
    rewritten-since-green (stale evidence, newest rewrite first), then
    oldest-green LRU, rows-only last — recomputed here from the
    committed CORRECTNESS_r*.json / REWRITES_r*.json files,
    independently of the module's own sort."""
    import __spark_entry__ as entry
    from tada_spark.queries import CATALOG
    from tada_spark.rotation import newest_green, newest_rewrite

    q = list(entry.queries())
    assert len(q) == len(CATALOG)
    assert set(q) == set(CATALOG)

    greens = newest_green()
    rewrites = newest_rewrite()
    idx = {n: i for i, n in enumerate(CATALOG)}
    oracle = {n for n, (_f, s) in CATALOG.items() if s is not None}
    never = [n for n in q if n in oracle and n not in greens]
    stale = [n for n in q if n in oracle and n in greens
             and rewrites.get(n, -1) > greens[n]]
    seen = [n for n in q if n in oracle and n in greens
            and rewrites.get(n, -1) <= greens[n]]
    rows_only = [n for n in q if n not in oracle]

    # tier order: never-green, then stale-evidence, then fresh green,
    # then rows-only
    assert q == never + stale + seen + rows_only
    # tier 1: newest catalog position first
    assert [idx[n] for n in never] == sorted((idx[n] for n in never),
                                             reverse=True)
    # tier 2: newest rewrite round first, oldest green within it
    stale_keys = [(-rewrites[n], greens[n], idx[n]) for n in stale]
    assert stale_keys == sorted(stale_keys)
    # tier 3: non-decreasing newest-green round (LRU)
    rounds = [greens[n] for n in seen]
    assert rounds == sorted(rounds)
    # the driver's 50-slot window never wastes a slot on rows-only
    assert all(n in oracle for n in q[:50])


def test_rewrites_r12_requeued_in_r13_window():
    """r12 verdict item 1: every entry the r12 round rewrote on
    builder-side evidence only (green round < 12) must appear in the
    next driver window so CORRECTNESS_r13 verifies the NEW code."""
    import __spark_entry__ as entry
    from tada_spark.queries import CATALOG
    from tada_spark.rotation import newest_green, newest_rewrite

    greens = newest_green()
    rewrites = newest_rewrite()
    window = list(entry.queries())[:50]
    oracle = {n for n, (_f, s) in CATALOG.items() if s is not None}
    unverified_rewrites = [
        n for n in oracle
        if n in greens and rewrites.get(n, -1) > greens[n]
    ]
    missing = [n for n in unverified_rewrites if n not in window]
    assert not missing, (
        f"{len(unverified_rewrites)} rewritten-unverified entries, "
        f"window holds 50; missing: {missing}")


def test_entry_docstring_matches_artifacts():
    """The r07 verdict caught the docstring narrating a round-6 union
    that had no files; the r08 verdict caught the hand-written numbers
    going stale the moment CORRECTNESS_r08.json landed.  The narrative
    is now GENERATED at import (rotation.narrative appended to
    __spark_entry__.__doc__), so this test asserts (a) generation ran
    and (b) a fresh regeneration from the artifacts on disk matches
    the appended text exactly — any future drift between the two
    (e.g. a cached module vs new artifacts) still fails CI."""
    import __spark_entry__ as entry
    from tada_spark.queries import CATALOG
    from tada_spark.rotation import driver_order, freshness_report, narrative

    doc = entry.__doc__
    fresh = narrative(CATALOG)
    assert "--- generated narrative follows ---" in doc
    assert fresh in doc, "docstring narrative is stale vs artifacts on disk"
    # spot-check the generated claims against an independent recompute
    rep = freshness_report(CATALOG)
    assert f"ceil({rep['oracle_able']}/50) = {rep['min_cycle_rounds']}" in fresh
    assert f"{rep['ever_driver_green']} of {rep['oracle_able']}" in fresh
    assert f"{rep['never_driver_green']} entries have never" in fresh
    assert repr(driver_order(CATALOG)[0]) in fresh
    # round 6 produced no artifacts; the generator must say so while
    # any later round exists (keeps the historical honesty pinned)
    if rep["rounds_on_disk"] and max(rep["rounds_on_disk"]) >= 7:
        assert 6 not in rep["rounds_on_disk"]
        assert "produced no artifacts" in fresh


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


def test_rotation_on_synthetic_artifacts(tmp_path):
    """driver_order against a synthetic artifact dir: future rounds,
    red rows, rows-only rows and error rows must all be handled the
    way the rule says — without touching the repo's real files."""
    import json

    from tada_spark.rotation import driver_order, freshness_report, newest_green

    catalog = {
        "a": (None, "SELECT 1"),   # green in r2 then r9
        "b": (None, "SELECT 2"),   # green in r2 only
        "c": (None, "SELECT 3"),   # red in r9 (hash mismatch) -> never green
        "d": (None, "SELECT 4"),   # error row -> never green
        "e": (None, None),         # rows-only by nature
        "f": (None, "SELECT 6"),   # never appears in any artifact
    }
    g = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"a": g, "b": g}))
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps({
        "a": g,
        "c": {**g, "hash_match": False},
        "d": {**g, "err": "boom"},
    }))
    (tmp_path / "not_an_artifact.json").write_text("{}")

    assert newest_green(tmp_path) == {"a": 9, "b": 2}
    # never-green newest-catalog-first (f after d after c by reverse
    # index), then LRU greens (b r2 before a r9), rows-only last
    assert driver_order(catalog, tmp_path) == ["f", "d", "c", "b", "a", "e"]
    rep = freshness_report(catalog, tmp_path)
    assert rep["rounds_on_disk"] == [2, 9]
    assert rep["oracle_able"] == 5
    assert rep["ever_driver_green"] == 2
    assert rep["never_driver_green"] == 3
    assert rep["stale_evidence"] == 0
    assert rep["newest_green_histogram"] == {2: 1, 9: 1}

    # A rewrite AFTER an entry's newest green round requeues it ahead
    # of the LRU tier ("a" green r9, rewritten r10 -> stale); a rewrite
    # in/before the green round does not ("b" green r2 covers an r2
    # rewrite); rewrites of never-green or rows-only entries change
    # nothing (they are already first / pinned last).
    (tmp_path / "REWRITES_r10.json").write_text(json.dumps(["a", "e", "f"]))
    (tmp_path / "REWRITES_r02.json").write_text(json.dumps(["b"]))
    assert driver_order(catalog, tmp_path) == ["f", "d", "c", "a", "b", "e"]
    assert freshness_report(catalog, tmp_path)["stale_evidence"] == 1


def test_rotation_ignores_malformed_rewrites(tmp_path):
    import json

    from tada_spark.rotation import newest_rewrite

    (tmp_path / "REWRITES_r03.json").write_text("{ not json")
    (tmp_path / "REWRITES_r04.json").write_text(json.dumps({"not": "a list"}))
    (tmp_path / "REWRITES_r05.json").write_text(json.dumps(["x", 7, "y"]))
    (tmp_path / "REWRITES_r06.json").write_text(json.dumps(["x"]))
    assert newest_rewrite(tmp_path) == {"x": 6, "y": 5}


def test_rotation_ignores_malformed_artifacts(tmp_path):
    import json

    from tada_spark.rotation import newest_green

    (tmp_path / "CORRECTNESS_r03.json").write_text("{ not json")
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(["a", "list"]))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(
        {"x": {"rows_match": True, "schema_match": True,
               "hash_match": True, "err": None}}))
    assert newest_green(tmp_path) == {"x": 5}
