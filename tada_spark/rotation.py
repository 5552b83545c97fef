"""Artifact-derived driver-window rotation.

The per-round driver verifies only the FIRST 50 ``queries()`` entries
against their DuckDB oracles, while the catalog holds 200+ entries.
Round 6 proved that a hand-maintained priority list drifts from the
artifacts that actually exist (the r07 verdict found a narrated
"round-6 union" with no round-6 files on disk).  This module replaces
the hand list with an order COMPUTED from the committed
``CORRECTNESS_r*.json`` files, so the window can never disagree with
the evidence again.

Rule (deterministic, artifact-only — no clock, no hand list):

1. **Never-driver-green oracle-able entries first, newest catalog
   position first.**  The catalog is append-ordered, so descending
   catalog index == most-recently-added first; this implements the
   standing policy that new entries earn their first driver row the
   round after they land, and clears the backlog from the newest
   additions backwards.
2. **Then stale-evidence entries: driver-green but REWRITTEN in a
   later round** (per the committed ``REWRITES_r*.json`` artifacts —
   each optimization round commits the list of entries whose
   implementation it restructured).  A green row that predates a
   rewrite verified the OLD implementation; the entry's risk reset
   when the code changed, so its evidence age must too (r12 verdict
   item 1: q3/q5/theil_sen/curation/cosine-ANN/bm25/stream_* were
   rewritten in r12 on builder-side evidence only and LRU pushed them
   to the back of the queue exactly when their risk was highest).
   Ordered newest rewrite round first (the most recent rewrites are
   the least-verified), then oldest green round, then catalog order.
3. **Then fresh driver-green entries, oldest green round first
   (LRU)**, tie-broken by catalog order.  An entry verified in round
   N outranks one verified in round N+1, so every entry's evidence
   age is bounded by ``ceil(oracle_able / 50)`` rounds once the
   never-green backlog drains.
4. **Rows-only-by-nature entries last** (``oracle_sql()`` omits them;
   the driver can only count their rows).  Their hash-verified md5 /
   bounded-error twins compete for window slots instead.

"Green" means a CORRECTNESS row with ``err is null`` and
``rows_match``, ``schema_match`` and ``hash_match`` all true — the
strongest signal the driver emits.  A rows-only green (hash_match
false) does not count; those entries should re-enter the window until
they earn a hash match or are reclassified as rows-only-by-nature.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

#: Repo root = parent of the package directory; the driver artifacts
#: (CORRECTNESS_r*.json) are committed there next to __spark_entry__.py.
REPO_ROOT = Path(__file__).resolve().parents[1]

_ARTIFACT_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")
_REWRITE_RE = re.compile(r"REWRITES_r(\d+)\.json$")


#: Artifact files that existed but could not be parsed on the last
#: correctness_artifacts() call — surfaced by freshness_report and the
#: narrative. Silently skipping a truncated CORRECTNESS_r*.json would
#: reclassify that round's greens as never-green and quietly reshuffle
#: the window — the exact silent drift this module exists to prevent.
_UNREADABLE: list[str] = []


def correctness_artifacts(root: Path | str = REPO_ROOT) -> dict[int, dict]:
    """All committed driver-correctness artifacts, keyed by round.
    Unreadable/corrupt files are recorded in ``_UNREADABLE`` (and shown
    by freshness_report/narrative) rather than silently skipped."""
    out: dict[int, dict] = {}
    _UNREADABLE.clear()
    for p in sorted(Path(root).glob("CORRECTNESS_r*.json")):
        m = _ARTIFACT_RE.search(p.name)
        if not m:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            _UNREADABLE.append(p.name)
            continue
        if isinstance(data, dict):
            out[int(m.group(1))] = data
        else:
            _UNREADABLE.append(p.name)
    return out


def _row_is_green(row: object) -> bool:
    return (
        isinstance(row, dict)
        and row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def _greens_from(arts: dict[int, dict]) -> dict[str, int]:
    newest: dict[str, int] = {}
    for rnd, rows in arts.items():
        for name, row in rows.items():
            if _row_is_green(row):
                newest[name] = max(newest.get(name, rnd), rnd)
    return newest


def newest_green(root: Path | str = REPO_ROOT) -> dict[str, int]:
    """entry -> newest round with a fully-green driver row."""
    return _greens_from(correctness_artifacts(root))


def newest_rewrite(root: Path | str = REPO_ROOT) -> dict[str, int]:
    """entry -> newest round whose REWRITES_r*.json lists it.

    ``REWRITES_rN.json`` is committed by round N's builder and holds a
    JSON array of catalog-entry names whose implementation round N
    restructured (a rename/refactor that cannot change results does
    not belong in it; a changed plan shape does).  Unreadable files
    are surfaced via ``_UNREADABLE`` just like correctness artifacts —
    silently skipping one would silently unstale that round's
    rewrites.
    """
    out: dict[str, int] = {}
    for p in sorted(Path(root).glob("REWRITES_r*.json")):
        m = _REWRITE_RE.search(p.name)
        if not m:
            continue
        try:
            names = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            _UNREADABLE.append(p.name)
            continue
        if not isinstance(names, list):
            _UNREADABLE.append(p.name)
            continue
        rnd = int(m.group(1))
        for name in names:
            if isinstance(name, str):
                out[name] = max(out.get(name, rnd), rnd)
    return out


def driver_order(
    catalog: dict,
    root: Path | str = REPO_ROOT,
    *,
    greens: dict[str, int] | None = None,
    rewrites: dict[str, int] | None = None,
) -> list[str]:
    """The full queries() ordering per the four-tier rule above.

    ``catalog`` maps name -> (callable, oracle_sql_or_None); insertion
    order is the append order used for recency/tie-breaks.
    """
    index = {name: i for i, name in enumerate(catalog)}
    oracle_able = [n for n, (_fn, sql) in catalog.items() if sql is not None]
    rows_only = [n for n, (_fn, sql) in catalog.items() if sql is None]
    if greens is None:
        greens = newest_green(root)
    if rewrites is None:
        rewrites = newest_rewrite(root)
    never = sorted((n for n in oracle_able if n not in greens),
                   key=lambda n: -index[n])
    # Green but rewritten since: the green row verified the OLD code.
    stale = sorted(
        (n for n in oracle_able if n in greens and rewrites.get(n, -1) > greens[n]),
        key=lambda n: (-rewrites[n], greens[n], index[n]),
    )
    stale_set = set(stale)
    seen = sorted(
        (n for n in oracle_able if n in greens and n not in stale_set),
        key=lambda n: (greens[n], index[n]),
    )
    return never + stale + seen + rows_only


def freshness_report(
    catalog: dict, root: Path | str = REPO_ROOT, *, arts: dict[int, dict] | None = None
) -> dict:
    """Honest accounting of the driver evidence, computed not narrated.

    Returned dict: rounds_on_disk, union size (distinct ever-green
    oracle-able entries), never_green count, per-round green counts,
    and the minimum full-coverage cycle length at 50 rows/round.
    """
    if arts is None:
        arts = correctness_artifacts(root)
    greens = _greens_from(arts)
    rewrites = newest_rewrite(root)
    oracle_able = [n for n, (_fn, sql) in catalog.items() if sql is not None]
    ever = [n for n in oracle_able if n in greens]
    stale = [n for n in ever if rewrites.get(n, -1) > greens[n]]
    return {
        "rounds_on_disk": sorted(arts),
        "unreadable_artifacts": list(_UNREADABLE),
        "oracle_able": len(oracle_able),
        "ever_driver_green": len(ever),
        "never_driver_green": len(oracle_able) - len(ever),
        "stale_evidence": len(stale),
        "newest_green_histogram": {
            r: sum(1 for n in ever if greens[n] == r)
            for r in sorted(set(greens[n] for n in ever))
        },
        "min_cycle_rounds": -(-len(oracle_able) // 50),
    }


def narrative(catalog: dict, root: Path | str = REPO_ROOT) -> str:
    """The honest-accounting paragraph, GENERATED from the artifacts.

    ``__spark_entry__`` appends this to its module docstring at import
    time, so the narrative is recomputed from the committed
    CORRECTNESS_r*.json files on every load and can never drift from
    them.  The r08 verdict's red test caught the previous hand-written
    paragraph going stale the moment a new artifact landed; generation
    is the fix, and tests/test_inventory_sync.py now asserts this exact
    text appears in the docstring (i.e. that generation ran).
    """
    arts = correctness_artifacts(root)  # ONE disk read feeds everything
    greens = _greens_from(arts)
    rep = freshness_report(catalog, root, arts=arts)
    order = driver_order(catalog, root, greens=greens)
    rounds = rep["rounds_on_disk"]
    hist = ", ".join(f"r{r:02d}={n}" for r, n in
                     sorted(rep["newest_green_histogram"].items()))
    window = order[:50]
    oracle = {n for n, (_fn, sql) in catalog.items() if sql is not None}
    n_never_in_window = sum(1 for n in window if n in oracle and n not in greens)
    missing = sorted(set(range(1, max(rounds) + 1)) - set(rounds)) if rounds else []
    missing_note = (
        f"  Round{'s' if len(missing) > 1 else ''} "
        f"{', '.join(map(str, missing))} produced no artifacts."
        if missing else ""
    )
    if rep["unreadable_artifacts"]:
        missing_note += (
            "  WARNING: unreadable artifact file(s) SKIPPED: "
            f"{', '.join(rep['unreadable_artifacts'])} — evidence below "
            "understates those rounds."
        )
    return (
        "Honest accounting (GENERATED at import from the committed\n"
        "CORRECTNESS_r*.json artifacts by tada_spark.rotation.narrative;\n"
        "tests/test_inventory_sync.py asserts this text is present and\n"
        "freshly regenerated, so it cannot go stale):\n"
        f"driver artifacts exist for rounds {rounds}.{missing_note}\n"
        f"{rep['ever_driver_green']} of {rep['oracle_able']} oracle-able "
        f"entries have ever been driver-green\n"
        f"(histogram of newest green round: {hist});\n"
        f"{rep['never_driver_green']} entries have never had a "
        f"driver-green row.  With 50 rows/round the\n"
        f"minimum full-coverage cycle is ceil({rep['oracle_able']}/50) = "
        f"{rep['min_cycle_rounds']} rounds.\n"
        f"{rep['stale_evidence']} green entries were rewritten after "
        f"their newest green round (REWRITES_r*.json)\n"
        f"and are re-queued ahead of the LRU tier.  The current window\n"
        f"leads with {n_never_in_window} never-green entries, head "
        f"{window[0]!r}."
    )
