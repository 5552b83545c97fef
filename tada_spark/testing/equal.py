"""EqualRecords / EqualStructs (reference io.go:562-597).

Golden-output comparison: stringify the frame to canonical records and
diff cell-by-cell against the expected records (typically read from a
golden CSV literal). Returns (ok, diffs) instead of the reference's
(bool, printable-table) — pytest-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from tada_spark.frame import Frame
from tada_spark.sources.records import write_records
from tada_spark.sources.structs import write_structs


def diff_records(got: list[list[str]], want: list[list[str]]) -> list[str]:
    """Cell-level differences, formatted '[row,col] got != want'."""
    diffs: list[str] = []
    if len(got) != len(want):
        diffs.append(f"row count: got {len(got)} != want {len(want)}")
    for i, (gr, wr) in enumerate(zip(got, want)):
        if len(gr) != len(wr):
            diffs.append(f"[{i}] width: got {len(gr)} != want {len(wr)}")
            continue
        for j, (g, w) in enumerate(zip(gr, wr)):
            if g != w:
                diffs.append(f"[{i},{j}] got {g!r} != want {w!r}")
    return diffs


def equal_records(
    frame: Frame,
    want: list[list[str]],
    *,
    include_labels: bool = True,
    sort_rows: bool = False,
) -> tuple[bool, list[str]]:
    """Compare a frame's stringified records against expected records.

    ``sort_rows`` compares order-insensitively (header row excluded) —
    the right default for distributed output unless the pipeline ends in
    an explicit sort.
    """
    got = write_records(frame, include_labels=include_labels)
    if sort_rows and got and want:
        got = [got[0]] + sorted(got[1:])
        want = [want[0]] + sorted(want[1:])
    diffs = diff_records(got, want)
    return (not diffs, diffs)


def equal_structs(frame: Frame, want: list[Any], *, sort_key: str | None = None) -> tuple[bool, list[str]]:
    """Compare typed rows against expected dataclass instances
    (reference EqualStructs io.go:575-597)."""
    if not want:
        n = frame.to_df().count()
        # a failure must carry a diff: (False, []) reads as a pass to
        # callers that check `if diffs:` and asserts print nothing
        return (n == 0, [] if n == 0 else [f"row count: got {n} != want 0"])
    cls = type(want[0])
    got = write_structs(frame, cls)
    if sort_key is not None:
        got = sorted(got, key=lambda x: getattr(x, sort_key))
        want = sorted(want, key=lambda x: getattr(x, sort_key))
    diffs = []
    if len(got) != len(want):
        diffs.append(f"row count: got {len(got)} != want {len(want)}")
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            diffs.append(f"[{i}] got {dataclasses.asdict(g)} != want {dataclasses.asdict(w)}")
    return (not diffs, diffs)
