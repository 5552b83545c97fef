"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.10); this is the
beyond-reference surface for operators Spark's built-in windows can't
express: arbitrary per-key state machines over unbounded streams.

running_totals keeps (count, sum) per key in the state store —
Arrow-batched per micro-batch, state bounded by key cardinality, and
eligible for ProcessingTimeTimeout eviction in a production config.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total", DoubleType()),
    ]
)

#: (count, e6-quantized micro-unit sum) — INTEGER accumulation so the
#: running total is exactly associative: raw double += in chunk-arrival
#: order could land an ulp from the oracle's differently-ordered SUM
#: and flip the output quantization on a .5e-6 boundary.
RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("s_e6", LongType())]
)


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
        StructField("span_seconds", LongType()),
    ]
)

#: (first_us, last_us, n_sessions, n_events)
SESSION_STATE = StructType(
    [
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def merge_session_batch(
    state: tuple[int | None, int | None, int, int], us_sorted, gap_us: int
) -> tuple[int, int, int, int]:
    """Fold one sorted epoch-us batch into (first_us, last_us,
    n_sessions, n_events) session state. Pure — unit-testable without a
    state store; micro-batch order is the event-time order guarantee the
    caller provides (availableNow over a static table = one batch)."""
    first_us, last_us, n_sessions, n_events = state
    if len(us_sorted) == 0:
        return state
    if first_us is None:
        first_us = int(us_sorted[0])
    gaps = us_sorted[1:] - us_sorted[:-1]
    n_sessions += int((gaps >= gap_us).sum())
    # boundary with the previous batch (or stream start)
    if last_us is None or us_sorted[0] - last_us >= gap_us:
        n_sessions += 1
    return first_us, int(us_sorted[-1]), n_sessions, n_events + len(us_sorted)


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, *, gap_s: int = 1800
) -> DataFrame:
    """Per-key event-time session statistics across micro-batches: a new
    session starts when the gap to the previous event is >= gap_s
    (same rule as the batch sessionize query). Emits per key the
    cumulative (n_events, n_sessions, span_seconds).

    Unlike running_totals — whose output ignores event time and so
    stayed green through round 2's corrupted-timestamp ingest — every
    output column here DEPENDS on the actual ts values, which makes
    this query a streaming-ingest canary as well as an operator.

    State is 4 longs per key regardless of history length; epoch math
    is done in microseconds after an explicit datetime64[us] cast so
    the pandas arrow unit (ns vs us) can't skew it.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = state.get if state.exists else (None, None, 0, 0)
        # one key's micro-batch rows can arrive as SEVERAL Arrow chunks
        # (maxRecordsPerBatch splits, multiple upstream mappers) with no
        # cross-chunk ordering — merging chunk-by-chunk would treat an
        # earlier-timestamped later chunk as a session continuation and
        # move last_us backwards. Gather the whole invocation, sort
        # once, merge once.
        parts = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            s = pdf[ts_col]
            # LTZ input arrives tz-aware in some Arrow paths; normalize
            # to UTC wall clock so epoch math is family-independent
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            parts.append(s.astype("datetime64[us]").astype("int64").to_numpy())
        if parts:
            us = np.sort(np.concatenate(parts))
            st = merge_session_batch(st, us, gap_s * 1_000_000)
        first_us, last_us, n_sessions, n_events = st
        state.update(st)
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
                "span_seconds": [(last_us - first_us) // 1_000_000],
            }
        )

    # NULL keys/timestamps don't degrade, they CRASH or corrupt the
    # stream (int(None) on the key kills the query; NaT→int64 is the
    # MIN int, wrapping the gap arithmetic and exploding span_seconds)
    # — filter them like the ewma twin, and the oracle mirrors
    grouped = (
        df.filter(df[key_col].isNotNull() & df[ts_col].isNotNull())
        .select(df[key_col].cast("long").alias("user_id"), df[ts_col].alias(ts_col))
        .groupBy("user_id")
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Works on a streaming DataFrame (update mode). Each batch emits the
    key's cumulative totals so far.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s_e6 = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            vals = pdf[value_col][pdf[value_col].notna()].to_numpy()
            n += int(vals.size)
            # e6-quantize EACH value (floor half-up), then integer-sum:
            # exact for money-scale inputs, associative for any — the
            # oracle mirrors with SUM(CAST(FLOOR(v*1e6+0.5) AS BIGINT))
            s_e6 += int(np.floor(vals * 1e6 + 0.5).astype("int64").sum())
        state.update((n, s_e6))
        yield pd.DataFrame(
            {"key": [str(key[0])], "n_events": [n], "total": [s_e6 / 1e6]}
        )

    grouped = df.select(
        df[key_col].cast("string").alias("key"), df[value_col].alias(value_col)
    ).groupBy("key")
    return grouped.applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_e6", LongType()),
    ]
)

#: (s — the current quantized EWMA value, n — events folded so far)
EWMA_STATE = StructType([StructField("s", DoubleType()), StructField("n", LongType())])


def fold_ewma(
    state: tuple[float | None, int], values, *, alpha: float = 0.25
) -> tuple[float | None, int]:
    """Fold one event-time-ordered value batch into EWMA state with the
    QUANTIZED recurrence s ← floor((α·x + (1−α)·s)·1e6 + 0.5)/1e6 —
    every intermediate lands on an e6 grid point, so the sequential
    recurrence is bit-replayable by a SQL recursive CTE (the usual
    float-EWMA is order-exact but accumulates engine-divergent ulps).
    α defaults to 0.25: exactly representable, so α·x and (1−α)·s are
    single correctly-rounded IEEE ops. Pure — unit-testable without a
    state store."""
    s, n = state
    for v in values:
        x = float(v)
        if s is None:
            s = math.floor(x * 1e6 + 0.5) / 1e6
        else:
            s = math.floor((alpha * x + (1.0 - alpha) * s) * 1e6 + 0.5) / 1e6
        n += 1
    return s, n


def ewma_scores(
    df: DataFrame, key_col: str, value_col: str, ts_col: str, seq_col: str, *, alpha: float = 0.25
) -> DataFrame:
    """Per-key event-time-ordered exponentially weighted moving average
    across micro-batches (update mode): the streaming anomaly-score
    primitive built-in windows can't express (EWMA is a sequential
    recurrence, not an associative aggregate). Arrow chunks within one
    invocation carry no cross-chunk order — gather, sort once by
    (ts, seq), fold once (same discipline as session_stats). State is
    two scalars per key regardless of history."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s, n = state.get if state.exists else (None, 0)
        parts = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            t = pdf[ts_col]
            if getattr(t.dtype, "tz", None) is not None:
                t = t.dt.tz_convert("UTC").dt.tz_localize(None)
            parts.append(
                pd.DataFrame(
                    {
                        # keep datetime64, NOT int64: NaT→int64 is the
                        # MIN int, which would sort NULL ts FIRST while
                        # the batch twin (ewma_by_key) and the shared
                        # recursive-CTE oracle (DuckDB NULLS LAST) fold
                        # them LAST — na_position below keeps the three
                        # implementations in lockstep
                        "ts": t.astype("datetime64[us]").to_numpy(),
                        "seq": pdf[seq_col].to_numpy(),
                        "v": pdf[value_col].to_numpy(),
                    }
                )
            )
        if parts:
            allp = pd.concat(parts).sort_values(
                ["ts", "seq"], kind="mergesort", na_position="last"
            )
            s, n = fold_ewma((s, n), allp["v"].tolist(), alpha=alpha)
        state.update((s, n))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "ewma_e6": [None if s is None else int(math.floor(s * 1e6 + 0.5))],
            }
        )

    # drop NULL keys/values HERE, like the batch twin (ewma_by_key)
    # does — unfiltered they don't degrade, they CRASH the stream
    # (NaN reaches math.floor; int(None) on the key), so the lockstep
    # contract must hold for any caller, not just pre-filtered ones
    grouped = (
        df.filter(df[key_col].isNotNull() & df[value_col].isNotNull())
        .select(
            df[key_col].cast("long").alias("user_id"),
            df[value_col].alias(value_col),
            df[ts_col].alias(ts_col),
            df[seq_col].alias(seq_col),
        )
        .groupBy("user_id")
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATTERN_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_then", LongType()),
        StructField("n_matched", LongType()),
    ]
)

PATTERN_STATE = StructType(
    [
        StructField("last_first_us", LongType()),
        StructField("n_then", LongType()),
        StructField("n_matched", LongType()),
    ]
)


def merge_pattern_batch(st, ts_us, types, first, then, within_us):
    """Pure per-key fold for pattern_within — exact replay of one
    sorted event run against carried state, unit-testable without
    Spark. Returns (last_first_us, n_then, n_matched)."""
    last_first, n_then, n_matched = st
    for t, ty in zip(ts_us, types):
        if ty == then:
            n_then += 1
            if last_first is not None and 0 <= t - last_first <= within_us:
                n_matched += 1
        if ty == first:
            last_first = int(t)
    return last_first, n_then, n_matched


def pattern_within(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    *,
    first: str,
    then: str,
    within_s: int = 1800,
) -> DataFrame:
    """Streaming A-then-B pattern detection per key: count ``then``
    events that occur within ``within_s`` seconds AFTER the latest
    preceding ``first`` event — the conversion-attribution state
    machine (click → purchase) as 3 longs of per-key state, regardless
    of history length.

    Each invocation's rows are gathered, sorted by event time, and
    folded once (the session_stats chunk-merge discipline); state
    carries (last_first_us, n_then, n_matched) across micro-batches.
    Cross-batch exactness holds when batch boundaries respect event
    order (availableNow over one file delivers one batch — the same
    pinned replay contract as the other stateful entries)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = state.get if state.exists else (None, 0, 0)
        parts = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            s = pdf[ts_col]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            us = s.astype("datetime64[us]").astype("int64").to_numpy()
            parts.append(
                pd.DataFrame({"us": us, "ty": pdf[type_col].to_numpy()})
            )
        if parts:
            allp = pd.concat(parts)
            # tie pin: at equal event time a `first` processes BEFORE a
            # `then` (a same-instant click converts its purchase) —
            # mirrored by the oracle's (us, is_then) ordering
            allp["__o__"] = (allp["ty"] == then).astype("int64")
            allp = allp.sort_values(["us", "__o__"], kind="mergesort")
            st = merge_pattern_batch(
                st, allp["us"].to_numpy(), allp["ty"].to_numpy(), first, then,
                within_s * 1_000_000,
            )
        state.update(st)
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_then": [st[1]],
                "n_matched": [st[2]],
            }
        )

    # the oracle (STREAM_PATTERN_SQL) filters NULL keys AND timestamps;
    # unfiltered they crash (int(None)) or corrupt (NaT→MIN-int sorts
    # first and a NaT first/then pair self-matches) — keep lockstep
    grouped = (
        df.filter(df[key_col].isNotNull() & df[ts_col].isNotNull())
        .select(
            df[key_col].cast("long").alias("user_id"),
            df[ts_col].alias(ts_col),
            df[type_col].alias(type_col),
        )
        .groupBy("user_id")
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=PATTERN_OUTPUT,
        stateStructType=PATTERN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
