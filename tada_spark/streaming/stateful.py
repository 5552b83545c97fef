"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.10); this is the
beyond-reference surface for operators Spark's built-in windows can't
express: arbitrary per-key state machines over unbounded streams.

running_totals keeps (count, sum) per key in the state store —
Arrow-batched per micro-batch, state bounded by key cardinality, and
eligible for ProcessingTimeTimeout eviction in a production config.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

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

RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_totals(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Works on a streaming DataFrame (update mode). Each batch emits the
    key's cumulative totals so far.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(pdf[value_col].count())
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({"key": [str(key[0])], "n_events": [n], "total": [round(s, 6)]})

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
