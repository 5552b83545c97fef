"""Structured Streaming extensions."""

from tada_spark.streaming.windows import (
    run_available_now,
    stream_to_parquet,
    stream_interval_join,
    stream_resample,
    stream_session_agg,
    stream_sliding_agg,
)

__all__ = [
    "run_available_now",
    "stream_to_parquet",
    "stream_interval_join",
    "stream_resample",
    "stream_session_agg",
    "stream_sliding_agg",
]
