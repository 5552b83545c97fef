"""Session cache ownership for operators that persist bounded intermediates.

Some operators (mmr_rerank, naive_bayes_scores) persist small-by-
construction intermediate tables because their returned LAZY plan
references those tables many times — uncached, the plan re-derives
them per reference and goes superlinear (mmr_rerank: 144 exchanges
uncached vs 17 cached at k=4). The returned frame must stay lazily
re-computable (the driver materializes it later), so the operator
cannot unpersist before returning.

The contract, instead of a silent session-lifetime leak (r10 ADVICE):

* every such persist goes through :func:`owned_persist`, which
  registers the frame in a module-level ledger;
* a long-lived session that calls these operators repeatedly calls
  :func:`release` between corpora/batches. Releasing is ALWAYS safe —
  an unpersisted plan recomputes from source, it never errors — it
  only trades cache hits for recompute on frames still in flight;
* :func:`live_count` exposes the ledger size so tests (and operators
  run in a loop) can assert the cache registry is not growing.

``spark.catalog.clearCache()`` remains the blunt alternative; the
ledger exists so callers can release ONLY operator-owned caches
without nuking tables they cached themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def owned_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and record it in the operator-cache ledger."""
    if storage_level is None:
        from pyspark import StorageLevel

        storage_level = StorageLevel.MEMORY_AND_DISK
    df = df.persist(storage_level)
    _LIVE.append(df)
    return df


def release(blocking: bool = False) -> int:
    """Unpersist every ledgered frame; returns how many were released.

    Safe at any time: frames not yet (or no longer) materialized just
    recompute on next use. Frames whose SparkSession has already been
    stopped are skipped silently.
    """
    n = 0
    for df in _LIVE:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # stopped session / dead JVM handle: nothing to free
    _LIVE.clear()
    return n


def live_count() -> int:
    """Number of operator-owned frames currently ledgered as cached."""
    return len(_LIVE)
