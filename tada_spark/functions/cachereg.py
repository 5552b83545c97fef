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
* a caller that wants PER-CALL ownership wraps the operator call in
  :func:`scope` — exiting the scope unpersists ONLY the frames that
  operator call persisted, so a release between batches can no longer
  guillotine caches belonging to another operator's still-unmaterialized
  plan (r11 ADVICE: module-level release() between batches silently
  reintroduced the superlinear uncached mmr shape for concurrent
  callers);
* a long-lived session that never scoped calls :func:`release` as the
  catch-all. Releasing is ALWAYS safe — an unpersisted plan recomputes
  from source, it never errors — it only trades cache hits for
  recompute on frames still in flight;
* :func:`live_count` exposes the ledger size so tests (and operators
  run in a loop) can assert the cache registry is not growing.

All ledger mutation happens under one lock: owned_persist from a worker
thread racing release() on the main thread must never lose or
double-release an entry. (The lock guards the LEDGER only; the
underlying persist/unpersist JVM calls are already thread-safe.)

``spark.catalog.clearCache()`` remains the blunt alternative; the
ledger exists so callers can release ONLY operator-owned caches
without nuking tables they cached themselves.
"""

from __future__ import annotations

import itertools
import threading

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
#: token -> persisted frame. Insertion-ordered (dict), so release()
#: frees oldest-first — irrelevant for correctness, nice for logs.
_LIVE: dict[int, DataFrame] = {}
_TOKENS = itertools.count()
#: Per-thread stack of active scopes; each scope is a list of tokens
#: persisted while it was the innermost scope on ITS OWN thread.
#: Scopes are thread-local by design: a scope must not adopt frames
#: persisted by unrelated threads that happen to overlap in time.
_SCOPES = threading.local()


def owned_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and record it in the operator-cache ledger.

    If the calling thread is inside a :func:`scope`, the entry is also
    charged to that scope (innermost wins), so the scope's exit frees
    it without touching other callers' caches.
    """
    if storage_level is None:
        from pyspark import StorageLevel

        storage_level = StorageLevel.MEMORY_AND_DISK
    df = df.persist(storage_level)
    with _LOCK:
        token = next(_TOKENS)
        _LIVE[token] = df
        stack = getattr(_SCOPES, "stack", None)
        if stack:
            stack[-1].append(token)
    return df


class CacheScope:
    """Context manager owning the frames persisted inside it (this
    thread only). Exit unpersists exactly those frames — ledger entries
    belonging to other operator calls are untouched. Reentrant-safe:
    nested scopes each own only their own persists."""

    def __init__(self) -> None:
        self._tokens: list[int] = []

    def __enter__(self) -> "CacheScope":
        stack = getattr(_SCOPES, "stack", None)
        if stack is None:
            stack = _SCOPES.stack = []
        stack.append(self._tokens)
        return self

    def __exit__(self, *exc) -> None:
        _SCOPES.stack.pop()
        self.release()

    def release(self, blocking: bool = False) -> int:
        """Unpersist only this scope's frames; returns how many."""
        with _LOCK:
            frames = [_LIVE.pop(t) for t in self._tokens if t in _LIVE]
            self._tokens.clear()
        return _release_frames(frames, blocking)


def scope() -> CacheScope:
    """Per-operator-call cache ownership::

        with cachereg.scope():
            out = mmr_rerank(...)
            out.write...          # materialize INSIDE the scope
        # caches from this call (and only this call) are now released
    """
    return CacheScope()


def _release_frames(frames: list[DataFrame], blocking: bool) -> int:
    n = 0
    for df in frames:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # stopped session / dead JVM handle: nothing to free
    return n


def release(blocking: bool = False) -> int:
    """Unpersist EVERY ledgered frame (the catch-all); returns how many
    were released.

    Safe at any time: frames not yet (or no longer) materialized just
    recompute on next use — but in a concurrent session prefer
    :func:`scope`, which cannot evict another call's live cache.
    """
    with _LOCK:
        frames = list(_LIVE.values())
        _LIVE.clear()
    return _release_frames(frames, blocking)


def live_count() -> int:
    """Number of operator-owned frames currently ledgered as cached."""
    with _LOCK:
        return len(_LIVE)
