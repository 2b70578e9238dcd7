"""Session-scoped persist slots.

Operators that ``persist()`` an intermediate frame across the life of
a query (minhash signatures, the fuzzy-rescue dimension) need their
footprint bounded in a long-lived session: the 80-query catalog and
bench loops invoke them repeatedly, and an unreleased persist per call
accumulates until session end.

Each (session, slot) pair holds at most ONE persisted DataFrame;
storing a new one releases the previous occupant. Entries are keyed by
SparkSession — after a session stop/restart the stale entry is dropped
WITHOUT calling into the dead JVM (``unpersist`` on a stopped context
raises), and entries of other live sessions are untouched.

Releasing a previous occupant that some caller still holds is safe:
its lineage is intact, so unpersist costs recomputation, never
correctness.

SAME-PLAN GUARD (found by the r7 structural plan test running after
the golden tests): Spark's CacheManager deduplicates cache entries by
CANONICALIZED PLAN, so when an operator is invoked twice on the same
input, the second call's ``persist()`` reuses the FIRST call's entry
("Asked to cache already cached data") — and releasing the previous
occupant would then unpersist the SHARED entry, silently un-caching
the new call (every consumer re-scans; a bench min-of-2 second pass
would run uncached). ``swap_persisted`` therefore skips the release
when the outgoing and incoming occupants have the same canonical
plan — the slot contract (one cached frame per slot) is preserved
either way, since they ARE the same cache entry.
"""

from __future__ import annotations

import atexit
import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_SLOTS: dict[tuple[int, str], DataFrame] = {}


def _purge_all() -> None:
    """Interpreter-exit sweep: unpersist slot occupants whose session
    is STILL LIVE (an embedding host that outlives its last Spark
    query gets its executor cache back before teardown) and drop every
    reference. Deliberately modest — it cannot help a process that
    stopped its session mid-lifetime and never swaps again; those
    entries are plain dead Python objects until the next
    swap_persisted call purges them (or exit)."""
    with _LOCK:
        entries = list(_SLOTS.values())
        _SLOTS.clear()
    for df in entries:
        _release(df)


atexit.register(_purge_all)


def _alive(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext._jsc is not None
    except Exception:
        return False


def _release(df: DataFrame) -> None:
    try:
        if _alive(df):
            df.unpersist()
    except Exception:
        # a session stopping between the liveness check and the
        # unpersist loses nothing but already-freed cached blocks
        pass


def swap_persisted(slot: str, df: DataFrame) -> DataFrame:
    """Store `df` (already persisted by the caller) in `slot` for its
    session, releasing the slot's previous occupant and purging
    entries whose sessions have stopped. Returns `df`."""
    key = (id(df.sparkSession), slot)
    with _LOCK:
        prev = _SLOTS.pop(key, None)
        dead = [k for k, v in _SLOTS.items() if not _alive(v)]
        for k in dead:
            _SLOTS.pop(k, None)
        _SLOTS[key] = df
    if prev is not None and not _same_cache_entry(prev, df):
        _release(prev)
    return df


def _same_cache_entry(prev: DataFrame, new: DataFrame) -> bool:
    """True when both frames resolve to the same CacheManager entry
    (canonicalized-plan equality) — releasing one would un-cache the
    other."""
    try:
        return bool(prev._jdf.queryExecution().analyzed().sameResult(
            new._jdf.queryExecution().analyzed()))
    except Exception:
        return False
