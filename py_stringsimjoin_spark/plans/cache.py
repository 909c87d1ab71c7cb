"""Engine-owned cache registry.

Join/filter plans persist() intermediates (token orderings, ranked-token
tables) that pay for themselves within one plan but would otherwise
accumulate in long-lived sessions. Every engine persist goes through
``persist_tracked`` so callers can release exactly the engine's caches with
``release_engine_caches()`` — without evicting caches the caller owns (the
blunt ``spark.catalog.clearCache()`` workaround).

The registry holds strong references: JVM cached blocks outlive the Python
DataFrame wrapper, so the registry must too. Two release granularities:

* ``engine_cache_scope()`` — context manager that releases ONLY the caches
  created inside the ``with`` block. This is the right tool for pipeline
  stages and library code: a global release would unpersist orderings /
  ranked tables backing OTHER engine DataFrames the caller constructed but
  has not materialized yet, forcing full recomputation (and, before the
  token-ordering checkpoint fix, opening a rank-corruption window).
* ``release_engine_caches()`` — global release of everything the engine ever
  persisted in this process. For ad-hoc sessions when all joins are done.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_ENGINE_CACHES: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """Register an already-persisted plan intermediate for later release.

    Used as ``df.persist().transform(tracked_cache)`` inside operators."""
    _ENGINE_CACHES.append(df)
    return df


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a plan intermediate and register it for later release."""
    return tracked_cache(df.persist())


def _release(dfs: list[DataFrame]) -> int:
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


@contextmanager
def engine_cache_scope():
    """Release only the engine caches created inside this scope.

    Scoping is by identity, not list position (advisor finding): the set of
    registry entries present at entry is snapshotted, and on exit only
    entries NOT in that snapshot are released — so caches registered by
    concurrent threads before the scope opened, and outer plans' persisted
    intermediates, are untouched even if this thread's registrations
    interleave with other threads'. (A cache another thread registers while
    the scope is open is still swept — callers running fully concurrent
    engine plans should give each its own scope or none.) Yields a callable
    returning how many new caches have accumulated since entry
    (diagnostics)."""
    # hold STRONG references alongside the id set: if a pre-existing entry
    # were released and garbage-collected while the scope is open, CPython
    # could recycle its address for a brand-new cache, whose id would then
    # falsely test as "pre-existing" and escape the sweep. Keeping the
    # snapshot objects alive pins their ids for the scope's lifetime.
    before_refs = list(_ENGINE_CACHES)
    before = {id(df) for df in before_refs}
    try:
        yield lambda: sum(1 for df in _ENGINE_CACHES if id(df) not in before)
    finally:
        scoped = [df for df in _ENGINE_CACHES if id(df) not in before]
        _ENGINE_CACHES[:] = [df for df in _ENGINE_CACHES if id(df) in before]
        _release(scoped)
        del before_refs


def release_engine_caches() -> int:
    """Unpersist every engine-created cache; returns how many."""
    dfs = list(_ENGINE_CACHES)
    _ENGINE_CACHES.clear()
    return _release(dfs)
