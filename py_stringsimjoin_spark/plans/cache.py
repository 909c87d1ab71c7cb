"""Engine-owned cache registry.

Join/filter plans persist() intermediates (token orderings, ranked-token
tables) that pay for themselves within one plan but would otherwise
accumulate in long-lived sessions. Every engine persist goes through
``persist_tracked`` so callers can release exactly the engine's caches with
``release_engine_caches()`` — without evicting caches the caller owns (the
blunt ``spark.catalog.clearCache()`` workaround).

The registry holds strong references: JVM cached blocks outlive the Python
DataFrame wrapper, so the registry must too. It is bounded by an explicit
``release_engine_caches()`` call — pipelines call it between stages; ad-hoc
sessions can call it whenever joins are done.
"""

from __future__ import annotations

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


def release_engine_caches() -> int:
    """Unpersist every engine-created cache; returns how many."""
    n = 0
    for df in _ENGINE_CACHES:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _ENGINE_CACHES.clear()
    return n
