"""Tracked persist for multi-consumer intermediates.

Several operators persist() a shared sub-stream (the MinHash bucket
table, the verified-neardup token arrays, the curation quality gate, the
BM25 tf vocabulary, the SimHash fingerprints) because Spark materializes
no shared subplans — without the cache each consumer re-runs the full
tokenize/aggregate pipeline. But a bare persist() in a long-lived
session is a leak: every invocation pins a fresh MEMORY_AND_DISK entry
and disk blocks are not LRU-reclaimed.

`persist_tracked` registers every such handle; a session owner calls
`release_caches()` between pipelines (bench.py does, per query) to
unpersist them all. Releasing is always correctness-safe — an
unpersisted DataFrame that hasn't been fully consumed simply recomputes
from lineage — it only trades away the reuse speedup, which is spent by
the time a pipeline finishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist(level) + register the handle for release_caches()."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def live_count() -> int:
    return len(_LIVE)


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    _LIVE.clear()
    return n
