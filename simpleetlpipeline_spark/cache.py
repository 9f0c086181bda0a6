"""Session-scoped cache governance.

Several catalog operators persist intermediate DataFrames whose
lifetime outlives the function that created them (the MinHash-LSH
pair graph has three catalog consumers; connected-components labels
back the cluster aggregation that consumes them lazily). Spark has
no scope that ties a persist() to "all downstream consumers done",
so without an owner those caches pin executor storage for the life
of the session — harmless in a short test run, memory pressure with
no release valve on a long-lived 100 TB cluster session.

This registry is that owner: operators `track()` every DataFrame
they persist, and the session teardown (bench.py end-of-run, pytest
session fixture, or any long-lived service's maintenance tick) calls
`release_caches()` to unpersist everything in one sweep. Tracking is
idempotent per DataFrame and release is safe to call at any point —
a released cache just recomputes on next use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for end-of-run release.

    Returns the DataFrame unchanged so call sites can wrap a
    `.persist()` expression inline: ``track(df.persist())``.
    """
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many released.

    blocking=False: eviction is async cleanup, not a correctness
    barrier — no reason to stall the caller on executor round-trips.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n
