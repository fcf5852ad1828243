"""Tracked persists: library operators that cache an intermediate register
it here so callers (bench loops, the driver's per-query correctness gate,
long-lived pipelines) can release executor storage between queries instead
of pinning it for the application lifetime.

Usage: operators call ``tracked_persist(df)`` instead of ``df.persist()``;
a harness calls ``release_tracked()`` after its consuming action. Releasing
is always safe — an unpersisted DataFrame just recomputes on next use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []

# Soft cap (ADVICE r7): a caller that never invokes release_tracked()
# must not accumulate pinned storage and an unbounded list across
# repeated operator calls. On overflow the OLDEST tracked frame is
# unpersisted and dropped — always safe (it just recomputes on reuse),
# and 64 live persists is far beyond any single query's needs.
_TRACKED_CAP = 64


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    df.persist(level)
    _TRACKED.append(df)
    while len(_TRACKED) > _TRACKED_CAP:
        old = _TRACKED.pop(0)
        try:
            old.unpersist(False)
        except Exception:
            pass
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns the count."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:  # session already stopped: nothing to release
            pass
    return n
