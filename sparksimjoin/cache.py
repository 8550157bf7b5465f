"""Session cache hygiene for persisted intermediates.

``prepare_sides`` / ``minhash_lsh_dedup`` persist token-rank and
prepared-side DataFrames because they are consumed by several stages
of one join. The returned join result is lazy, so the library cannot
know when the caller is done with it — in a long-lived session
running many joins the persisted frames would otherwise accumulate
executor storage indefinitely.

Every internal ``persist`` therefore goes through :func:`track`, and
callers (bench, the pipeline between stages, user sessions between
joins) release them with :func:`release_all` — or scope a block of
work with :func:`scoped_caches`, which releases on exit. Releasing is
always safe: an unpersisted DataFrame silently recomputes.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# strong refs on purpose: the JVM-side cache outlives the Python
# DataFrame wrapper (the join result's plan references JVM plans), so
# a weak registry would lose the handle needed to unpersist
_TRACKED: list[DataFrame] = []


def track(df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` at ``level`` and register it for bulk release."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many were
    released. Safe at any point — downstream plans recompute."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    return n


@contextmanager
def scoped_caches():
    """Release every cache *tracked inside the block* on exit (caches
    tracked before entry are left alone)."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        while len(_TRACKED) > mark:
            df = _TRACKED.pop()
            try:
                df.unpersist()
            except Exception:
                pass
