"""Session cache hygiene for persisted intermediates.

``prepare_sides`` / ``minhash_lsh_dedup`` persist token-rank and
prepared-side DataFrames because they are consumed by several stages
of one join. The returned join result is lazy, so the library cannot
know when the caller is done with it — in a long-lived session
running many joins the persisted frames would otherwise accumulate
executor storage indefinitely.

Every internal ``persist`` therefore goes through :func:`track`, and
callers release them with :func:`release_all` — or, preferably, scope
a block of work with :func:`scoped_caches`, which releases only the
caches tracked inside the block.

Release timing: releasing AFTER the DataFrames that consumed a
tracked frame have been materialized (collected / written) is safe —
downstream recompute just redoes work. Releasing while a join result
that references a tracked frame is still LAZY forces each plan branch
to recompute it independently; since the round-3 determinism fixes
(data-derived ``__gid`` = min member id, data-derived ``tid`` dense
rank in build_token_ranks) the recomputed values are identical, so
this costs time, not correctness — but prefer :func:`scoped_caches`
so one caller cannot drop caches belonging to unrelated in-flight
joins in the same session.
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
    released. Downstream plans recompute (deterministically — see
    module docstring), but this drops caches session-wide including
    ones belonging to other in-flight work; prefer scoped_caches."""
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
