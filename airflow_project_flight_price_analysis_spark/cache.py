"""Per-invocation persist tracking (ADVICE r4, `curation.py` persists).

Several registered queries ``persist()`` an intermediate that has
multiple consumers inside ONE query plan (shared shingle grams, a
contingency table with four marginal readers, ...). The cache pays for
itself within that single invocation — but a registered query returns an
*unmaterialized* DataFrame, so the query function itself can never
``unpersist()`` at the right moment: the harness materializes the result
after the function returns.

``bench.py`` calls ``spark.catalog.clearCache()`` between queries, but
the driver's 133-query correctness sweep (and any external caller) does
not — CacheManager entries are not reclaimable by the ContextCleaner
while registered, so cached blocks would otherwise accumulate across the
whole sweep, the same cross-query state inflation the bench GC note
fights.

The fix is engine-side so every harness gets it: persists route through
:func:`track_persist`, and building the NEXT registered query first
releases every block the PREVIOUS invocation registered (see the
``plans.__init__._with_cache_rotation`` wrapping in ``all_queries``). By the time a harness asks for
query N+1, query N's result has been materialized — its cache has served
its purpose. If a caller interleaves builds and collects instead,
``unpersist`` degrades gracefully: the released subplan recomputes per
consumer; results are unchanged.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """``df.persist(level)``, registered for release at the next query build.

    Chainable as ``df.transform(track_persist)``. ``level=None`` keeps
    PySpark's own ``persist()`` default (MEMORY_AND_DISK_DESER).
    """
    df = df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def release_prior_persists() -> None:
    """Unpersist every DataFrame registered by earlier query invocations."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — a dead SparkContext must not mask the query
            pass
