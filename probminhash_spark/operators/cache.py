"""Cache lifecycle for operator-internal persists (round-3 verdict wrong #4).

Several operators persist an intermediate frame because it feeds multiple
subtrees of the RETURNED lazy DataFrame (signatures feed banding + both
estimate sides; gram/token tables feed buckets, sizes and both intersection
joins).  The persist must therefore outlive the operator call — it is only
safe to release after the *consumer* has executed the returned plan.  That
caller-managed contract previously leaked: four operators x repeated sweeps
accumulated executor storage until ``spark.catalog.clearCache()``.

This module makes the lifetime explicit:

- :func:`pin` — operators route every internal ``persist()`` through it.
- :func:`cache_scope` — consumers wrap "build + execute" in a scope; on exit
  every frame pinned inside is unpersisted, so repeated sweeps hold no
  residual cached relations.  Scopes nest (inner pins release at inner
  exit) and are thread-local (parallel jobs don't release each other's
  pins).
- Outside any scope, :func:`pin` falls back to the documented caller-managed
  contract (persist + release via ``spark.catalog.clearCache()`` or the
  returned frame's ``unpersist()``), so ad-hoc exploration keeps working.

Example::

    with cache_scope():
        edges = dedup_edges(docs, cfg)
        edges.write.parquet(out)        # executes while pins are live
    # <- signature cache released here
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _scopes() -> list[list[DataFrame]]:
    if not hasattr(_LOCAL, "scopes"):
        _LOCAL.scopes = []
    return _LOCAL.scopes


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it with the innermost active
    :func:`cache_scope` (if any) for release at scope exit."""
    df = df.persist()
    scopes = _scopes()
    if scopes:
        scopes[-1].append(df)
    return df


class _CheckpointHandle:
    """Scope-release adapter for a localCheckpointed frame: its storage is a
    directly-persisted RDD (LogicalRDD), invisible to ``DataFrame.unpersist``
    (which goes through the SQL CacheManager), so release must unpersist the
    plan's RDD itself."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self) -> None:
        release_local_checkpoint(self._df)


def release_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's block storage NOW.  Only safe once nothing
    will re-execute a plan referencing it: the checkpoint truncated the
    lineage, so the blocks cannot be recomputed."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:  # session stopped / non-classic plan — nothing to free
        pass


def pin_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint()`` (eager) + register the checkpoint's storage
    with the innermost active :func:`cache_scope` for release at scope exit
    — the checkpoint analogue of :func:`pin`, needed because iterative
    operators (connected components) checkpoint per round and the blocks
    otherwise linger until the ContextCleaner happens to GC them."""
    ck = df.localCheckpoint()
    scopes = _scopes()
    if scopes:
        scopes[-1].append(_CheckpointHandle(ck))
    return ck


@contextmanager
def cache_scope():
    """Release every operator-internal persist pinned inside the block once
    the block's consumers are done executing."""
    frames: list[DataFrame] = []
    _scopes().append(frames)
    try:
        yield frames
    finally:
        _scopes().pop()
        for f in frames:
            try:
                f.unpersist()
            except Exception:  # session already stopped — nothing to release
                pass
