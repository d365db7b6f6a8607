"""Cache-lifetime control for operators that persist internal artifacts.

Several operators persist frames that feed multiple plan branches (the
IVF-PQ training artifacts, the PPJoin shingle base, the PageRank edge
frame).  A bare ``.persist()`` inside a function that returns a LAZY
plan has no safe release point — the blocks outlive the call and
accumulate over a long-lived session unless the caller knows to run
``spark.catalog.clearCache()`` (which also nukes unrelated caches).

Two contracts replace that:

- **Default (no scope)**: the operator materializes its (small) result
  with ``localCheckpoint(eager=True)`` and unpersists every internal
  artifact before returning.  Nothing bigger than the result survives
  the call; composing many searches accumulates only result-sized
  blocks, which the ContextCleaner reclaims when the frames go out of
  scope.
- **Caller-managed (``scope=CacheScope()``)**: the operator registers
  its persists with the scope and returns the fully LAZY plan (plan
  shape inspectable, filters composable, artifacts reusable across
  several downstream actions).  The caller releases everything with
  ``scope.release()`` — or a ``with CacheScope() as s:`` block —
  without touching unrelated caches.

A third pattern used across the operators — ``localCheckpoint
(eager=False)`` on a BOUNDED intermediate referenced by several plan
branches — trades fault tolerance for the scan cut: local checkpoints
truncate lineage, pin executor-local blocks (released only by the
ContextCleaner), and Spark documents non-eager local checkpointing as
unsafe under dynamic allocation (blocks lost with an executor are
unrecoverable).  That trade is deliberate here: every such site
checkpoints a table bounded by a vocabulary / group count / document
count (never the fact table), within a single caller action.  Cluster
deployments with dynamic allocation or strict fault-tolerance needs
should swap these sites to ``persist()`` + a ``CacheScope`` release, or
reliable ``checkpoint()`` — the semantics are identical; only recovery
and block lifetime differ.  (ADVICE r13: recorded once here rather than
at each of the ~30 call sites.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects the DataFrames an operator persists so the caller can
    release them deterministically (``release()`` / context-manager
    exit) instead of via the global ``spark.catalog.clearCache()``."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def add(self, df: DataFrame) -> DataFrame:
        self._frames.append(df)
        return df

    def release(self) -> None:
        """Unpersist every registered frame (blocking, so storage is
        verifiably freed when this returns) and forget them."""
        for df in self._frames:
            df.unpersist(blocking=True)
        self._frames.clear()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()
