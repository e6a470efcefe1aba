"""Lifecycle management for ``localCheckpoint`` DataFrames in iterative
operators.

Iterative operators (connected components, PageRank, label propagation)
sever their per-round plans with ``localCheckpoint`` so plan trees don't
grow exponentially. Spark pins each checkpoint's blocks in the
MEMORY_AND_DISK store until the RDD is explicitly unpersisted — nothing
does that automatically, so a 10-round loop retains 10 superseded label
tables (plus the contracted edge lists) for the life of the session. In a
bench harness that runs 90+ queries back to back this accumulates into
later queries' memory budget and shows up as run-position-dependent GC
pressure (observed: resolve_clusters 26 s solo → 44 s mid-sequence in
BENCH_r04).

The fix is bookkeeping: a :class:`CheckpointTracker` that records each
round's checkpointed DataFrames and unpersists them once they can no
longer be referenced.

Accepted pinned-RDD budget: operators whose RETURNED plan references an
eager checkpoint (``knn_graph``, ``select_token_budget``,
``curriculum_order``) cannot release it before the caller consumes the
result — each such call leaves 1-2 RDDs pinned until the consumer
releases them. Both harnesses do: ``bench.py`` and
``tools/check_oracle.py`` unpersist every persistent RDD after
consuming each query's result. Library callers embedding these
operators in a long-lived session should do the same
(:func:`persistent_rdd_ids` + :func:`release_new_checkpoints`, or a
blanket ``getPersistentRDDs`` sweep once results are materialized). The safety rule for the one-job-per-round pattern
used here (a LAZY checkpoint's plan may reference the previous rounds'
checkpoints and only materializes during the NEXT round's action) is a
**lag of two rounds**: artifacts created in round *i* are released after
round *i+2*'s action, by which point every plan that references them has
materialized. On exit, everything except the returned table is released
(a never-materialized trailing lazy checkpoint unpersists as a no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "checkpoint_rdd",
    "unpersist_checkpoint",
    "CheckpointTracker",
    "persistent_rdd_ids",
    "release_new_checkpoints",
]


def checkpoint_rdd(df: DataFrame):
    """Return the JVM RDD backing a ``localCheckpoint``-ed DataFrame.

    A checkpointed DataFrame's analyzed plan is a ``LogicalRDD`` wrapping
    the persisted ``RDD[InternalRow]`` — that RDD is what holds the
    storage blocks. Returns ``None`` when the plan isn't a LogicalRDD
    (i.e. the df was never checkpointed) or on any py4j hiccup; callers
    treat that as "nothing to release".
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return plan.rdd()
    except Exception:
        return None
    return None


def unpersist_checkpoint(df: DataFrame) -> bool:
    """Release the storage blocks of a checkpointed DataFrame (non-blocking).

    Safe to call on a lazy checkpoint that never materialized (no blocks
    → no-op) and on non-checkpointed DataFrames (returns False). NEVER
    call on a checkpoint that downstream un-materialized plans or the
    operator's return value still reference: a localCheckpoint's lineage
    is truncated, so its blocks cannot be recomputed once dropped.
    """
    rdd = checkpoint_rdd(df)
    if rdd is None:
        return False
    try:
        rdd.unpersist(False)
        return True
    except Exception:
        return False


def referenced_checkpoint_ids(df: DataFrame) -> set[int]:
    """IDs of every checkpoint RDD a DataFrame's plan references — the
    LogicalRDD *leaves* of its analyzed plan (a result built ON TOP of a
    checkpoint, e.g. a window over the final labels table, is not itself a
    LogicalRDD but still needs its blocks)."""
    ids: set[int] = set()
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                ids.add(int(leaf.rdd().id()))
    except Exception:
        pass
    return ids


def persistent_rdd_ids(spark) -> set[int]:
    """IDs of every currently persisted RDD in the session (checkpoint
    blocks AND CacheManager-backed caches — use only for before/after
    diffs, never to enumerate release candidates directly)."""
    ids: set[int] = set()
    try:
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            ids.add(int(it.next().getKey()))
    except Exception:
        pass
    return ids


def release_new_checkpoints(spark, before_ids: set[int], keep: DataFrame | None = None) -> int:
    """Release every RDD persisted since ``before_ids`` was snapshotted,
    except the one backing ``keep``.

    For composed operator pipelines (e.g. minhash pairs → connected
    components) whose intermediate eager checkpoints are severed from the
    final result by a downstream checkpoint: after the pipeline's result
    materializes, everything persisted inside the call scope except the
    result itself is dead weight. Only safe when the scope is
    single-threaded (no concurrent operator persisting RDDs between the
    snapshot and the release) — bench/driver query functions qualify.
    Returns the number of RDDs released.
    """
    keep_ids: set[int] = referenced_checkpoint_ids(keep) if keep is not None else set()
    released = 0
    try:
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        victims = []
        while it.hasNext():
            entry = it.next()
            rid = int(entry.getKey())
            if rid in before_ids or rid in keep_ids:
                continue
            victims.append(entry.getValue())
        for v in victims:
            try:
                v.unpersist(False)
                released += 1
            except Exception:
                pass
    except Exception:
        pass
    return released


class CheckpointTracker:
    """Round-scoped release of iterative-loop checkpoints.

    Usage::

        t = CheckpointTracker(lag=2)
        t.add(edges_ckpt)            # round 0 artifacts
        t.round_done()
        for ...:
            t.add(new_labels, new_edges)
            ... run the round's single action ...
            t.round_done()           # releases artifacts `lag` rounds old
        t.release_all(keep=final_labels)
    """

    def __init__(self, lag: int = 2) -> None:
        self.lag = lag
        self._rounds: list[list[DataFrame]] = []
        self._current: list[DataFrame] = []

    def add(self, *dfs: DataFrame) -> None:
        self._current.extend(dfs)

    def round_done(self) -> None:
        """Close the current round; release the round that is now ``lag``
        rounds stale (call AFTER the round's materializing action)."""
        self._rounds.append(self._current)
        self._current = []
        idx = len(self._rounds) - 1 - self.lag
        if idx >= 0:
            for df in self._rounds[idx]:
                unpersist_checkpoint(df)
            self._rounds[idx] = []

    def release_all(self, keep: DataFrame | None = None) -> None:
        """Release every tracked checkpoint except those the ``keep``
        DataFrame's plan references (the operator's return value)."""
        keep_ids = referenced_checkpoint_ids(keep) if keep is not None else set()
        self._rounds.append(self._current)
        self._current = []
        for batch in self._rounds:
            for df in batch:
                rdd = checkpoint_rdd(df)
                if rdd is None:
                    continue
                if int(rdd.id()) in keep_ids:
                    continue
                try:
                    rdd.unpersist(False)
                except Exception:
                    pass
        self._rounds = []
