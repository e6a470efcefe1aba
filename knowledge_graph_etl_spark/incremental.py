"""Incremental target-graph maintenance — recompute ONLY the derived
quads of changed documents instead of CLEAR + full remap.

The reference pipeline is full-refresh by design (it CLEARs every
target graph and re-runs all mappings each run — see
``mappings/pipeline.py`` and SURVEY.md §4.1, which defers incremental
maintenance as a later option). At 100 TB full refresh is the
anti-pattern: one changed document should cost O(delta), not O(corpus),
of mapping compute. This module adds that capability on top of the
existing building blocks:

- :func:`..extensions.changelog.snapshot_diff` classifies each document
  id as added / removed / changed / unchanged from two corpus snapshots
  (no op log required);
- any deterministic mapping (``ingest.quadify`` / ``ingest.json_to_quads``
  with ``src_col=...``) emits derived quads carrying a PROVENANCE column
  — which source document each quad derives from;
- :func:`incremental_remap` then (1) anti-join-deletes the stale derived
  quads of changed+removed documents and (2) re-maps ONLY the
  changed+added documents, set-inserting their fresh quads.

Correctness contract (oracled by the ``kg_incremental_remap`` registry
entry and pytest-pinned): if the mapping is a deterministic pure
function of the columns the diff's content hash covers, the maintained
table is row-identical to a full refresh over the new snapshot —
``incremental_remap(...) == map_fn(new_docs)`` as a multiset.

Scale shape: the dirty-id sets are O(delta) and broadcast, so the
delete is a broadcast LEFT ANTI hash join on the provenance column (the
big derived table never shuffles) and the re-map side touches only
delta documents (broadcast semi join prunes the corpus scan before the
expensive per-document mapping work — the mapInPandas JSON walk or the
quadify explode runs on the delta only). Cost of the mapping compute is
proportional to the delta, not the corpus; the one corpus-sized term is
the unavoidable scan-and-rewrite of the kept derived quads, which a
partitioned store turns into a metadata-only retain for untouched
partitions.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["incremental_remap"]


def incremental_remap(
    old_derived: DataFrame,
    new_docs: DataFrame,
    diff: DataFrame,
    map_fn: Callable[[DataFrame], DataFrame],
    id_col: str = "doc_id",
    src_col: str = "src_id",
) -> DataFrame:
    """Maintain a derived quad table against a changed document snapshot.

    Parameters
    ----------
    old_derived:
        The current derived table — ``map_fn`` output over the OLD
        snapshot, including the ``src_col`` provenance column.
    new_docs:
        The new document snapshot (full table; only delta rows are read
        by the mapping).
    diff:
        :func:`..extensions.changelog.snapshot_diff` output over the two
        snapshots — ``(id_col, status, old_md5, new_md5)``. The content
        column hashed by the diff MUST functionally determine the
        mapping output (hash a concatenation of every mapped column,
        not just the text, or a 'lang-only' edit is silently missed).
    map_fn:
        Deterministic mapping ``docs -> quads`` emitting ``src_col``.

    Returns the maintained derived table: kept quads of unchanged
    documents + freshly mapped quads of changed/added documents, equal
    to ``map_fn(new_docs)`` row-for-row.
    """
    dirty = diff.where(F.col("status").isin("changed", "removed")).select(
        F.col(id_col).cast("string").alias(src_col)
    )
    # reselect the original column order — a named-key join moves the
    # key column to the front, and the union must mirror map_fn's output
    kept = old_derived.join(F.broadcast(dirty), src_col, "left_anti").select(
        *old_derived.columns
    )
    remap_ids = diff.where(F.col("status").isin("changed", "added")).select(
        id_col
    )
    delta_docs = new_docs.join(F.broadcast(remap_ids), id_col, "left_semi")
    return kept.unionByName(map_fn(delta_docs))
