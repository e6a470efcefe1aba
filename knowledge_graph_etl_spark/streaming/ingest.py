"""Structured-Streaming ingest: JSON document streams → quad store.

The reference is batch-only (manual trigger, full refresh —
load_knowledge_graph.py:51, SURVEY.md §2.5), but its extract step is a
natural stream: documents arrive, each maps independently to triples.
This module lifts the same direct mapping (ingest.json_to_quads — the
``mapInPandas`` transform works unchanged on streaming DataFrames) into
``readStream``/``writeStream``:

  * one pass, no shuffle — partitioning follows the source;
  * per-micro-batch set-dedup via ``foreachBatch`` + GraphStore.insert,
    preserving triple-store set semantics (SURVEY.md §1.3) across batches;
  * checkpointed, so ingestion is restartable/exactly-once into the
    parquet-backed store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..ingest import DEFAULT_NAMESPACE, json_to_quads
from ..store import GraphStore


def stream_json_to_quads(
    docs_stream: DataFrame,
    graph: str,
    json_col: str = "json",
    id_col: str = "doc_id",
    namespace: str = DEFAULT_NAMESPACE,
) -> DataFrame:
    """Streaming direct mapping: the batch transform applied to a
    streaming DataFrame (mapInPandas is streaming-compatible; stateless,
    so no watermark needed)."""
    return json_to_quads(
        docs_stream, graph, json_col=json_col, id_col=id_col, namespace=namespace
    )


def stream_insert_into_store(
    quads_stream: DataFrame,
    store: GraphStore,
    checkpoint_dir: str,
    dedup_against_store: bool = True,
    available_now: bool = False,
    target_graphs: list[str] | None = None,
):
    """Write a quad stream into the store with set semantics.

    ``foreachBatch`` routes each micro-batch through
    :meth:`GraphStore.insert` (batch dedup + anti-join against stored
    quads), so replays and overlapping batches collapse exactly like the
    reference's re-INSERTed triples do in Stardog (SURVEY.md §1.3).
    """

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        store.insert(
            batch_df,
            dedup_against_store=dedup_against_store,
            target_graphs=target_graphs,
        )

    writer = (
        quads_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
