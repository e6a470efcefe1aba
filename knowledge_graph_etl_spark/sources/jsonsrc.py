"""JSON document source/sink + JDBC source config (SURVEY.md §2 ops 1, 2, 6).

The reference extracts JSON documents from Postgres ``jsonb`` columns with a
server-side cursor (load_knowledge_graph.py:60-79) and from whole files
(load_knowledge_graph.py:160-176). Spark-side:

  * Postgres → ``spark.read.jdbc`` with ``fetchsize`` (distributed scan,
    replacing the psycopg2 cursor's ``itersize=10000``).
  * File → ``spark.read.json`` / whole-text, schema-agnostic: each document
    stays a JSON string for the direct mapping (the reference's "any shape"
    property, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_docs(
    spark: SparkSession,
    path: str,
    multiline_array: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Read a JSON file of documents into (doc_id, json-text) rows ready for
    the direct mapping — the Spark equivalent of
    ``extract_from_file_and_insert`` (load_knowledge_graph.py:160-176).

    ``multiline_array=True`` handles the reference's one file source,
    ``mam_tenants_{env}.json`` — a single top-level JSON array
    (load_knowledge_graph.py:329, FIXTURES.md §A6): each element becomes a
    document. Otherwise the file is JSON-lines (one document per line).
    """
    if multiline_array:
        import json as _json

        import pandas as pd

        # ids are prefixed with a hash of the source FILE: a glob/directory
        # input otherwise restarts the element index at 0 per file, and
        # colliding doc ids would merge distinct documents' bnode-labelled
        # triples downstream (json_to_quads requires unique ids)
        raw = spark.read.text(path, wholetext=True).select(
            F.md5(F.input_file_name()).alias("__file"), "value"
        )

        def split(batches):
            for pdf in batches:
                for fh, text in zip(pdf["__file"], pdf["value"]):
                    data = _json.loads(text)
                    if not isinstance(data, list):
                        data = [data]
                    yield pd.DataFrame(
                        {
                            id_col: [f"{fh[:10]}-{i}" for i in range(len(data))],
                            "json": [_json.dumps(d) for d in data],
                        }
                    )

        return raw.mapInPandas(split, schema=f"{id_col} string, json string")
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    return lines.select(
        F.monotonically_increasing_id().cast("string").alias(id_col),
        F.col("value").alias("json"),
    )


def write_json_docs(docs: DataFrame, path: str, json_col: str = "json") -> None:
    """JSON file sink (reference ``extract_json``,
    load_knowledge_graph.py:81-98 — there a driver-side single-file write of
    a ``jsonb_agg`` blob; here a distributed text write of one document per
    line)."""
    docs.select(F.col(json_col).alias("value")).write.mode("overwrite").text(path)


def postgres_doc_query(schema: str, table: str, field: str) -> str:
    """The pushed-down Postgres subquery extracting one JSON document per
    row — the exact per-row SELECT shape of the reference's ``_get_cursor``
    (load_knowledge_graph.py:62-63: ``SELECT ({table}.{field})::text FROM
    {schema}.{table}``), wrapped as a JDBC dbtable subquery."""
    return f"(SELECT ({table}.{field})::text AS json FROM {schema}.{table}) src"


def read_postgres_json(
    spark: SparkSession,
    url: str,
    schema: str,
    table: str,
    field: str,
    fetchsize: int = 10000,
    doc_query: str | None = None,
    key_col: str | None = None,
    **options,
) -> DataFrame:
    """JDBC scan of a Postgres jsonb column, one document per row —
    the Spark re-expression of ``_get_cursor`` (load_knowledge_graph.py:60-79;
    ``fetchsize`` mirrors ``cursor.itersize = 10000`` at :74). The
    ``jsonb_agg`` single-row mode (:64-65) is intentionally dropped — it
    existed only to write one JSON file, which ``write_json_docs`` covers
    distributively.

    ``doc_query`` overrides the generated Postgres subquery for other SQL
    dialects (also the contract-test seam: the wiring is exercised against
    the embedded Derby that ships with Spark, since this container has no
    Postgres — the subquery must produce a single ``json`` column).

    ``key_col`` names a primary-key column the subquery also projects:
    ``doc_id`` becomes that key's string form, so byte-identical duplicate
    rows stay distinct documents (matching the reference's fresh-BNode-
    per-row behaviour, load_knowledge_graph.py:105). Without a key the
    fallback is ``md5(json)``, which deliberately collapses exact
    duplicates (their direct-mapped triples are identical anyway).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", doc_query or postgres_doc_query(schema, table, field))
        .option("fetchsize", str(fetchsize))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    # doc_id = primary key when the source has one, else content hash —
    # NOT monotonically_increasing_id: a JDBC scan has no stable row
    # order, so positional ids change across re-evaluations (task retry,
    # second action on this lazy DataFrame) and would split one
    # document's bnode-labelled triples across two subjects. With
    # key_col, duplicate documents stay distinct (reference behaviour);
    # keyless, identical documents share an id — their direct-mapped
    # triples are identical too, and the store's set semantics collapse
    # them exactly like re-inserted triples.
    if key_col is not None:
        return df.select(F.col(key_col).cast("string").alias("doc_id"), "json")
    return df.select(F.md5("json").alias("doc_id"), "json")
