"""JSON → triples "direct mapping" — the engine's core ingest transform.

Re-expresses the reference's schema-agnostic event-walk
(reference parse_functions.py:48-105) as a distributed, Arrow-batched
``mapInPandas`` flatMap: one JSON document row in, N quad rows out.

Semantics preserved exactly (SURVEY.md §2 op 4):
  * JSON object  → fresh node; if reached via a key, emit
    ``(parent, key, node)`` link (parse_functions.py:85-88).
  * array of X   → repeated property on the owning node; the owning
    node's active property is saved on array start and restored when a
    child object closes (parse_functions.py:63,68-76,94-96), so
    ``{"a": [{"b":1}, 2]}`` emits ``(root,a,child)`` and ``(root,a,2)``.
    Nested scalar arrays flatten: ``{"a": [[1,2],[3]]}`` → a:1, a:2, a:3.
  * scalar       → typed literal: bool → xsd:boolean, int → xsd:integer,
    float → xsd:double, str → plain literal (parse_functions.py:98-102).
  * null         → NO triple (the reference has no "null" event branch).
  * predicate    → ``namespace + key`` (parse_functions.py:104-105).

Deliberate divergences (documented, driver-testable):
  * Blank nodes are deterministic — ``_:b{doc_id}-{n}`` with ``n`` the
    0-based count of objects opened so far within the document, mirroring
    the reference's ``instance_ns[i]`` counter (parse_functions.py:79-81).
    The reference's default ``BNode()`` labels are random per process;
    determinism is required for oracle testing and is safe because bnode
    labels only join within one load (SURVEY.md §1.3).
  * A scalar with no enclosing subject (bare top-level scalar) is dropped
    instead of raising IndexError as the reference would
    (parse_functions.py:99 on an empty ``subjectStack``).
  * A number/boolean encountered while no key is active (top-level array
    of scalars) is dropped — the reference would emit a triple with
    predicate ``None`` (parse_functions.py:98-99 lacks the
    ``property is not None`` guard that strings have), which is
    unserializable downstream.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .terms import (
    BNODE,
    IRI,
    LITERAL,
    QUAD_COLUMNS,
    QUAD_SCHEMA,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    format_double,
)

DEFAULT_NAMESPACE = "http://localhost/"


def parse_document(
    doc,
    doc_id: str,
    namespace: str = DEFAULT_NAMESPACE,
    instance_ns: str | None = None,
) -> Iterator[tuple]:
    """Walk one parsed JSON value, yielding
    ``(s, s_type, p, o_value, o_type, o_datatype, o_lang)`` tuples.

    Iterative event walk equivalent to reference parse_functions.py
    ``parse_dict`` + ``_parse_events`` (see module docstring for the
    rule-by-rule mapping). ``instance_ns`` switches node minting from
    bnode labels to sequential IRIs (parse_functions.py:79-81).
    """

    def events(data):
        # Mirrors parse_dict.basic_parse (reference parse_functions.py:10-33).
        stack = [("value", data)]
        while stack:
            kind, payload = stack.pop()
            if kind == "event":
                yield payload
                continue
            data = payload
            if isinstance(data, dict):
                yield ("start_map", None)
                stack.append(("event", ("end_map", None)))
                for k, v in reversed(list(data.items())):
                    stack.append(("value", v))
                    stack.append(("event", ("map_key", k)))
            elif isinstance(data, list):
                yield ("start_array", None)
                stack.append(("event", ("end_array", None)))
                for item in reversed(data):
                    stack.append(("value", item))
            elif data is None:
                yield ("null", None)
            elif isinstance(data, str):
                yield ("string", data)
            elif isinstance(data, bool):
                yield ("boolean", data)
            elif isinstance(data, int):
                yield ("integer", data)
            elif isinstance(data, float):
                yield ("double", data)

    subject_stack: list[tuple[str, str]] = []  # (node value, node type)
    array_properties: dict[str, str] = {}
    prop: str | None = None
    n_nodes = 0

    # NOTE (reference fidelity): end_array pops the saved property keyed on
    # the CURRENT subject even when it closes an INNER nested array, so a
    # sibling object closing after `[[..], {..}, x]` does not restore the
    # outer array's property — the reference behaves identically
    # (parse_functions.py:68-76 pops arrayProperties[s] on every end_array),
    # and this engine reproduces it rather than "fixing" a divergence.
    for event, value in events(doc):
        if event == "start_array" and subject_stack and prop is not None:
            array_properties[subject_stack[-1][0]] = prop
        elif event == "end_array" and subject_stack:
            array_properties.pop(subject_stack[-1][0], None)
        elif event == "start_map":
            if instance_ns is not None:
                node = (f"{instance_ns}{doc_id}-{n_nodes}", IRI)
            else:
                node = (f"_:b{doc_id}-{n_nodes}", BNODE)
            n_nodes += 1
            if prop is not None and subject_stack:
                s, st = subject_stack[-1]
                yield (s, st, prop, node[0], node[1], None, None)
            subject_stack.append(node)
        elif event == "end_map":
            subject_stack.pop()
            if subject_stack and subject_stack[-1][0] in array_properties:
                prop = array_properties[subject_stack[-1][0]]
        elif event == "map_key":
            prop = namespace + value
        elif event in ("boolean", "integer", "double"):
            if subject_stack and prop is not None:
                s, st = subject_stack[-1]
                if event == "boolean":
                    yield (s, st, prop, "true" if value else "false", LITERAL, XSD_BOOLEAN, None)
                elif event == "integer":
                    yield (s, st, prop, str(value), LITERAL, XSD_INTEGER, None)
                else:
                    yield (s, st, prop, format_double(value), LITERAL, XSD_DOUBLE, None)
        elif event == "string":
            if subject_stack and prop is not None:
                s, st = subject_stack[-1]
                yield (s, st, prop, value, LITERAL, None, None)
        # "null" → no triple (reference parse_functions.py has no null branch)


def parse_json_text(
    text: str,
    doc_id: str,
    namespace: str = DEFAULT_NAMESPACE,
    instance_ns: str | None = None,
) -> Iterator[tuple]:
    """Parse a JSON string and direct-map it (reference parse_functions.py:39-45;
    ``json.loads`` matches ijson with ``use_float=True`` — numbers become
    int/float, never Decimal)."""
    return parse_document(json.loads(text), doc_id, namespace, instance_ns)


def json_to_quads(
    docs: DataFrame,
    graph: str,
    json_col: str = "json",
    id_col: str = "doc_id",
    namespace: str = DEFAULT_NAMESPACE,
    instance_ns: str | None = None,
    src_col: str | None = None,
) -> DataFrame:
    """Distributed direct mapping: DataFrame of (id, json-text) rows →
    DataFrame of quads in named graph ``graph``.

    Arrow-batched via ``mapInPandas`` (the reference's per-record Python
    generator, parallelized per partition; SURVEY.md §3 entry point 1).
    ``id_col`` must be unique per document — it scopes the deterministic
    blank-node labels. ``src_col`` (optional) appends a provenance column
    holding the source document id as a string, the deletion linkage for
    :func:`..incremental.incremental_remap`. Scale: one pass, no shuffle;
    output partitioning follows the input's.
    """
    ns = namespace
    ins = instance_ns
    jc, ic = json_col, id_col
    cols = QUAD_COLUMNS + ([src_col] if src_col else [])
    if src_col:
        from pyspark.sql.types import StringType, StructField, StructType

        # copy — StructType.add would mutate the shared QUAD_SCHEMA
        schema = StructType(
            list(QUAD_SCHEMA.fields) + [StructField(src_col, StringType())]
        )
    else:
        schema = QUAD_SCHEMA

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[ic], pdf[jc]):
                if text is None:
                    continue
                for t in parse_json_text(text, str(did), ns, ins):
                    rows.append(
                        (graph, *t, str(did)) if src_col else (graph, *t)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(ic, jc).mapInPandas(run, schema=schema)


def quadify(
    df: DataFrame,
    key_col: str,
    subject_prefix: str,
    graph: str,
    columns: list[str] | None = None,
    namespace: str = DEFAULT_NAMESPACE,
    iri_columns: dict[str, str] | None = None,
    src_col: str | None = None,
) -> DataFrame:
    """Relational table → quads: subject ``subject_prefix + key``, one
    triple per non-null column value (the SQL "direct mapping" of a wide
    row; used to exercise the graph engine against relational oracles).

    ``iri_columns`` maps column → object-IRI prefix, turning foreign keys
    into IRI objects so BGP chain joins (SURVEY.md §2 op 16) traverse them.
    ``src_col`` (optional) appends a provenance column holding the source
    key as a string — the linkage :func:`..incremental.incremental_remap`
    needs to delete exactly the derived quads of changed documents.
    Implemented as a single projection + explode — no shuffle, fully
    column-pruned at the parquet scan.
    """
    cols = columns or [c for c in df.columns if c != key_col]
    subj = F.concat(F.lit(subject_prefix), F.col(key_col).cast("string"))
    entries = []
    for c in cols:
        field = df.schema[c]
        dt = field.dataType.simpleString()
        obj_prefix = (iri_columns or {}).get(c)
        if obj_prefix is not None:
            o_val: Column = F.concat(F.lit(obj_prefix), F.col(c).cast("string"))
            o_type, o_dt = F.lit(IRI), F.lit(None).cast("string")
        else:
            o_val = F.col(c).cast("string")
            o_type = F.lit(LITERAL)
            if dt in ("int", "bigint", "smallint", "tinyint"):
                o_dt = F.lit(XSD_INTEGER)
            elif dt in ("double", "float"):
                o_dt = F.lit(XSD_DOUBLE)
            elif dt == "boolean":
                o_dt = F.lit(XSD_BOOLEAN)
            else:
                o_dt = F.lit(None).cast("string")
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(namespace + c).alias("p"),
                    o_val.alias("o_value"),
                    o_type.alias("o_type"),
                    o_dt.alias("o_datatype"),
                ),
            )
        )
    src = (
        [F.col(key_col).cast("string").alias(src_col)] if src_col else []
    )
    exploded = df.select(
        subj.alias("s"), *src, F.explode(F.array(*entries)).alias("t")
    ).where(F.col("t").isNotNull())
    return exploded.select(
        F.lit(graph).alias("g"),
        F.col("s"),
        F.lit(IRI).alias("s_type"),
        F.col("t.p").alias("p"),
        F.col("t.o_value").alias("o_value"),
        F.col("t.o_type").alias("o_type"),
        F.col("t.o_datatype").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        *([F.col(src_col)] if src_col else []),
    )
