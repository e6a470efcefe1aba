"""JVM-side JSON → triples direct mapping over Spark's VARIANT type —
the ``from_json``/VARIANT alternative SURVEY.md §1.2 named, built so the
walker-vs-JVM question could be settled by measurement (BASELINE.md r12)
instead of intuition.

:func:`json_to_quads` (ingest.py) is an Arrow-batched ``mapInPandas``
event walk: ONE narrow pass, but every byte crosses the JVM↔Python
boundary and the walk runs at Python speed. This module re-expresses the
same direct mapping as a JVM-side LEVEL WALK over ``parse_json``
variants: each nesting level is one narrow ``variant_explode`` pass (no
Python worker), then object nodes are numbered with ONE per-document
rank window and triples assembled with two (doc, path)-keyed joins.

Semantics vs the walker — identical on the document shapes the staging
pipeline actually carries, with two DOCUMENTED divergences on
pathological shapes (both verified by tests/test_ingest_variant.py):

* **Node numbering order**: the walker numbers objects in DFS pre-order
  over key INSERTION order; the Variant binary format stores object
  fields sorted by key, so this path numbers in DFS pre-order over
  SORTED key order. On documents whose keys are already sorted (or
  where relabeling is acceptable — bnode/instance labels are opaque
  identifiers), outputs are byte-identical; otherwise the graphs are
  identical up to that deterministic node relabeling.
* **The array-property restore quirk**: the walker reproduces the
  reference's ``end_array`` bug (reference parse_functions.py:68-76 —
  an INNER array's close pops the outer array's saved property, so in
  ``{"a": [[1], {"b": 2}, 3]}`` the trailing ``3`` attaches to ``b``).
  The level walk implements the non-quirky semantics (``3`` attaches to
  ``a``). The staging corpus has no scalar-after-object-after-nested-
  array shape, and the walker remains the semantic baseline.
* **Double lexical forms**: JVM ``CAST(double AS STRING)`` matches
  Python ``str()`` only for magnitudes in ``[1e-3, 1e7)``; outside that
  band both emit valid (but differently-spelled) xsd:double lexicals.

Scale shape: ``max-depth`` narrow passes (one per JSON nesting level,
each localCheckpointed — level count is bounded by document structure,
not data volume), one rank-window shuffle keyed ``(doc_id)`` and two
``(doc_id, path)`` joins, all quad-sized. The walker is one pass at
Python throughput; this is ~depth+3 passes at JVM throughput — which
wins is a measurement, recorded in BASELINE.md r12.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ingest import DEFAULT_NAMESPACE
from .terms import (
    BNODE,
    IRI,
    LITERAL,
    QUAD_COLUMNS,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
)


def json_to_quads_variant(
    docs: DataFrame,
    graph: str,
    json_col: str = "json",
    id_col: str = "doc_id",
    namespace: str = DEFAULT_NAMESPACE,
    instance_ns: str | None = None,
    src_col: str | None = None,
    max_depth: int = 32,
) -> DataFrame:
    """Distributed direct mapping, JVM-side (see module docstring).

    Same signature/contract as :func:`..ingest.json_to_quads`; raises
    ``ValueError`` if any document nests deeper than ``max_depth``
    (the walker has no such bound; 32 covers any sane document)."""
    spark = docs.sparkSession
    sv = F.schema_of_variant(F.col("v"))
    kind = (
        F.when(sv.startswith("OBJECT"), F.lit("o"))
        .when(sv.startswith("ARRAY"), F.lit("a"))
        .when(sv == "VOID", F.lit("n"))
        .otherwise(F.lit("s"))
    )
    root = docs.where(F.col(json_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("did"),
        F.parse_json(F.col(json_col)).alias("v"),
        F.array().cast("array<int>").alias("path"),
        F.lit(None).cast("string").alias("prop"),
        F.lit(None).cast("array<int>").alias("parent_path"),
    )
    levels: list[DataFrame] = []
    frontier = root.withColumn("kind", kind).localCheckpoint(eager=True)
    depth = 0
    while True:
        levels.append(frontier)
        expandable = frontier.where(F.col("kind").isin("o", "a"))
        if expandable.isEmpty():
            break
        depth += 1
        if depth > max_depth:
            raise ValueError(
                f"document nesting exceeds max_depth={max_depth}"
            )
        # uuid per level, not id(docs): id() values are reusable after
        # gc, so two concurrent calls in one SparkSession could collide
        # and createOrReplaceTempView would silently clobber the other
        # run's frontier (ADVICE r12)
        view = f"__ingest_frontier_{uuid.uuid4().hex}_{depth}"
        expandable.createOrReplaceTempView(view)
        children = spark.sql(
            """
            SELECT
              f.did,
              t.value AS v,
              array_append(f.path, CAST(t.pos AS INT)) AS path,
              CASE WHEN f.kind = 'o' THEN concat('{ns}', t.key)
                   ELSE f.prop END AS prop,
              CASE WHEN f.kind = 'o' THEN f.path
                   ELSE f.parent_path END AS parent_path
            FROM {view} f, LATERAL variant_explode(f.v) AS t
            """.replace("{ns}", namespace.replace("'", "\\'")).replace(
                "{view}", view
            )
        )
        spark.catalog.dropTempView(view)
        frontier = children.withColumn("kind", kind).localCheckpoint(
            eager=True
        )

    nodes = None
    scalars = None
    for lv in levels:
        o = lv.where(F.col("kind") == "o").select(
            "did", "path", "parent_path", "prop"
        )
        s = lv.where(F.col("kind") == "s").select(
            "did",
            "parent_path",
            "prop",
            F.schema_of_variant("v").alias("sv"),
            F.col("v"),
        )
        nodes = o if nodes is None else nodes.unionByName(o)
        scalars = s if scalars is None else scalars.unionByName(s)

    # DFS pre-order == lexicographic order on the child-position paths
    # (a parent's path is a strict prefix of its children's); one rank
    # window per document numbers every object node
    w = Window.partitionBy("did").orderBy(F.col("path").asc())
    numbered = nodes.withColumn("n", F.row_number().over(w) - F.lit(1))
    if instance_ns is not None:
        label = F.concat(
            F.lit(instance_ns), F.col("did"), F.lit("-"), F.col("n")
        )
        ntype = F.lit(IRI)
    else:
        label = F.concat(
            F.lit("_:b"), F.col("did"), F.lit("-"), F.col("n")
        )
        ntype = F.lit(BNODE)
    labels = numbered.select(
        "did", "path", label.alias("node"), ntype.alias("node_type")
    ).localCheckpoint(eager=True)

    parents = labels.select(
        F.col("did").alias("p_did"),
        F.col("path").alias("p_path"),
        F.col("node").alias("p_node"),
        F.col("node_type").alias("p_type"),
    )

    links = (
        numbered.where(
            F.col("parent_path").isNotNull() & F.col("prop").isNotNull()
        )
        .join(labels, ["did", "path"])
        .join(
            parents,
            (F.col("did") == F.col("p_did"))
            & (F.col("parent_path") == F.col("p_path")),
        )
        .select(
            F.col("did"),
            F.col("p_node").alias("s"),
            F.col("p_type").alias("s_type"),
            F.col("prop").alias("p"),
            F.col("node").alias("o_value"),
            F.col("node_type").alias("o_type"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )
    )

    # parse_json stores non-integer JSON numbers as DECIMAL when exactly
    # representable (else DOUBLE) — both are the walker's float branch
    is_float = (F.col("sv") == "DOUBLE") | F.col("sv").startswith("DECIMAL")
    sval = (
        F.when(
            F.col("sv") == "BOOLEAN",
            F.when(
                F.try_variant_get("v", "$", "boolean"), F.lit("true")
            ).otherwise(F.lit("false")),
        )
        .when(
            is_float,
            F.try_variant_get("v", "$", "double").cast("string"),
        )
        .when(
            F.col("sv") == "STRING",
            F.try_variant_get("v", "$", "string"),
        )
        .otherwise(F.try_variant_get("v", "$", "bigint").cast("string"))
    )
    sdt = (
        F.when(F.col("sv") == "BOOLEAN", F.lit(XSD_BOOLEAN))
        .when(is_float, F.lit(XSD_DOUBLE))
        .when(F.col("sv") == "STRING", F.lit(None).cast("string"))
        .otherwise(F.lit(XSD_INTEGER))
    )
    lits = (
        scalars.where(
            F.col("parent_path").isNotNull() & F.col("prop").isNotNull()
        )
        .join(
            parents,
            (F.col("did") == F.col("p_did"))
            & (F.col("parent_path") == F.col("p_path")),
        )
        .select(
            F.col("did"),
            F.col("p_node").alias("s"),
            F.col("p_type").alias("s_type"),
            F.col("prop").alias("p"),
            sval.alias("o_value"),
            F.lit(LITERAL).alias("o_type"),
            sdt.alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )
    )

    out = links.unionByName(lits)
    cols = [F.lit(graph).alias("g")] + [F.col(c) for c in QUAD_COLUMNS[1:]]
    if src_col:
        return out.select(*cols, F.col("did").alias(src_col))
    return out.select(*cols)
