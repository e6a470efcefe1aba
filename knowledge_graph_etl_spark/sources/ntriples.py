"""N-Triples source & sink (SURVEY.md §2 ops 3 and 5).

The reference writes one serialized triple per line via rdflib ``.n3()``
(sparql_update.py:135-141, load_knowledge_graph.py:100-136) and reads RDF
files back with ``Graph().parse()`` (sparql_update.py:124-133). Here both
directions are distributed: the writer is a single projection over the
quads table (``format_string`` + ``write.text``), the reader a line-wise
regex parse (``spark.read.text`` + ``regexp_extract``) — no driver-side
row loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..terms import BNODE, IRI, LITERAL, QUAD_SCHEMA, XSD_STRING


def _nt_term(value: Column, ttype: Column, datatype: Column, lang: Column) -> Column:
    """Columnar N-Triples serialization of one term (see terms.term_to_nt)."""
    escaped = F.regexp_replace(value, r"\\", r"\\\\")
    escaped = F.regexp_replace(escaped, '"', '\\\\"')
    escaped = F.regexp_replace(escaped, "\n", r"\\n")
    escaped = F.regexp_replace(escaped, "\r", r"\\r")
    escaped = F.regexp_replace(escaped, "\t", r"\\t")
    lex = F.concat(F.lit('"'), escaped, F.lit('"'))
    lit_form = (
        F.when(lang.isNotNull(), F.concat(lex, F.lit("@"), lang))
        .when(
            datatype.isNotNull() & (datatype != XSD_STRING),
            F.concat(lex, F.lit("^^<"), datatype, F.lit(">")),
        )
        .otherwise(lex)
    )
    bnode_label = F.when(
        value.startswith("_:"), value
    ).otherwise(F.concat(F.lit("_:"), value))
    return (
        F.when(ttype == IRI, F.concat(F.lit("<"), value, F.lit(">")))
        .when(ttype == BNODE, bnode_label)
        .otherwise(lit_form)
    )


def to_ntriples_lines(quads: DataFrame) -> DataFrame:
    """Quads → one-column DataFrame of N-Triples lines
    (graph routing is the caller's concern — N-Triples is triples-only)."""
    s = _nt_term(
        F.col("s"), F.col("s_type"), F.lit(None).cast("string"), F.lit(None).cast("string")
    )
    p = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    o = _nt_term(F.col("o_value"), F.col("o_type"), F.col("o_datatype"), F.col("o_lang"))
    return quads.select(
        F.concat_ws(" ", s, p, o, F.lit(".")).alias("value")
    )


def write_ntriples(quads: DataFrame, path: str) -> None:
    """Distributed N-Triples sink (reference extract_json_as_rdf,
    load_knowledge_graph.py:100-136, minus the driver-side file loop)."""
    to_ntriples_lines(quads).write.mode("overwrite").text(path)


# one line: subject predicate object .
_S = r"^\s*(<[^>]*>|_:\S+)"
_P = r"\s+<([^>]*)>"
_O = r"""\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)\s*\.\s*$"""
_LINE = _S + _P + _O


_NT_ESCAPES = {"t": "\t", "r": "\r", "n": "\n", "b": "\b", "f": "\f", '"': '"', "\\": "\\", "'": "'"}


def _unescape_udf(col: Column) -> Column:
    """Left-to-right N-Triples string unescape incl. UCHAR
    (``\\uXXXX``/``\\UXXXXXXXX`` — W3C canonical N-Triples emits these for
    non-ASCII, so skipping them silently stores the raw escape text and
    breaks equality joins against data loaded decoded). One Arrow-batched
    pass on the load path only; a regexp_replace chain cannot express the
    stateful left-to-right scan (an escaped backslash followed by ``u``
    must NOT start a UCHAR). Built lazily — pandas_udf needs an active
    session, and this module imports before one exists."""
    import re as _re

    pat = _re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")

    def _sub(m):
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _NT_ESCAPES.get(g, g)

    @F.pandas_udf("string")
    def run(vals):
        return vals.map(lambda s: None if s is None else pat.sub(_sub, s))

    return run(col)


def read_ntriples(
    spark: SparkSession, path: str, graph: str, strict: bool = True
) -> DataFrame:
    """Distributed N-Triples reader into the quad schema for ``graph``
    (reference SparqlUpdateHook.insert_file, sparql_update.py:124-133).
    Turtle/RDF-XML auto-detection lives in :func:`..turtle.read_rdf`.

    ``strict=True`` (default) raises on any non-blank, non-comment line
    the triple grammar cannot parse — the reference's rdflib parse fails
    loudly on malformed files, and a silent drop would under-load a full
    refresh with no signal. ``strict=False`` restores drop-and-continue.
    Validation is folded into the single load pass (``raise_error``
    inside the projection — fires executor-side when the job runs), so
    the reader stays lazy and strict mode costs no extra scan."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    lines = lines.where(~F.trim("value").startswith("#"))
    s_raw = F.regexp_extract("value", _LINE, 1)
    p_raw = F.regexp_extract("value", _LINE, 2)
    o_raw = F.regexp_extract("value", _LINE, 3)
    if strict:
        # CaseWhen evaluates branches lazily: the raise only fires on a
        # row the grammar rejected, in the same task that scanned it.
        msg = F.concat(
            F.lit(f"unparseable N-Triples line in {path}: "),
            F.substring("value", 1, 120),
        )
        p_raw = F.when(p_raw == "", F.raise_error(msg).cast("string")).otherwise(p_raw)
    parsed = lines.select(
        s_raw.alias("s_raw"), p_raw.alias("p_raw"), o_raw.alias("o_raw")
    )
    parsed = parsed.where(F.col("p_raw") != "")

    s_is_iri = F.col("s_raw").startswith("<")
    s_val = F.when(s_is_iri, F.expr("substring(s_raw, 2, length(s_raw)-2)")).otherwise(
        F.col("s_raw")
    )
    s_type = F.when(s_is_iri, F.lit(IRI)).otherwise(F.lit(BNODE))

    o_is_iri = F.col("o_raw").startswith("<")
    o_is_bnode = F.col("o_raw").startswith("_:")
    lex = _unescape_udf(F.regexp_extract("o_raw", r'^"((?:[^"\\]|\\.)*)"', 1))
    lang = F.nullif(F.regexp_extract("o_raw", r'"@([A-Za-z0-9-]+)$', 1), F.lit(""))
    dtype = F.nullif(F.regexp_extract("o_raw", r"\^\^<([^>]*)>$", 1), F.lit(""))
    o_val = (
        F.when(o_is_iri, F.expr("substring(o_raw, 2, length(o_raw)-2)"))
        .when(o_is_bnode, F.col("o_raw"))
        .otherwise(lex)
    )
    o_type = (
        F.when(o_is_iri, F.lit(IRI)).when(o_is_bnode, F.lit(BNODE)).otherwise(F.lit(LITERAL))
    )

    out = parsed.select(
        F.lit(graph).alias("g"),
        s_val.alias("s"),
        s_type.alias("s_type"),
        F.col("p_raw").alias("p"),
        o_val.alias("o_value"),
        o_type.alias("o_type"),
        F.when(~o_is_iri & ~o_is_bnode, dtype).otherwise(F.lit(None)).alias("o_datatype"),
        F.when(~o_is_iri & ~o_is_bnode, lang).otherwise(F.lit(None)).alias("o_lang"),
    )
    for field in QUAD_SCHEMA.fields:
        out = out.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return out.select(*[f.name for f in QUAD_SCHEMA.fields])


# ---------------------------------------------------------------------------
# N-Quads (the quad-store exchange format: N-Triples + optional graph label)
# ---------------------------------------------------------------------------

_O_TERM = r"""\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"""
_NQ_LINE = _S + _P + _O_TERM + r"(?:\s+(<[^>]*>|_:\S+))?\s*\.\s*$"


def to_nquads_lines(quads: DataFrame) -> DataFrame:
    """Quads → one-column DataFrame of N-Quads lines: the graph column is
    serialized as the 4th term (omitted when NULL — the default graph, per
    the N-Quads grammar), so a quad store round-trips losslessly where
    N-Triples would flatten the graph structure."""
    s = _nt_term(
        F.col("s"), F.col("s_type"), F.lit(None).cast("string"), F.lit(None).cast("string")
    )
    p = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    o = _nt_term(F.col("o_value"), F.col("o_type"), F.col("o_datatype"), F.col("o_lang"))
    # a blank-node graph label (N-Quads grammar allows BLANK_NODE_LABEL as
    # the 4th term) is emitted verbatim, mirroring the subject/object
    # serializers — wrapping it in <> would re-serialize it as the invalid
    # IRI <_:g> and break the graph-preserving round-trip
    g = F.when(
        F.col("g").isNotNull() & F.col("g").startswith("_:"), F.col("g")
    ).when(
        F.col("g").isNotNull(), F.concat(F.lit("<"), F.col("g"), F.lit(">"))
    )
    return quads.select(F.concat_ws(" ", s, p, o, g, F.lit(".")).alias("value"))


def write_nquads(quads: DataFrame, path: str) -> None:
    """Distributed N-Quads sink — one projection + text write, graph
    routing preserved in-band (unlike :func:`write_ntriples`, where the
    caller must partition by graph out-of-band)."""
    to_nquads_lines(quads).write.mode("overwrite").text(path)


def read_nquads(
    spark: SparkSession,
    path: str,
    default_graph: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """Distributed N-Quads reader: same line grammar as
    :func:`read_ntriples` plus the optional 4th graph term (IRI or blank
    node label); a line without one lands in ``default_graph``. Strict
    mode raises executor-side on unparseable lines, like the N-Triples
    reader."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    lines = lines.where(~F.trim("value").startswith("#"))
    s_raw = F.regexp_extract("value", _NQ_LINE, 1)
    p_raw = F.regexp_extract("value", _NQ_LINE, 2)
    o_raw = F.regexp_extract("value", _NQ_LINE, 3)
    g_raw = F.regexp_extract("value", _NQ_LINE, 4)
    if strict:
        msg = F.concat(
            F.lit(f"unparseable N-Quads line in {path}: "),
            F.substring("value", 1, 120),
        )
        p_raw = F.when(p_raw == "", F.raise_error(msg).cast("string")).otherwise(p_raw)
    parsed = lines.select(
        s_raw.alias("s_raw"),
        p_raw.alias("p_raw"),
        o_raw.alias("o_raw"),
        g_raw.alias("g_raw"),
    ).where(F.col("p_raw") != "")

    s_is_iri = F.col("s_raw").startswith("<")
    s_val = F.when(s_is_iri, F.expr("substring(s_raw, 2, length(s_raw)-2)")).otherwise(
        F.col("s_raw")
    )
    s_type = F.when(s_is_iri, F.lit(IRI)).otherwise(F.lit(BNODE))

    o_is_iri = F.col("o_raw").startswith("<")
    o_is_bnode = F.col("o_raw").startswith("_:")
    lex = _unescape_udf(F.regexp_extract("o_raw", r'^"((?:[^"\\]|\\.)*)"', 1))
    lang = F.nullif(F.regexp_extract("o_raw", r'"@([A-Za-z0-9-]+)$', 1), F.lit(""))
    dtype = F.nullif(F.regexp_extract("o_raw", r"\^\^<([^>]*)>$", 1), F.lit(""))
    o_val = (
        F.when(o_is_iri, F.expr("substring(o_raw, 2, length(o_raw)-2)"))
        .when(o_is_bnode, F.col("o_raw"))
        .otherwise(lex)
    )
    o_type = (
        F.when(o_is_iri, F.lit(IRI)).when(o_is_bnode, F.lit(BNODE)).otherwise(F.lit(LITERAL))
    )
    g_val = F.when(
        F.col("g_raw").startswith("<"),
        F.expr("substring(g_raw, 2, length(g_raw)-2)"),
    ).when(F.col("g_raw") != "", F.col("g_raw")).otherwise(
        F.lit(default_graph).cast("string")
    )

    out = parsed.select(
        g_val.alias("g"),
        s_val.alias("s"),
        s_type.alias("s_type"),
        F.col("p_raw").alias("p"),
        o_val.alias("o_value"),
        o_type.alias("o_type"),
        F.when(~o_is_iri & ~o_is_bnode, dtype).otherwise(F.lit(None)).alias("o_datatype"),
        F.when(~o_is_iri & ~o_is_bnode, lang).otherwise(F.lit(None)).alias("o_lang"),
    )
    for field in QUAD_SCHEMA.fields:
        out = out.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return out.select(*[f.name for f in QUAD_SCHEMA.fields])
