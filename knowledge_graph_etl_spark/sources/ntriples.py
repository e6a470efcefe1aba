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


def read_ntriples(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """Distributed N-Triples reader into the quad schema for ``graph``
    (reference SparqlUpdateHook.insert_file, sparql_update.py:124-133).
    Turtle/RDF-XML auto-detection is out of scope — N-Triples covers the
    reference's own writer output round-trip."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    lines = lines.where(~F.trim("value").startswith("#"))
    s_raw = F.regexp_extract("value", _LINE, 1)
    p_raw = F.regexp_extract("value", _LINE, 2)
    o_raw = F.regexp_extract("value", _LINE, 3)
    parsed = lines.select(s_raw.alias("s_raw"), p_raw.alias("p_raw"), o_raw.alias("o_raw"))
    parsed = parsed.where(F.col("p_raw") != "")

    s_is_iri = F.col("s_raw").startswith("<")
    s_val = F.when(s_is_iri, F.expr("substring(s_raw, 2, length(s_raw)-2)")).otherwise(
        F.col("s_raw")
    )
    s_type = F.when(s_is_iri, F.lit(IRI)).otherwise(F.lit(BNODE))

    o_is_iri = F.col("o_raw").startswith("<")
    o_is_bnode = F.col("o_raw").startswith("_:")
    lex = F.regexp_extract("o_raw", r'^"((?:[^"\\]|\\.)*)"', 1)
    # Single-pass unescape: split on escaped backslashes first so a literal
    # backslash followed by t/r/n is never mistaken for a control escape
    # (left-to-right semantics, mirroring plans/parser._unescape).
    def _unescape_segment(seg: Column) -> Column:
        seg = F.regexp_replace(seg, r"\\t", "\t")
        seg = F.regexp_replace(seg, r"\\r", "\r")
        seg = F.regexp_replace(seg, r"\\n", "\n")
        seg = F.regexp_replace(seg, r'\\"', '"')
        return seg

    lex = F.array_join(F.transform(F.split(lex, r"\\\\"), _unescape_segment), "\\")
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
