"""RDF term model and quad schema for the PySpark-native engine.

The reference (viaacode/knowledge-graph-etl) stores RDF quads in Stardog;
here the central store is one columnar table of quads (SURVEY.md §1.1).
A term is ``(value, type, datatype, lang)`` where type is one of
``iri | bnode | literal``; subjects carry only ``(value, type)`` and
predicates only ``value`` (always IRIs) — see FIXTURES.md §A1.

Datatypes actually produced by the direct mapping
(reference parse_functions.py:98-102): plain strings (no datatype),
xsd:boolean, xsd:integer, xsd:double; queries additionally mint
xsd:string / xsd:dateTime typed literals (load_knowledge_graph.py:529).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import StringType, StructField, StructType

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_DATETIME = XSD + "dateTime"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
#: datatype of language-tagged literals (RDF 1.1) — only ever OBSERVED
#: via DATATYPE(); the store keeps the tag in o_lang and o_datatype NULL
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

IRI = "iri"
BNODE = "bnode"
LITERAL = "literal"

QUAD_COLUMNS = ["g", "s", "s_type", "p", "o_value", "o_type", "o_datatype", "o_lang"]

QUAD_SCHEMA = StructType(
    [StructField(c, StringType(), c not in ("s", "p", "o_value")) for c in QUAD_COLUMNS]
)

TRIPLE_COLUMNS = QUAD_COLUMNS[1:]


@dataclass(frozen=True)
class Term:
    """A constant RDF term (used in patterns and construct templates)."""

    value: str
    type: str = LITERAL
    datatype: str | None = None
    lang: str | None = None

    def __post_init__(self) -> None:
        if self.type not in (IRI, BNODE, LITERAL):
            raise ValueError(f"bad term type: {self.type}")


def iri(value: str) -> Term:
    return Term(value, IRI)


def bnode(label: str) -> Term:
    return Term(label, BNODE)


def literal(value, datatype: str | None = None, lang: str | None = None) -> Term:
    """Build a literal term from a Python value, mirroring the reference's
    type mapping (parse_functions.py:98-102 / rdflib Literal):
    bool → xsd:boolean ("true"/"false"), int → xsd:integer,
    float → xsd:double, str → plain literal (no datatype).
    """
    if datatype is None and lang is None:
        if isinstance(value, bool):
            return Term("true" if value else "false", LITERAL, XSD_BOOLEAN)
        if isinstance(value, int):
            return Term(str(value), LITERAL, XSD_INTEGER)
        if isinstance(value, float):
            return Term(format_double(value), LITERAL, XSD_DOUBLE)
    return Term(str(value), LITERAL, datatype, lang)


def format_double(v: float) -> str:
    """Lexical form for xsd:double literals: Python str(), which is what
    rdflib's Literal(float) serializes for typical values."""
    return str(v)


_NT_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def nt_escape(s: str) -> str:
    out = []
    for ch in s:
        out.append(_NT_ESCAPES.get(ch, ch))
    return "".join(out)


def term_to_nt(value: str, ttype: str, datatype: str | None = None, lang: str | None = None) -> str:
    """Serialize one term in N-Triples syntax (reference sparql_update.py:135-141
    delegates to rdflib ``.n3()``; this is the same surface syntax)."""
    if ttype == IRI:
        return f"<{value}>"
    if ttype == BNODE:
        label = value[2:] if value.startswith("_:") else value
        return f"_:{label}"
    lex = f'"{nt_escape(value)}"'
    if lang:
        return f"{lex}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{lex}^^<{datatype}>"
    return lex
