"""SPARQL scalar-function library (SURVEY.md §2.4 ops 25-36).

Every function appearing in the reference's 16 mapping queries, expressed
as JVM-side Column expressions (no Python UDFs — these all stay inside
whole-stage codegen). Functions that change the *term type* rather than
the string value (URI, STRLANG, typed-literal construction) return a
:class:`TermExpr` carrying the companion type/datatype/lang columns.

SPARQL error semantics — an unbound argument makes the result unbound —
map 1:1 onto Spark NULL propagation for this function set (SURVEY.md §2
op 20).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..terms import IRI, LITERAL, XSD_STRING


@dataclass
class TermExpr:
    """A term-valued expression: value column + term-type metadata columns."""

    value: Column
    type: Column
    datatype: Column
    lang: Column

    @staticmethod
    def literal_value(value: Column, datatype=None, lang=None) -> "TermExpr":
        return TermExpr(
            value,
            F.lit(LITERAL),
            F.lit(datatype).cast("string"),
            F.lit(lang).cast("string"),
        )


def uri(value: Column | str) -> TermExpr:
    """``URI(...)`` / ``IRI(...)`` — tag a string as an IRI term
    (reference sparql/ldap_mapping_org.sparql:38 and every entity-minting
    BIND). A term-type change, not a string op (SURVEY.md §2 op 27)."""
    v = F.lit(value) if isinstance(value, str) else value
    return TermExpr(v, F.lit(IRI), F.lit(None).cast("string"), F.lit(None).cast("string"))


def strlang(value: Column, tag: str) -> TermExpr:
    """``STRLANG(s, tag)`` — language-tagged literal
    (reference sparql/tl_users_mapping.sparql:45)."""
    return TermExpr(value, F.lit(LITERAL), F.lit(None).cast("string"), F.lit(tag))


def typed_literal(value: Column, datatype: str) -> TermExpr:
    """``"..."^^xsd:T`` constructor (reference sparql/ldap_mapping_org.sparql:25,
    tl_companies_mapping_overlay.sparql:48-49)."""
    dt = None if datatype == XSD_STRING else datatype
    return TermExpr(
        value, F.lit(LITERAL), F.lit(dt).cast("string"), F.lit(None).cast("string")
    )


# -- plain string/value functions (return Column) --------------------------

concat = F.concat  # SPARQL CONCAT: NULL-in → NULL-out, same as Spark concat
md5 = F.md5  # both produce lowercase hex
lcase = F.lower
ucase = F.upper


def iif(cond: Column, then, otherwise) -> Column:
    """SPARQL ``IF(cond, a, b)`` (reference tl_companies_mapping_org.sparql:54).

    A NULL condition (an unbound-variable SPARQL *error*) yields NULL —
    the whole expression errors and the BIND leaves the variable unbound —
    NOT the else-branch: ``when(cond, a).otherwise(b)`` alone would route
    error to ``b`` and mint extra wrong values. The reference workload
    only conditions on ``BOUND(...)`` (never NULL), so its outputs are
    unchanged."""
    return F.when(cond, then).otherwise(F.when(~cond, otherwise))


def bound(col: Column) -> Column:
    """``BOUND(?v)`` — unbound SPARQL variables surface as NULL columns
    after OPTIONAL (left join), so BOUND is a null check
    (reference tl_companies_mapping_overlay.sparql:48-49)."""
    return col.isNotNull()


def strstarts(col: Column, prefix: str) -> Column:
    """``STRSTARTS(s, pre)`` (reference tl_companies_mapping_org.sparql:54)."""
    return col.startswith(prefix)


def replace(col: Column, pattern: str, replacement: str) -> Column:
    """SPARQL ``REPLACE`` is regex-based (reference
    tl_companies_mapping_classification.sparql:38 replaces ``' '``)."""
    return F.regexp_replace(col, pattern, replacement)


def strafter(col: Column, sep: str) -> Column:
    """``STRAFTER(s, sep)`` — substring after the FIRST occurrence of the
    separator; empty string when absent. NOT ``substring_index(s, sep, -1)``
    (SURVEY.md §2 op 34 gotcha; reference
    tl_companies_mapping_classification.sparql:38 uses ``' - '``)."""
    pos = F.instr(col, sep)
    return F.when(
        pos > 0, F.substring(col, pos + len(sep), F.length(col))
    ).otherwise(F.when(col.isNotNull(), F.lit("")))


def strbefore(col: Column, sep: str) -> Column:
    """``STRBEFORE`` — counterpart of strafter (not used by the reference
    workload but part of the same family)."""
    pos = F.instr(col, sep)
    return F.when(pos > 0, F.substring(col, F.lit(1), pos - 1)).otherwise(
        F.when(col.isNotNull(), F.lit(""))
    )


def encode_for_uri(col: Column) -> Column:
    """``ENCODE_FOR_URI`` — RFC 3986 percent-encoding: space → ``%20``,
    unreserved ``A-Za-z0-9-_.~`` kept. Spark's ``url_encode`` is
    application/x-www-form-urlencoded (space → ``+``, ``~`` → ``%7E``),
    so wrap it (SURVEY.md §2 op 35 gotcha; reference
    tl_users_mapping.sparql:47)."""
    enc = F.url_encode(col)
    enc = F.regexp_replace(enc, r"\+", "%20")
    enc = F.regexp_replace(enc, r"%7E", "~")
    enc = F.regexp_replace(enc, r"\*", "%2A")
    return enc
