"""SPARQL 1.1 Query Results JSON Format (W3C) serialization.

The interop surface an engine needs so downstream SPARQL tooling can
consume SELECT/ASK results: https://www.w3.org/TR/sparql11-results-json/.
Input is the term-companion form produced by ``Engine.select(...,
with_terms=True)`` — each variable ``v`` with optional ``v__type`` /
``v__dt`` / ``v__lang`` companion columns (missing companions default the
term to a plain literal, matching the projection of computed columns).

Two shapes:

* :func:`bindings_json_lines` — DISTRIBUTED: one JSON text per solution
  (the ``bindings`` array elements), built entirely from Column
  expressions (``to_json`` over filtered maps, no Python row loop) — at
  scale, write these as a text file and wrap with the 2-line envelope.
* :func:`sparql_results_json` — driver-side full envelope dict
  (``{"head": {"vars": [...]}, "results": {"bindings": [...]}}``) for
  protocol responses; collects, so results must fit the driver.
* :func:`ask_results_json` — the boolean form for ASK.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .terms import BNODE, IRI

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _binding_variables(df: DataFrame) -> list[str]:
    return [c for c in df.columns if "__" not in c]


def _term_obj(df: DataFrame, v: str) -> Column:
    """One variable's W3C term object as a map<string,string> (entries
    with NULL values filtered out so to_json omits them)."""
    cols = set(df.columns)
    ttype = F.col(f"{v}__type") if f"{v}__type" in cols else F.lit(None).cast("string")
    dt = F.col(f"{v}__dt") if f"{v}__dt" in cols else F.lit(None).cast("string")
    lang = F.col(f"{v}__lang") if f"{v}__lang" in cols else F.lit(None).cast("string")
    kind = (
        F.when(ttype == IRI, F.lit("uri"))
        .when(ttype == BNODE, F.lit("bnode"))
        .otherwise(F.lit("literal"))
    )
    # the spec omits datatype for plain/xsd:string literals and uses
    # "xml:lang" for language tags; bnode values drop the "_:" prefix
    value = F.when(
        (ttype == BNODE) & F.col(v).startswith("_:"),
        F.expr(f"substring({v}, 3)"),
    ).otherwise(F.col(v).cast("string"))
    dt_out = F.when(
        (kind == "literal") & dt.isNotNull() & (dt != _XSD_STRING) & lang.isNull(),
        dt,
    )
    lang_out = F.when(kind == "literal", lang)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("value"), F.lit("datatype"), F.lit("xml:lang")),
        F.array(kind, value, dt_out, lang_out),
    )
    return F.map_filter(m, lambda _, val: val.isNotNull())


def bindings_json_lines(df: DataFrame) -> DataFrame:
    """→ one-column (``value``) DataFrame: each row the JSON object for
    one solution — unbound variables omitted per the spec."""
    variables = _binding_variables(df)
    outer = F.map_from_arrays(
        F.array(*[F.lit(v) for v in variables]),
        F.array(*[_term_obj(df, v) for v in variables]),
    )
    present = F.map_filter(
        outer, lambda k, _: F.coalesce(*[
            F.when(F.lit(v) == k, F.col(v).isNotNull()) for v in variables
        ])
    )
    return df.select(F.to_json(present).alias("value"))


def sparql_results_json(df: DataFrame) -> dict:
    """Full W3C envelope (driver-side): ``{"head": {"vars": [...]},
    "results": {"bindings": [...]}}``."""
    variables = _binding_variables(df)
    bindings = [
        json.loads(r["value"]) for r in bindings_json_lines(df).collect()
    ]
    return {"head": {"vars": variables}, "results": {"bindings": bindings}}


def ask_results_json(result: bool) -> dict:
    return {"head": {}, "boolean": bool(result)}


# ---------------------------------------------------------------------------
# CSV / TSV results (https://www.w3.org/TR/sparql11-results-csv-tsv/)
# ---------------------------------------------------------------------------


def plain_value_columns(df: DataFrame) -> DataFrame:
    """The CSV-format projection: one plain-string column per variable
    (IRIs bare, literal lexical forms, bnode labels without ``_:``,
    unbound → empty) — per spec, CSV is the LOSSY format; write at scale
    with ``df.write.csv(header=True)`` (Spark applies RFC-4180 quoting)."""
    variables = _binding_variables(df)
    cols = set(df.columns)
    out = []
    for v in variables:
        ttype = (
            F.col(f"{v}__type") if f"{v}__type" in cols else F.lit(None).cast("string")
        )
        val = F.when(
            (ttype == BNODE) & F.col(v).startswith("_:"),
            F.expr(f"substring({v}, 3)"),
        ).otherwise(F.col(v).cast("string"))
        out.append(F.coalesce(val, F.lit("")).alias(v))
    return df.select(*out)


def _tsv_term(df: DataFrame, v: str) -> Column:
    """Full SPARQL-syntax term for the TSV format: ``<iri>``, ``_:label``,
    ``"lex"@lang`` / ``"lex"^^<dt>``; unbound → empty string."""
    cols = set(df.columns)
    ttype = F.col(f"{v}__type") if f"{v}__type" in cols else F.lit(None).cast("string")
    dt = F.col(f"{v}__dt") if f"{v}__dt" in cols else F.lit(None).cast("string")
    lang = F.col(f"{v}__lang") if f"{v}__lang" in cols else F.lit(None).cast("string")
    lex = F.regexp_replace(F.col(v).cast("string"), r"\\", r"\\\\")
    lex = F.regexp_replace(lex, '"', '\\\\"')
    lex = F.regexp_replace(lex, "\n", r"\\n")
    lex = F.regexp_replace(lex, "\r", r"\\r")
    lex = F.regexp_replace(lex, "\t", r"\\t")
    quoted = F.concat(F.lit('"'), lex, F.lit('"'))
    lit_form = (
        F.when(lang.isNotNull(), F.concat(quoted, F.lit("@"), lang))
        .when(
            dt.isNotNull() & (dt != _XSD_STRING),
            F.concat(quoted, F.lit("^^<"), dt, F.lit(">")),
        )
        .otherwise(quoted)
    )
    bnode_label = F.when(F.col(v).startswith("_:"), F.col(v)).otherwise(
        F.concat(F.lit("_:"), F.col(v))
    )
    return F.coalesce(
        F.when(ttype == IRI, F.concat(F.lit("<"), F.col(v), F.lit(">")))
        .when(ttype == BNODE, bnode_label)
        .when(F.col(v).isNotNull(), lit_form),
        F.lit(""),
    )


def tsv_lines(df: DataFrame) -> DataFrame:
    """Distributed TSV body: one tab-joined line per solution (the header
    line ``?v1\\t?v2`` is the caller's single prepend — see
    :func:`sparql_results_tsv` for the driver-side whole-document form)."""
    variables = _binding_variables(df)
    return df.select(
        F.concat_ws("\t", *[_tsv_term(df, v) for v in variables]).alias("value")
    )


def sparql_results_tsv(df: DataFrame) -> str:
    """Whole TSV document (driver-side): header + one line per solution."""
    variables = _binding_variables(df)
    header = "\t".join("?" + v for v in variables)
    body = [r["value"] for r in tsv_lines(df).collect()]
    return "\n".join([header, *body]) + "\n"


def sparql_results_csv(df: DataFrame) -> str:
    """Whole CSV document (driver-side), RFC-4180 quoting via csv module."""
    import csv
    import io

    variables = _binding_variables(df)
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n")
    w.writerow(variables)
    for r in plain_value_columns(df).collect():
        w.writerow([r[v] for v in variables])
    return buf.getvalue()
