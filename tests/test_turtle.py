"""Turtle source (SURVEY.md §2 op 3 — rdflib-autodetect parity,
reference sparql_update.py:124-133)."""

import pytest

from knowledge_graph_etl_spark.sources.turtle import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    parse_turtle,
    read_rdf,
    read_turtle,
)

TTL = """\
@prefix org: <http://www.w3.org/ns/org#> .
@prefix schema: <https://schema.org/> .
@prefix : <http://example.org/> .

:o1 a org:Organization ;
    schema:name "meemoo"@nl , "meemoo EN"@en ;
    schema:identifier "OR-abc123" ;
    org:classification :cls1 .

:o2 schema:name "Quoted \\"name\\"" ;
    schema:description '''multi
line''' ;
    schema:position 4.5 ;
    schema:rank 7 ;
    schema:score 1.5e2 ;
    schema:active true .

:o3 schema:address [ schema:streetAddress "Ham 175" ; schema:postalCode "9000" ] .

_:labeled schema:name "bnode subject" .
"""


def tset(triples):
    return {t for t in triples}


def test_parse_basic_star_and_lists():
    out = parse_turtle(TTL)
    s = tset(out)
    assert ("http://example.org/o1", "iri", RDF_TYPE,
            "http://www.w3.org/ns/org#Organization", "iri", None, None) in s
    assert ("http://example.org/o1", "iri", "https://schema.org/name",
            "meemoo", "literal", None, "nl") in s
    assert ("http://example.org/o1", "iri", "https://schema.org/name",
            "meemoo EN", "literal", None, "en") in s
    assert ("http://example.org/o1", "iri", "https://schema.org/identifier",
            "OR-abc123", "literal", None, None) in s
    assert ("http://example.org/o1", "iri", "http://www.w3.org/ns/org#classification",
            "http://example.org/cls1", "iri", None, None) in s


def test_parse_literal_abbreviations():
    s = tset(parse_turtle(TTL))
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert ("http://example.org/o2", "iri", "https://schema.org/position",
            "4.5", "literal", xsd + "decimal", None) in s
    assert ("http://example.org/o2", "iri", "https://schema.org/rank",
            "7", "literal", xsd + "integer", None) in s
    assert ("http://example.org/o2", "iri", "https://schema.org/score",
            "1.5e2", "literal", xsd + "double", None) in s
    assert ("http://example.org/o2", "iri", "https://schema.org/active",
            "true", "literal", xsd + "boolean", None) in s
    assert ("http://example.org/o2", "iri", "https://schema.org/description",
            "multi\nline", "literal", None, None) in s
    assert ("http://example.org/o2", "iri", "https://schema.org/name",
            'Quoted "name"', "literal", None, None) in s


def test_parse_bnodes_scoped_and_linked():
    out = parse_turtle(TTL, bnode_scope="f1")
    addr = [t for t in out if t[2] == "https://schema.org/address"]
    assert len(addr) == 1 and addr[0][4] == "bnode"
    bn = addr[0][3]
    assert bn.startswith("tf1_")
    props = {t[2]: t[3] for t in out if t[0] == bn}
    assert props == {
        "https://schema.org/streetAddress": "Ham 175",
        "https://schema.org/postalCode": "9000",
    }
    labeled = [t for t in out if t[3] == "bnode subject"]
    assert labeled[0][0] == "tf1_ulabeled" and labeled[0][1] == "bnode"


def test_parse_collection():
    out = parse_turtle(
        "@prefix : <http://e/> . :s :order ( :a :b ) ."
    )
    firsts = [t for t in out if t[2] == RDF_FIRST]
    rests = [t for t in out if t[2] == RDF_REST]
    assert {t[3] for t in firsts} == {"http://e/a", "http://e/b"}
    assert len(rests) == 2 and any(t[3] == RDF_NIL for t in rests)


def test_parse_base_and_sparql_directives():
    out = parse_turtle(
        "BASE <http://base.org/x/>\nPREFIX p: <http://p/>\n"
        "<rel> p:q <http://abs/> ."
    )
    assert out[0][0] == "http://base.org/x/rel"
    assert out[0][3] == "http://abs/"


def test_read_turtle_distributed(spark, tmp_path):
    d = tmp_path / "ttl"
    d.mkdir()
    (d / "a.ttl").write_text(TTL, encoding="utf-8")
    (d / "b.ttl").write_text(
        "@prefix s: <https://schema.org/> .\n[] s:name \"anon in b\" .\n",
        encoding="utf-8",
    )
    df = read_turtle(spark, str(d), "urn:g:ttl")
    rows = df.collect()
    assert all(r["g"] == "urn:g:ttl" for r in rows)
    got = {(r["s"], r["p"], r["o_value"]) for r in rows}
    assert ("http://example.org/o1", "https://schema.org/identifier", "OR-abc123") in got
    # bnode labels from different files can never collide (per-file scope)
    anon = [r for r in rows if r["o_value"] == "anon in b"]
    assert len(anon) == 1 and anon[0]["s_type"] == "bnode"
    a_bnodes = {r["s"] for r in rows if r["s_type"] == "bnode" and r["o_value"] == "bnode subject"}
    assert not (a_bnodes & {anon[0]["s"]})


def test_read_rdf_autodetect(spark, tmp_path):
    p = tmp_path / "x.ttl"
    p.write_text("@prefix s: <https://schema.org/> . <http://e/1> s:name \"n\" .",
                 encoding="utf-8")
    df = read_rdf(spark, str(p), "urn:g:auto")
    assert df.count() == 1
    with pytest.raises(ValueError):
        read_rdf(spark, "/nope/file.xyz", "urn:g:auto")


def test_turtle_into_store_and_query(spark, tmp_path):
    """End-to-end: .ttl file → store → BGP pattern scan."""
    from knowledge_graph_etl_spark import BGP, GraphStore, Var

    p = tmp_path / "orgs.ttl"
    p.write_text(TTL, encoding="utf-8")
    store = GraphStore(spark)
    store.insert(read_turtle(spark, str(p), "urn:g:staging"),
                 target_graphs=["urn:g:staging"])
    b = BGP(store.graph("urn:g:staging"))
    b.pattern(Var("o"), RDF_TYPE, Var("cls"))
    b.pattern(Var("o"), "https://schema.org/identifier", Var("orid"))
    got = [(r["o"], r["orid"]) for r in b.df.select("o", "orid").collect()]
    assert got == [("http://example.org/o1", "OR-abc123")]
