"""RDF/XML source (sources/rdfxml.py): parser unit tests + distributed
reader round trip — completes the reference's ``insert_file`` format
autodetect (sparql_update.py:124-133)."""

from __future__ import annotations

import pytest

from knowledge_graph_etl_spark.sources.rdfxml import (
    RDF_NS,
    parse_rdfxml,
    read_rdfxml,
)
from knowledge_graph_etl_spark.sources.turtle import read_rdf

FOAF = "http://xmlns.com/foaf/0.1/"

DOC = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:foaf="{FOAF}"
         xml:base="http://example.org/">
  <foaf:Person rdf:about="alice" foaf:nick="al">
    <foaf:name xml:lang="en">Alice</foaf:name>
    <foaf:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">31</foaf:age>
    <foaf:knows rdf:resource="bob"/>
    <foaf:homepage rdf:resource="http://alice.example/"/>
  </foaf:Person>
  <rdf:Description rdf:about="bob">
    <foaf:name>Bob</foaf:name>
  </rdf:Description>
</rdf:RDF>
"""


def tset(triples):
    return {tuple(t) for t in triples}


def test_typed_node_about_attrs_datatype_lang():
    got = tset(parse_rdfxml(DOC))
    a = "http://example.org/alice"
    assert (a, "iri", RDF_NS + "type", FOAF + "Person", "iri", None, None) in got
    assert (a, "iri", FOAF + "nick", "al", "literal", None, None) in got
    assert (a, "iri", FOAF + "name", "Alice", "literal", None, "en") in got
    assert (
        a, "iri", FOAF + "age", "31", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", None,
    ) in got
    assert (a, "iri", FOAF + "knows", "http://example.org/bob", "iri", None, None) in got
    assert (
        "http://example.org/bob", "iri", FOAF + "name", "Bob", "literal", None, None
    ) in got
    assert len(got) == 7


def test_nested_node_and_nodeid():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:f="{FOAF}">
      <rdf:Description rdf:about="urn:s">
        <f:knows><f:Person rdf:nodeID="b1"><f:name>X</f:name></f:Person></f:knows>
        <f:likes rdf:nodeID="b1"/>
      </rdf:Description>
    </rdf:RDF>"""
    got = parse_rdfxml(doc)
    by_p = {t[2]: t for t in got}
    knows = by_p[FOAF + "knows"]
    likes = by_p[FOAF + "likes"]
    # both references resolve to the SAME labeled bnode
    assert knows[3] == likes[3] and knows[4] == "bnode"
    assert (knows[3], "bnode", FOAF + "name", "X", "literal", None, None) in tset(got)


def test_parsetype_resource_and_li():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:f="{FOAF}">
      <rdf:Description rdf:about="urn:s">
        <f:addr rdf:parseType="Resource"><f:city>Gent</f:city></f:addr>
        <rdf:li>one</rdf:li>
        <rdf:li>two</rdf:li>
      </rdf:Description>
    </rdf:RDF>"""
    got = tset(parse_rdfxml(doc))
    preds = {t[2] for t in got}
    assert RDF_NS + "_1" in preds and RDF_NS + "_2" in preds
    addr = next(t for t in got if t[2] == FOAF + "addr")
    assert addr[4] == "bnode"
    assert (addr[3], "bnode", FOAF + "city", "Gent", "literal", None, None) in got


def test_parsetype_collection():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:f="{FOAF}">
      <rdf:Description rdf:about="urn:s">
        <f:list rdf:parseType="Collection">
          <rdf:Description rdf:about="urn:a"/>
          <rdf:Description rdf:about="urn:b"/>
        </f:list>
      </rdf:Description>
    </rdf:RDF>"""
    got = parse_rdfxml(doc)
    firsts = [t for t in got if t[2] == RDF_NS + "first"]
    rests = [t for t in got if t[2] == RDF_NS + "rest"]
    assert [t[3] for t in firsts] == ["urn:a", "urn:b"]
    assert rests[-1][3] == RDF_NS + "nil"
    # chain links: s -> cell1 -> cell2
    head = next(t for t in got if t[2] == FOAF + "list")
    assert head[4] == "bnode"


def test_rdf_id_and_empty_literal():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:f="{FOAF}"
        xml:base="http://ex.org/doc">
      <rdf:Description rdf:ID="frag"><f:name></f:name></rdf:Description>
    </rdf:RDF>"""
    got = tset(parse_rdfxml(doc))
    assert ("http://ex.org/doc#frag", "iri", FOAF + "name", "", "literal", None, None) in got


def test_bare_root_node_element():
    doc = f'<f:Person xmlns:f="{FOAF}" xmlns:rdf="{RDF_NS}" rdf:about="urn:x"/>'
    got = tset(parse_rdfxml(doc))
    assert got == {("urn:x", "iri", RDF_NS + "type", FOAF + "Person", "iri", None, None)}


def test_read_rdfxml_and_autodetect(spark, tmp_path):
    p = tmp_path / "data.rdf"
    p.write_text(DOC)
    df = read_rdfxml(spark, str(p), "urn:g:x")
    rows = df.collect()
    assert len(rows) == 7
    assert all(r["g"] == "urn:g:x" for r in rows)
    auto = read_rdf(spark, str(p), "urn:g:x")
    assert {tuple(r) for r in auto.collect()} == {tuple(r) for r in rows}
    # .owl autodetects too
    p2 = tmp_path / "onto.owl"
    p2.write_text(DOC)
    assert read_rdf(spark, str(p2), "urn:g:y").count() == 7


def test_bnode_scoping_across_files(spark, tmp_path):
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:f="{FOAF}">
      <f:Person><f:name>A</f:name></f:Person>
    </rdf:RDF>"""
    d = tmp_path / "many"
    d.mkdir()
    (d / "f1.rdf").write_text(doc)
    (d / "f2.rdf").write_text(doc)
    df = read_rdfxml(spark, str(d), "urn:g:m")
    subs = {r["s"] for r in df.collect()}
    # two files × one anonymous node each — labels must NOT collide
    assert len(subs) == 2


def test_unnamespaced_element_rejected():
    with pytest.raises(SyntaxError, match="unnamespaced"):
        parse_rdfxml("<Description><name>x</name></Description>")
