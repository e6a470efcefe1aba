"""Regression tests for the round-1 ADVICE findings.

1. N-Triples unescape ordering (backslash before control escapes).
2. PNAME PLX percent-escapes (realistic Airflow run ids in provenance).
3. CLEAR/DROP partition escaping must match Spark's on-disk Hive escaping.
4. INSERT DATA with blank-node property lists / explicit ``_:`` labels.
5. Constant plain-literal patterns use full term equality.
"""

import pytest

from knowledge_graph_etl_spark.engine import Engine
from knowledge_graph_etl_spark.mappings.pipeline import provenance_update
from knowledge_graph_etl_spark.operators.bgp import Var, pattern
from knowledge_graph_etl_spark.plans.parser import BNodeT, IriT, parse_update
from knowledge_graph_etl_spark.sources import read_ntriples, write_ntriples
from knowledge_graph_etl_spark.store import GraphStore
from knowledge_graph_etl_spark.terms import Term


# -- 1. unescape order -------------------------------------------------------

BACKSLASH_ROWS = [
    # backslash immediately followed by t/r/n/quote — the old two-pass
    # unescape turned '\' + 't' into a TAB
    ("urn:g:x", "urn:s:1", "iri", "urn:p:1", "a\\tb", "literal", None, None),
    ("urn:g:x", "urn:s:1", "iri", "urn:p:2", "a\\nb", "literal", None, None),
    ("urn:g:x", "urn:s:1", "iri", "urn:p:3", "\\\\t", "literal", None, None),
    ("urn:g:x", "urn:s:1", "iri", "urn:p:4", "end\\", "literal", None, None),
    ("urn:g:x", "urn:s:1", "iri", "urn:p:5", "mix\\t\tactual\ttab", "literal", None, None),
]


def test_ntriples_backslash_escape_round_trip(spark, tmp_path):
    store = GraphStore(spark)
    store.insert_data(BACKSLASH_ROWS)
    path = str(tmp_path / "bs.nt")
    write_ntriples(store.quads(), path)
    back = read_ntriples(spark, path, "urn:g:x")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in BACKSLASH_ROWS}


# -- 2. PNAME PLX ------------------------------------------------------------


def test_pname_percent_escape_parses():
    run_id = "scheduled__2024-01-01T00:00:00+00:00"
    text = provenance_update(
        run_id,
        "2024-01-01T00:00:00+00:00",
        ["urn:src:a"],
        "urn:res:r",
        "urn:g:prov",
    )
    node = parse_update(text)
    subjects = {q[1].s.value for q in node.quads if isinstance(q[1].s, IriT)}
    # %XX stays verbatim in the minted IRI (SPARQL PN_LOCAL PLX)
    assert any("scheduled__2024-01-01T00%3A00%3A00%2B00%3A00" in s for s in subjects)


def test_pname_backslash_escape_drops_backslash():
    node = parse_update(
        "PREFIX : <urn:x:> INSERT DATA { GRAPH <urn:g> { :a\\~b <urn:p> :o } }"
    )
    assert node.quads[0][1].s.value == "urn:x:a~b"


def test_provenance_runs_end_to_end(spark):
    engine = Engine(spark)
    engine.update(
        provenance_update(
            "scheduled__2024-01-01T00:00:00+00:00",
            "2024-01-01T00:00:00+00:00",
            ["urn:src:a", "urn:src:b"],
            "urn:res:r",
            "urn:g:prov",
        )
    )
    rows = engine.store.graph("urn:g:prov").collect()
    assert len(rows) == 8  # 2 derivedFrom + generatedBy + 2 types + generated/used/started
    assert any("%3A" in r["s"] for r in rows)


# -- 3. partition escaping ---------------------------------------------------

TRICKY_GRAPHS = [
    "urn:g:with space",
    "urn:g:plus+comma,paren(1)~tilde",
    "urn:g:percent%20literal",
]


@pytest.mark.parametrize("g", TRICKY_GRAPHS)
def test_clear_removes_tricky_graph_names(spark, tmp_path, g):
    store = GraphStore(spark, str(tmp_path / "q"))
    store.insert_data([(g, "urn:s:1", "iri", "urn:p:x", "v", "literal", None, None)])
    assert store.graph(g).count() == 1
    assert store.list_graphs() == [g]
    store.clear(g)
    assert store.graph(g).count() == 0
    assert store.list_graphs() == []


# -- 4. INSERT DATA bnodes ---------------------------------------------------


def test_insert_data_bnode_property_list(spark):
    engine = Engine(spark)
    engine.update(
        """
        PREFIX s: <urn:s:>
        INSERT DATA { GRAPH <urn:g:b> {
            s:x s:addr [ s:city "Gent"; s:zip "9000" ] .
            _:n1 s:note "label form" .
        } }
        """
    )
    rows = {(r["s"], r["s_type"], r["p"], r["o_value"], r["o_type"]) for r in
            engine.store.graph("urn:g:b").collect()}
    bnode_ids = {s for (s, st, _, _, _) in rows if st == "bnode"}
    assert len(bnode_ids) == 2  # the [] node and _:n1
    # the [] node is linked from s:x and carries both properties
    assert any(p == "urn:s:addr" and ot == "bnode" for (_, _, p, _, ot) in rows)
    assert {p for (s, st, p, _, _) in rows if st == "bnode"} == {
        "urn:s:city",
        "urn:s:zip",
        "urn:s:note",
    }


def test_insert_data_bnode_parses_to_bnodet():
    node = parse_update(
        "INSERT DATA { GRAPH <urn:g> { [ <urn:p> \"v\" ] . _:z <urn:q> \"w\" } }"
    )
    kinds = {type(q[1].s) for q in node.quads}
    assert kinds == {BNodeT}


# -- 5. literal term equality ------------------------------------------------


def test_plain_literal_pattern_excludes_typed_and_tagged(spark):
    store = GraphStore(spark)
    store.insert_data(
        [
            ("urn:g:t", "urn:s:1", "iri", "urn:p:x", "x", "literal", None, None),
            ("urn:g:t", "urn:s:2", "iri", "urn:p:x", "x", "literal", None, "nl"),
            (
                "urn:g:t", "urn:s:3", "iri", "urn:p:x", "x", "literal",
                "http://www.w3.org/2001/XMLSchema#token", None,
            ),
            (
                "urn:g:t", "urn:s:4", "iri", "urn:p:x", "x", "literal",
                "http://www.w3.org/2001/XMLSchema#string", None,
            ),
        ]
    )
    got = {r["s"] for r in pattern(store.quads(), Var("s"), "urn:p:x", "x").collect()}
    # plain "x" matches the plain literal and the RDF 1.1-equivalent
    # xsd:string form only
    assert got == {"urn:s:1", "urn:s:4"}
    tagged = {
        r["s"]
        for r in pattern(
            store.quads(), Var("s"), "urn:p:x", Term("x", "literal", None, "nl")
        ).collect()
    }
    assert tagged == {"urn:s:2"}
