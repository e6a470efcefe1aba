"""N-Triples sink/source round-trip (SURVEY.md §2 ops 3, 5)."""

from knowledge_graph_etl_spark.sources import read_ntriples, to_ntriples_lines, write_ntriples
from knowledge_graph_etl_spark.store import GraphStore
from knowledge_graph_etl_spark.terms import XSD_BOOLEAN, XSD_INTEGER, term_to_nt

ROWS = [
    ("urn:g:x", "http://e/s1", "iri", "http://p/1", "http://e/o1", "iri", None, None),
    ("urn:g:x", "_:b0-1", "bnode", "http://p/2", "plain lit", "literal", None, None),
    ("urn:g:x", "http://e/s1", "iri", "http://p/3", "true", "literal", XSD_BOOLEAN, None),
    ("urn:g:x", "http://e/s1", "iri", "http://p/4", "42", "literal", XSD_INTEGER, None),
    ("urn:g:x", "http://e/s1", "iri", "http://p/5", "taal", "literal", None, "nl"),
    ("urn:g:x", "http://e/s1", "iri", "http://p/6", 'q"uote\\back\nline\ttab', "literal", None, None),
    ("urn:g:x", "http://e/s1", "iri", "http://p/7", "_:b0-9", "bnode", None, None),
]


def test_lines_match_python_serializer(spark):
    store = GraphStore(spark)
    store.insert_data(ROWS)
    got = sorted(r["value"] for r in to_ntriples_lines(store.quads()).collect())
    want = sorted(
        f"{term_to_nt(s, st)} <{p}> {term_to_nt(ov, ot, dt, lg)} ."
        for (_, s, st, p, ov, ot, dt, lg) in ROWS
    )
    assert got == want


def test_round_trip(spark, tmp_path):
    store = GraphStore(spark)
    store.insert_data(ROWS)
    path = str(tmp_path / "out.nt")
    write_ntriples(store.quads(), path)
    back = read_ntriples(spark, path, "urn:g:x")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ROWS}
