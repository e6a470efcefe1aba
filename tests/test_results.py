"""W3C SPARQL 1.1 Query Results JSON Format serialization (results.py)."""

from knowledge_graph_etl_spark.engine import Engine
from knowledge_graph_etl_spark.results import ask_results_json


def _engine(spark):
    e = Engine(spark)
    e.store.insert_data(
        [
            ("urn:g:r", "urn:s1", "iri", "urn:p:name", "Alice", "literal", None, None),
            ("urn:g:r", "urn:s1", "iri", "urn:p:greet", "bonjour", "literal", None, "fr"),
            ("urn:g:r", "urn:s1", "iri", "urn:p:age", "41", "literal",
             "http://www.w3.org/2001/XMLSchema#integer", None),
            ("urn:g:r", "urn:s2", "iri", "urn:p:name", "Bob", "literal", None, None),
            ("urn:g:r", "_:b1", "bnode", "urn:p:name", "Anon", "literal", None, None),
        ]
    )
    return e


def test_select_json_term_forms(spark):
    """uri / plain-literal / lang / typed-literal / bnode term objects,
    spec-shaped: datatype omitted for plain strings, xml:lang for tags,
    bnode values without the _: prefix."""
    out = _engine(spark).select_json(
        "SELECT ?s ?o FROM <urn:g:r> WHERE { ?s ?pred ?o } ORDER BY ?s ?o"
    )
    assert out["head"]["vars"] == ["s", "o"]
    b = out["results"]["bindings"]
    bys = {}
    for row in b:
        bys.setdefault(row["s"]["value"] if row["s"]["type"] == "uri" else "bnode",
                       []).append(row["o"])
    assert {"type": "literal", "value": "Alice"} in bys["urn:s1"]
    assert {"type": "literal", "value": "bonjour", "xml:lang": "fr"} in bys["urn:s1"]
    assert {
        "type": "literal",
        "value": "41",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    } in bys["urn:s1"]
    assert all(r["s"]["type"] == "uri" for r in b if r["s"]["value"].startswith("urn:"))
    anon = [r["s"] for r in b if r["s"]["type"] == "bnode"]
    assert anon and all(not a["value"].startswith("_:") for a in anon)


def test_select_json_unbound_omitted(spark):
    """OPTIONAL-unbound variables are omitted from the binding object
    (per spec), not emitted as null."""
    out = _engine(spark).select_json(
        "SELECT ?s ?g FROM <urn:g:r> WHERE { ?s <urn:p:name> ?n . "
        "OPTIONAL { ?s <urn:p:greet> ?g } }"
    )
    got = {frozenset(row.keys()) for row in out["results"]["bindings"]}
    assert frozenset({"s", "g"}) in got      # s1 has a greeting
    assert frozenset({"s"}) in got           # s2 / anon do not -> g omitted


def test_ask_json(spark):
    e = _engine(spark)
    assert ask_results_json(
        e.ask("ASK FROM <urn:g:r> { ?s <urn:p:name> 'Alice' }")
    ) == {"head": {}, "boolean": True}
    assert ask_results_json(
        e.ask("ASK FROM <urn:g:r> { ?s <urn:p:name> 'Nobody' }")
    ) == {"head": {}, "boolean": False}


def test_tsv_full_syntax_terms(spark):
    from knowledge_graph_etl_spark.results import sparql_results_tsv

    e = _engine(spark)
    doc = sparql_results_tsv(
        e.select(
            "SELECT ?s ?o FROM <urn:g:r> WHERE { ?s <urn:p:age> ?o }",
            with_terms=True,
        )
    )
    lines = doc.strip().split("\n")
    assert lines[0] == "?s\t?o"
    assert lines[1] == (
        '<urn:s1>\t"41"^^<http://www.w3.org/2001/XMLSchema#integer>'
    )


def test_csv_plain_values_and_unbound(spark):
    from knowledge_graph_etl_spark.results import sparql_results_csv

    e = _engine(spark)
    doc = sparql_results_csv(
        e.select(
            "SELECT ?s ?g FROM <urn:g:r> WHERE { ?s <urn:p:name> ?n . "
            "OPTIONAL { ?s <urn:p:greet> ?g } } ORDER BY ?s",
            with_terms=True,
        )
    )
    rows = [r.split(",") for r in doc.strip().split("\r\n")]
    assert rows[0] == ["s", "g"]
    body = {tuple(r) for r in rows[1:]}
    assert ("urn:s1", "bonjour") in body     # IRI bare, literal lexical
    assert ("urn:s2", "") in body            # unbound -> empty cell
    # bnode label without the _: prefix
    assert any(not a.startswith("_:") and b == "" for a, b in body)
