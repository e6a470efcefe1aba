"""SERVICE federation (SPARQL 1.1 Federated Query over registered local
stores): cross-store joins, SILENT semantics, OPTIONAL-wrapped SERVICE,
and the parse-time rejection of variable endpoints."""

import pytest

from knowledge_graph_etl_spark import federation
from knowledge_graph_etl_spark.engine import Engine


@pytest.fixture()
def engines(spark):
    """Local store: people; remote store: their emails (one missing)."""
    local = Engine(spark)
    local.store.insert_data(
        [
            ("urn:g:l", "urn:p:alice", "iri", "urn:pred:name", "Alice", "literal", None, None),
            ("urn:g:l", "urn:p:bob", "iri", "urn:pred:name", "Bob", "literal", None, None),
            ("urn:g:l", "urn:p:carol", "iri", "urn:pred:name", "Carol", "literal", None, None),
        ]
    )
    remote = Engine(spark)
    remote.store.insert_data(
        [
            ("urn:g:r", "urn:p:alice", "iri", "urn:pred:email", "a@x.io", "literal", None, None),
            ("urn:g:r", "urn:p:bob", "iri", "urn:pred:email", "b@x.io", "literal", None, None),
        ]
    )
    local.register_service("urn:svc:emails", remote)
    yield local, remote
    federation.unregister_service("urn:svc:emails")


def test_service_cross_store_join(engines):
    local, _ = engines
    got = {
        (r["n"], r["e"])
        for r in local.select(
            "SELECT ?n ?e WHERE { ?p <urn:pred:name> ?n . "
            "SERVICE <urn:svc:emails> { ?p <urn:pred:email> ?e } }"
        ).collect()
    }
    assert got == {("Alice", "a@x.io"), ("Bob", "b@x.io")}  # carol: no email


def test_service_inside_optional(engines):
    local, _ = engines
    got = {
        (r["n"], r["e"])
        for r in local.select(
            "SELECT ?n ?e WHERE { ?p <urn:pred:name> ?n . "
            "OPTIONAL { SERVICE <urn:svc:emails> { ?p <urn:pred:email> ?e } } }"
        ).collect()
    }
    assert got == {("Alice", "a@x.io"), ("Bob", "b@x.io"), ("Carol", None)}


def test_service_silent_unknown_endpoint_is_unit(engines):
    local, _ = engines
    got = {
        r["n"]
        for r in local.select(
            "SELECT ?n WHERE { ?p <urn:pred:name> ?n . "
            "SERVICE SILENT <urn:svc:missing> { ?p <urn:pred:email> ?e } }"
        ).collect()
    }
    assert got == {"Alice", "Bob", "Carol"}  # unit solution: outer unchanged


def test_service_unknown_endpoint_errors(engines):
    local, _ = engines
    with pytest.raises(KeyError, match="urn:svc:missing"):
        local.select(
            "SELECT ?n WHERE { SERVICE <urn:svc:missing> { ?p <urn:pred:name> ?n } }"
        )


def test_service_variable_endpoint_rejected(engines):
    local, _ = engines
    with pytest.raises(SyntaxError, match="variable endpoint"):
        local.select("SELECT ?n WHERE { SERVICE ?ep { ?p <urn:pred:name> ?n } }")


def test_service_only_group(engines):
    """A group consisting solely of a SERVICE block — solutions come
    entirely from the remote store."""
    local, _ = engines
    got = {
        r["e"]
        for r in local.select(
            "SELECT ?e WHERE { SERVICE <urn:svc:emails> { ?p <urn:pred:email> ?e } }"
        ).collect()
    }
    assert got == {"a@x.io", "b@x.io"}


def test_service_callable_resolver(spark):
    """The escape-hatch registration: a zero-arg callable returning a
    quads DataFrame stands in for a store."""
    local = Engine(spark)
    local.store.insert_data(
        [("urn:g:l", "urn:p:d", "iri", "urn:pred:name", "Dave", "literal", None, None)]
    )
    quads = spark.createDataFrame(
        [("urn:g:x", "urn:p:d", "iri", "urn:pred:age", "41", "literal",
          "http://www.w3.org/2001/XMLSchema#integer", None)],
        "g string, s string, s_type string, p string, o_value string, "
        "o_type string, o_datatype string, o_lang string",
    )
    federation.register_service("urn:svc:ages", lambda: quads)
    try:
        got = [
            (r["n"], r["a"])
            for r in local.select(
                "SELECT ?n ?a WHERE { ?p <urn:pred:name> ?n . "
                "SERVICE <urn:svc:ages> { ?p <urn:pred:age> ?a } }"
            ).collect()
        ]
        assert got == [("Dave", "41")]
    finally:
        federation.unregister_service("urn:svc:ages")


def test_service_registry_is_engine_scoped(spark):
    """ADVICE r04: Engine.register_service must NOT leak across engines —
    a SERVICE IRI registered on engine A is invisible to engine B (B sees
    KeyError non-silent, the unit solution under SILENT), while the
    module-level federation.register_service remains the documented
    process-global fallback."""
    import pytest

    from knowledge_graph_etl_spark import federation
    from knowledge_graph_etl_spark.engine import Engine

    remote = Engine(spark)
    remote.store.insert_data(
        [("urn:g:r", "urn:n:a", "iri", "urn:pred:v", "1", "literal", None, None)]
    )
    a = Engine(spark)
    b = Engine(spark)
    a.register_service("urn:svc:scoped", remote)
    q = "SELECT ?s ?v WHERE { SERVICE <urn:svc:scoped> { ?s <urn:pred:v> ?v } }"
    assert {(r["s"], r["v"]) for r in a.select(q).collect()} == {("urn:n:a", "1")}
    with pytest.raises(KeyError):
        b.select(q)
    # SILENT in the unregistered engine -> unit solution (no rows dropped,
    # nothing joined): the outer pattern alone
    b.store.insert_data(
        [("urn:g:b", "urn:n:x", "iri", "urn:pred:w", "2", "literal", None, None)]
    )
    got = b.select(
        "SELECT ?s WHERE { ?s <urn:pred:w> ?w . "
        "SERVICE SILENT <urn:svc:scoped> { ?s <urn:pred:v> ?v } }"
    )
    assert [r["s"] for r in got.collect()] == ["urn:n:x"]
    # module-level registration IS global: resolves in b too
    federation.register_service("urn:svc:global", remote)
    try:
        got = b.select(
            "SELECT ?v WHERE { SERVICE <urn:svc:global> { ?s <urn:pred:v> ?v } }"
        )
        assert [r["v"] for r in got.collect()] == ["1"]
    finally:
        federation.unregister_service("urn:svc:global")
    # unregister on the owning engine really removes it
    a.unregister_service("urn:svc:scoped")
    with pytest.raises(KeyError):
        a.select(q)


def test_http_shaped_resolver_contract(spark):
    """VERDICT r04 item 6: prove a resolver speaking the W3C
    SPARQL-protocol surface (query text in → SPARQL 1.1 Query Results
    JSON out) drops into SERVICE federation WITHOUT engine changes.

    The mock endpoint is a remote Engine exposed only through
    ``select_json`` (the protocol's response body — never its DataFrames);
    the client callable sends a quad-dump SELECT over the 'wire', parses
    the JSON bindings (type/value/datatype/xml:lang) back into quad rows,
    and returns them as the quads DataFrame the SERVICE contract expects.
    Lang-tagged and typed literals round-trip through the envelope."""
    from knowledge_graph_etl_spark.engine import Engine
    from knowledge_graph_etl_spark.terms import QUAD_SCHEMA

    remote = Engine(spark)
    remote.store.insert_data(
        [
            ("urn:g:r", "urn:n:alice", "iri", "urn:pred:label", "Alice",
             "literal", None, "en"),
            ("urn:g:r", "urn:n:alice", "iri", "urn:pred:age", "30", "literal",
             "http://www.w3.org/2001/XMLSchema#integer", None),
            ("urn:g:r", "urn:n:bob", "iri", "urn:pred:label", "Bob",
             "literal", None, "en"),
        ]
    )

    wire: list[str] = []

    def http_post(query: str) -> dict:
        """The mock network boundary: accepts SPARQL text, returns the
        W3C results-JSON envelope — exactly a SPARQL Protocol 'query'
        operation."""
        wire.append(query)
        return remote.select_json(query)

    def resolver():
        env = http_post("SELECT ?g ?s ?p ?o WHERE { GRAPH ?g { ?s ?p ?o } }")
        assert env["head"]["vars"] == ["g", "s", "p", "o"]
        tmap = {"uri": "iri", "literal": "literal", "bnode": "bnode"}
        rows = []
        for b in env["results"]["bindings"]:
            s, o = b["s"], b["o"]
            rows.append(
                (
                    b["g"]["value"],
                    s["value"],
                    tmap[s["type"]],
                    b["p"]["value"],
                    o["value"],
                    tmap[o["type"]],
                    o.get("datatype"),
                    o.get("xml:lang"),
                )
            )
        return spark.createDataFrame(rows, QUAD_SCHEMA)

    local = Engine(spark)
    local.store.insert_data(
        [
            ("urn:g:l", "urn:n:alice", "iri", "urn:pred:team", "data",
             "literal", None, None),
            ("urn:g:l", "urn:n:bob", "iri", "urn:pred:team", "infra",
             "literal", None, None),
        ]
    )
    local.register_service("urn:svc:http", resolver)
    got = {
        (r["team"], r["label"], r["age"])
        for r in local.select(
            """
            SELECT ?team ?label ?age WHERE {
                ?p <urn:pred:team> ?team .
                SERVICE <urn:svc:http> {
                    ?p <urn:pred:label> ?label .
                    OPTIONAL { ?p <urn:pred:age> ?age }
                }
                FILTER(LANG(?label) = "en")
            }
            """
        ).collect()
    }
    assert got == {("data", "Alice", "30"), ("infra", "Bob", None)}
    assert len(wire) == 1 and "SELECT" in wire[0]  # the protocol was used
