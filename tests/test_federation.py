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
