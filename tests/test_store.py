"""GraphStore: set semantics, CLEAR/DROP, partition layout (SURVEY.md §1.3, §2 ops 11-13)."""

import pytest

from knowledge_graph_etl_spark.store import GraphStore

ROWS = [
    ("urn:g:a", "urn:s:1", "iri", "urn:p:x", "v1", "literal", None, None),
    ("urn:g:a", "urn:s:1", "iri", "urn:p:x", "v2", "literal", None, None),
    ("urn:g:b", "urn:s:2", "iri", "urn:p:y", "v1", "literal", None, None),
]


@pytest.fixture(params=["mem", "parquet"])
def store(request, spark, tmp_path):
    if request.param == "mem":
        return GraphStore(spark)
    return GraphStore(spark, str(tmp_path / "quads"))


def test_insert_and_graph_filter(store, spark):
    store.insert_data(ROWS)
    assert store.quads().count() == 3
    assert store.graph("urn:g:a").count() == 2
    assert set(store.dataset(["urn:g:a", "urn:g:b"]).select("g").distinct().toPandas()["g"]) == {
        "urn:g:a",
        "urn:g:b",
    }


def test_set_semantics_idempotent_insert(store):
    # triple-store dedup: re-inserting the same triples is a no-op
    store.insert_data(ROWS)
    store.insert_data(ROWS)
    assert store.quads().count() == 3
    store.insert_data(ROWS[:1] + [("urn:g:a", "urn:s:9", "iri", "urn:p:x", "v9", "literal", None, None)])
    assert store.quads().count() == 4


def test_clear_and_drop(store):
    store.insert_data(ROWS)
    store.clear("urn:g:a")
    assert store.graph("urn:g:a").count() == 0
    assert store.graph("urn:g:b").count() == 1
    # CLEAR SILENT on a missing graph: no error
    store.clear("urn:g:never")
    store.drop("urn:g:b")
    assert store.quads().count() == 0


def test_optimize_preserves_data(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "q"))
    store.insert_data(ROWS)
    before = {tuple(r) for r in store.quads().collect()}
    store.optimize()
    assert {tuple(r) for r in store.quads().collect()} == before


def test_list_graphs(store):
    store.insert_data(ROWS)
    assert store.list_graphs() == ["urn:g:a", "urn:g:b"]
