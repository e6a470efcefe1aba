"""json_to_quads_variant (the JVM VARIANT level-walk) vs the walker:
byte-identical on sorted-key documents without the two documented
divergence shapes; deterministic relabel-equivalence otherwise."""

import json

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.ingest import json_to_quads
from knowledge_graph_etl_spark.ingest_variant import json_to_quads_variant


def _df(spark, docs):
    return spark.createDataFrame(
        [(str(i), json.dumps(d)) for i, d in enumerate(docs)],
        "doc_id string, json string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


SORTED_KEY_DOCS = [
    {"a": 1, "b": "x", "c": True, "d": None},
    {"a": {"b": {"c": 3}}, "z": [1, 2, 3]},
    {"a": [{"b": 1}, {"b": 2}], "c": "tail"},
    {"a": [[1, 2], [3]], "b": 0},
    {"a": [], "b": {}, "c": [{}, {}]},
    {"a": 1.5, "b": 0.125, "c": 123.25},
    {"a": "unicode ✓ \n tab\t", "b": ""},
    [1, 2, {"a": 3}],
    "bare top-level string",
    {"a": [{"x": 1}, 5]},
]


def test_variant_matches_walker_on_sorted_key_docs(spark):
    d = _df(spark, SORTED_KEY_DOCS)
    walker = json_to_quads(d, "urn:g")
    jvm = json_to_quads_variant(d, "urn:g")
    assert _rows(jvm) == _rows(walker)


def test_variant_matches_walker_instance_ns_and_src(spark):
    d = _df(spark, SORTED_KEY_DOCS[:5])
    walker = json_to_quads(
        d, "urn:g", instance_ns="urn:i:", src_col="src"
    )
    jvm = json_to_quads_variant(
        d, "urn:g", instance_ns="urn:i:", src_col="src"
    )
    assert _rows(jvm) == _rows(walker)


def test_variant_relabels_unsorted_keys_same_graph_shape(spark):
    """Unsorted keys: labels renumber (sorted-key DFS vs insertion DFS)
    but the graph is identical up to that relabeling — same multiset of
    (p, o_value) per subject-degree profile and same triple count."""
    docs = [{"z": {"k": 1}, "a": {"k": 2}}]
    d = _df(spark, docs)
    walker = json_to_quads(d, "urn:g")
    jvm = json_to_quads_variant(d, "urn:g")
    wr, jr = walker.collect(), jvm.collect()
    assert len(wr) == len(jr)
    strip = lambda rows: sorted(  # noqa: E731
        (r["p"], r["o_value"] if r["o_type"] == "literal" else "<node>")
        for r in rows
    )
    assert strip(wr) == strip(jr)
    # the divergence is REAL on this shape: the label→content pairing
    # differs (same label set, different nodes behind the labels)
    assert sorted(tuple(r) for r in wr) != sorted(tuple(r) for r in jr)


@pytest.mark.parametrize("bad", [[{"deep": True}]])
def test_variant_max_depth_guard(spark, bad):
    doc = {"a": 1}
    for _ in range(5):
        doc = {"w": doc}
    d = _df(spark, [doc])
    with pytest.raises(ValueError):
        json_to_quads_variant(d, "urn:g", max_depth=3)
    assert json_to_quads_variant(d, "urn:g", max_depth=10).count() == 6


def test_variant_hypothesis_like_shapes(spark):
    """A deterministic sweep of generator-style documents (sorted keys,
    lists of scalars or lists of objects, no list-in-list, doubles in
    the [1e-3, 1e7) band) — byte-identical to the walker on all."""
    import itertools

    scalars = [0, -7, 2**40, "s", "", True, False, None, 1.5, 999999.5]
    docs = []
    for i, (a, b) in enumerate(itertools.product(scalars, repeat=2)):
        docs.append(
            {
                "k0": a,
                "k1": [b, a],
                "k2": {"m": b, "n": [{"p": a}, {"p": b}]},
            }
        )
    d = _df(spark, docs)
    walker = json_to_quads(d, "urn:g")
    jvm = json_to_quads_variant(d, "urn:g")
    assert _rows(jvm) == _rows(walker)
