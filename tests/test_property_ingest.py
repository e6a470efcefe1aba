"""Property-based tests for the JSON→triples direct mapping (SURVEY.md §5.2
item 5): random JSON documents (bounded depth/width, seeded) checked against
structural invariants derived from the reference's event-walk semantics
(reference parse_functions.py:48-105), plus Spark-vs-driver equivalence.

Invariants:
  * determinism — same document, same doc_id → identical triple sequence;
  * triple count — one triple per (a) JSON object reached with an active
    property and a live subject (the parent link, parse_functions.py:85-88)
    and (b) non-null scalar with an active property and a live subject
    (parse_functions.py:98-102); nulls and bare top-level scalars emit
    nothing (the documented divergences in ingest.py:20-34 only DROP
    triples whose reference behavior is an error/unserializable row);
  * blank-node in-degree — every minted node label appears as the object
    of exactly one parent-link triple, except root-level objects (in-degree
    0): the graph of bnode links is a forest (SURVEY.md §5.2);
  * distribution equivalence — ``json_to_quads`` (Arrow-batched
    mapInPandas) emits exactly the driver-side ``parse_document`` tuples.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.ingest import json_to_quads, parse_document
from knowledge_graph_etl_spark.terms import BNODE

# -- document strategy -------------------------------------------------------

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=12,
    ),
)

_keys = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6
)

json_docs = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_keys, children, max_size=4),
    ),
    max_leaves=30,
)


def _expected_triple_count(value, has_prop=False, has_subject=False) -> int:
    """Independent recursive walk mirroring the reference's counting rules.

    ``has_prop``: a map key (possibly an enclosing array's owning property)
    is active when this value starts. ``has_subject``: at least one object
    is open. Deliberately counts by STRUCTURE only — it does not model
    which property a post-object sibling scalar binds to, so it stays
    valid regardless of property save/restore details.
    """
    if isinstance(value, dict):
        n = 1 if (has_prop and has_subject) else 0  # parent link triple
        for v in value.values():
            n += _expected_triple_count(v, has_prop=True, has_subject=True)
        return n
    if isinstance(value, list):
        # arrays pass through the owning property to every element
        return sum(
            _expected_triple_count(v, has_prop=has_prop, has_subject=has_subject)
            for v in value
        )
    if value is None:
        return 0
    return 1 if (has_prop and has_subject) else 0


@settings(max_examples=200, deadline=None)
@given(doc=json_docs)
def test_parse_document_deterministic(doc):
    a = list(parse_document(doc, "d1"))
    b = list(parse_document(doc, "d1"))
    assert a == b


@settings(max_examples=200, deadline=None)
@given(doc=json_docs)
def test_triple_count_matches_structure(doc):
    triples = list(parse_document(doc, "d1"))
    assert len(triples) == _expected_triple_count(doc)


@settings(max_examples=200, deadline=None)
@given(doc=json_docs)
def test_bnode_links_form_a_forest(doc):
    triples = list(parse_document(doc, "d1"))
    link_objects = [t[3] for t in triples if t[4] == BNODE]
    # each minted node is the object of at most one parent link (forest:
    # in-degree ≤ 1; roots have in-degree 0)...
    assert len(link_objects) == len(set(link_objects))
    # ...and every subject/link-object is a node label scoped to this doc
    # (labels _:b{doc_id}-{k} with k strictly increasing at mint time;
    # objects that emit no triples still advance k, so the only invariant
    # on k is the label format, not density)
    minted = {t[0] for t in triples} | set(link_objects)
    assert all(m.startswith("_:bd1-") and m[6:].isdigit() for m in minted)


@settings(max_examples=100, deadline=None)
@given(doc=json_docs)
def test_null_scalars_never_emit(doc):
    """Sanity: injecting nulls anywhere only ever removes triples."""
    triples = list(parse_document(doc, "d1"))
    assert len(triples) >= _expected_triple_count(_strip_scalars(doc))


def _strip_scalars(value):
    if isinstance(value, dict):
        return {k: _strip_scalars(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_strip_scalars(v) for v in value]
    return None


def test_spark_mapinpandas_matches_driver_walk(spark):
    """The distributed path (Arrow batches through mapInPandas) must emit
    exactly the driver-side generator's tuples — catches Arrow/pandas type
    coercion divergences (int widths, float formatting, empty batches)."""
    docs = [
        {},
        [],
        None,
        42,
        "bare",
        [1, 2, 3],
        [{"a": 1}, 2, None],
        {"a": None, "b": [None, {"c": False}]},
        {"deep": [[{"x": [{"y": [1.5, -2e12, "s"]}]}]]},
        {"big": 2**40, "neg": -(2**40), "f": 0.1, "t": True},
        {"unicode": "héllo wörld ☃", "empty": "", "ws": " \t"},
        {"arr": [[1, 2], [3], []], "obj": {"k": {"kk": "v"}}},
    ]
    rows = [(str(i), json.dumps(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, json string")
    got = {
        tuple(r)
        for r in json_to_quads(df, "urn:g:t", namespace="urn:p:").collect()
    }
    want = {
        ("urn:g:t", *t)
        for i, d in enumerate(docs)
        for t in parse_document(d, str(i), namespace="urn:p:")
    }
    assert got == want
