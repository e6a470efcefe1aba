"""Direct-mapping semantics (SURVEY.md §5.2 item 1, FIXTURES.md §A7).

Oracle: a minimal reimplementation of the reference's recursive event walk
(reference parse_functions.py:7-36 + 48-105) kept deliberately separate
from the engine's iterative implementation, so the two can disagree.
"""

import json

import pytest

from knowledge_graph_etl_spark.ingest import json_to_quads, parse_document
from knowledge_graph_etl_spark.terms import XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER

NS = "http://localhost/"


def oracle_triples(data, doc_id, namespace=NS):
    """Recursive-generator transliteration of reference semantics
    (parse_dict → _parse_events), with deterministic bnodes."""

    def events(d):
        if isinstance(d, dict):
            yield "start_map", None
            for k, v in d.items():
                yield "map_key", k
                yield from events(v)
            yield "end_map", None
        elif isinstance(d, list):
            yield "start_array", None
            for i in d:
                yield from events(i)
            yield "end_array", None
        elif d is None:
            yield "null", d
        elif isinstance(d, str):
            yield "string", d
        elif isinstance(d, bool):
            yield "boolean", d
        elif isinstance(d, int):
            yield "integer", d
        elif isinstance(d, float):
            yield "double", d

    stack, array_props, prop, i = [], {}, None, 0
    for event, value in events(data):
        if event == "start_array" and stack and prop is not None:
            array_props[stack[-1]] = prop
        if event == "end_array" and stack:
            array_props.pop(stack[-1], None)
        if event == "start_map":
            subject = f"_:b{doc_id}-{i}"
            i += 1
            if prop is not None and stack:
                yield (stack[-1], prop, subject, "bnode", None)
            stack.append(subject)
        if event == "end_map":
            stack.pop()
            if stack and stack[-1] in array_props:
                prop = array_props[stack[-1]]
        if event in ("boolean", "integer", "double"):
            if stack and prop is not None:  # engine's documented divergence guard
                if event == "boolean":
                    yield (stack[-1], prop, "true" if value else "false", "literal", XSD_BOOLEAN)
                elif event == "integer":
                    yield (stack[-1], prop, str(value), "literal", XSD_INTEGER)
                else:
                    yield (stack[-1], prop, str(value), "literal", XSD_DOUBLE)
        if event == "string" and prop is not None and stack:
            yield (stack[-1], prop, value, "literal", None)
        if event == "map_key":
            prop = namespace + value


def engine_triples(data, doc_id="0"):
    return [
        (s, p, ov, ot, dt) for (s, st, p, ov, ot, dt, lg) in parse_document(data, doc_id)
    ]


CASES = [
    {"a": None},                            # null → no triple
    {"a": [1, 2.5, True, "s"]},             # typed repeats
    {"a": {"b": {"c": 1}}},                 # bnode chain
    {"a": [{"b": 1}, {"b": 2}]},            # array of objects
    {"a": [[1, 2], [3]]},                   # nested arrays flatten
    {"a": [{"b": 1}, 2]},                   # array-property restore
    {},                                     # empty object
    [],                                     # empty array
    [{"x": 1}, {"y": "z"}],                 # top-level array of objects
    {"a": {"b": 1}, "c": 2},                # sibling after nested object
    {"attributes": {"objectClass": ["top", "organization"], "o": "OR-x"},
     "units": [{"attributes": {"ou": "u1", "n": 5}}]},  # ldap shape (FIXTURES.md §A2)
    {"custom_fields": [{"value": "ja", "definition": {"id": "cf-1"}},
                       {"value": "OR-1", "definition": {"id": "cf-2"}}]},  # tl shape
    {"a": [[{"b": 1}, 2]]},                 # object inside nested array, then scalar
    {"a": "", "b": 0, "c": False},          # falsy scalars still emit
    {"a": [None, 1, None]},                 # nulls inside arrays dropped
]


@pytest.mark.parametrize("doc", CASES, ids=[json.dumps(c)[:40] for c in CASES])
def test_matches_reference_semantics(doc):
    assert engine_triples(doc) == list(oracle_triples(doc, "0"))


def test_triple_counts_invariant():
    # triples = non-null scalar leaves (under a key) + object links from a keyed parent
    doc = {"a": 1, "b": [1, 2], "c": {"d": None, "e": [True, {"f": "g"}]}}
    got = engine_triples(doc)
    # scalars: a:1, b:1, b:2, e:true, f:g = 5 ; links: c, e->obj = 2
    assert len(got) == 7


def test_bnode_determinism_and_scoping():
    doc = {"a": [{"b": 1}, {"b": 2}]}
    t1, t2 = engine_triples(doc, "7"), engine_triples(doc, "7")
    assert t1 == t2
    subjects = {s for (s, p, o, ot, dt) in t1}
    assert subjects == {"_:b7-0", "_:b7-1", "_:b7-2"}
    # different doc ids never collide
    other = engine_triples(doc, "8")
    assert not ({s for s, *_ in other} & subjects)


def test_instance_ns_mode():
    # reference parse_functions.py:79-81 — sequential IRIs instead of bnodes
    got = list(parse_document({"a": {"b": 1}}, "3", instance_ns="urn:i:"))
    assert got[0] == ("urn:i:3-0", "iri", NS + "a", "urn:i:3-1", "iri", None, None)


def test_distributed_matches_local(spark):
    docs = [(str(i), json.dumps(c)) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(docs, "doc_id string, json string")
    got = {
        tuple(r)
        for r in json_to_quads(df, "urn:g:test").collect()
    }
    expect = set()
    for i, c in enumerate(CASES):
        for t in parse_document(c, str(i)):
            expect.add(("urn:g:test", *t))
    assert got == expect
