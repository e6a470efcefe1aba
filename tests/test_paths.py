"""SPARQL 1.1 property-path tests (operators/paths.py + parser/compiler):
sequence, inverse, alternative, + and * closures, constants at endpoints,
cycle termination, literal middles, and template rejection."""

import pytest

from knowledge_graph_etl_spark.engine import Engine


def _hier(spark):
    e = Engine(spark)
    e.store.insert_data(
        [
            ("urn:g:h", "urn:n:a", "iri", "urn:p:parent", "urn:n:b", "iri", None, None),
            ("urn:g:h", "urn:n:b", "iri", "urn:p:parent", "urn:n:c", "iri", None, None),
            ("urn:g:h", "urn:n:c", "iri", "urn:p:parent", "urn:n:d", "iri", None, None),
            ("urn:g:h", "urn:n:x", "iri", "urn:p:other", "urn:n:a", "iri", None, None),
            ("urn:g:h", "urn:n:a", "iri", "urn:p:name", "alpha", "literal", None, None),
        ]
    )
    return e


def _pairs(df, a="s", b="o"):
    return {(r[a], r[b]) for r in df.collect()}


def test_path_plus_transitive(spark):
    e = _hier(spark)
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s <urn:p:parent>+ ?o }"
    ))
    assert got == {
        ("urn:n:a", "urn:n:b"), ("urn:n:a", "urn:n:c"), ("urn:n:a", "urn:n:d"),
        ("urn:n:b", "urn:n:c"), ("urn:n:b", "urn:n:d"), ("urn:n:c", "urn:n:d"),
    }


def test_path_star_includes_zero_length(spark):
    e = _hier(spark)
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { <urn:n:c> <urn:p:parent>* ?o }",
        ), a="o", b="o")
    # c parent* -> c (zero-length) and d
    assert {g[0] for g in got} == {"urn:n:c", "urn:n:d"}


def test_path_seq_and_inverse(spark):
    e = _hier(spark)
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s <urn:p:other>/<urn:p:parent>+ ?o }"
    ))
    assert got == {("urn:n:x", "urn:n:b"), ("urn:n:x", "urn:n:c"), ("urn:n:x", "urn:n:d")}
    inv = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s ^<urn:p:parent> ?o }"
    ))
    assert inv == {("urn:n:b", "urn:n:a"), ("urn:n:c", "urn:n:b"), ("urn:n:d", "urn:n:c")}


def test_path_alternative(spark):
    e = _hier(spark)
    got = _pairs(e.select(
        "SELECT ?o FROM <urn:g:h> WHERE { <urn:n:a> <urn:p:name>|<urn:p:parent> ?o }"
    ), a="o", b="o")
    assert {g[0] for g in got} == {"alpha", "urn:n:b"}


def test_path_cycle_terminates(spark):
    e = Engine(spark)
    e.store.insert_data(
        [
            ("urn:g:c", "urn:n:1", "iri", "urn:p:n", "urn:n:2", "iri", None, None),
            ("urn:g:c", "urn:n:2", "iri", "urn:p:n", "urn:n:1", "iri", None, None),
        ]
    )
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:c> WHERE { ?s <urn:p:n>+ ?o }"
    ))
    # closure over a 2-cycle: every ordered pair incl. self-loops, finite
    assert got == {
        ("urn:n:1", "urn:n:1"), ("urn:n:1", "urn:n:2"),
        ("urn:n:2", "urn:n:1"), ("urn:n:2", "urn:n:2"),
    }


def test_path_literal_middle_stops(spark):
    e = _hier(spark)
    # name yields a literal; a literal can never be a subject, so the
    # sequence name/parent matches nothing (and must not error)
    got = e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s <urn:p:name>/<urn:p:parent> ?o }"
    )
    assert got.count() == 0


def test_path_joins_with_plain_patterns(spark):
    e = _hier(spark)
    got = _pairs(e.select(
        """SELECT ?s ?n FROM <urn:g:h>
           WHERE { ?s <urn:p:parent>+ <urn:n:d> . ?s <urn:p:name> ?n }"""
    ), a="s", b="n")
    assert got == {("urn:n:a", "alpha")}


def test_path_rejected_in_templates(spark):
    from knowledge_graph_etl_spark.plans.parser import parse_update

    with pytest.raises(SyntaxError):
        parse_update(
            "INSERT { ?s <urn:p:a>/<urn:p:b> ?o } WHERE { ?s <urn:p:c> ?o }"
        )


def test_negated_property_set(spark):
    e = _hier(spark)
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s !(<urn:p:parent>|<urn:p:name>) ?o }"
    ))
    assert got == {("urn:n:x", "urn:n:a")}  # only the 'other' edge survives


def test_zero_or_one_path(spark):
    e = _hier(spark)
    got = {r["o"] for r in e.select(
        "SELECT ?o FROM <urn:g:h> WHERE { <urn:n:a> <urn:p:parent>? ?o }"
    ).collect()}
    assert got == {"urn:n:a", "urn:n:b"}  # self (zero) + one hop


def test_negated_property_set_inverse_members(spark):
    """SPARQL 1.1 §9.1 inverse NPS members: !(^p) matches REVERSED edges
    whose predicate is not p; mixed !(P|^Q) is the union of both sides,
    each banning only its own member set."""
    e = _hier(spark)
    # pure-inverse: all edges reversed except ^parent — i.e. reversed
    # 'other' and reversed 'name' edges
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s !(^<urn:p:parent>) ?o }"
    ))
    assert got == {("urn:n:a", "urn:n:x"), ("alpha", "urn:n:a")}
    # mixed: forward side bans parent+name (leaves forward 'other'),
    # inverse side bans other+name (leaves reversed 'parent' edges)
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE "
        "{ ?s !(<urn:p:parent>|<urn:p:name>|^<urn:p:other>|^<urn:p:name>) ?o }"
    ))
    assert got == {
        ("urn:n:x", "urn:n:a"),  # forward other
        ("urn:n:b", "urn:n:a"), ("urn:n:c", "urn:n:b"), ("urn:n:d", "urn:n:c"),
    }
    # unparenthesised single inverse member: !^iri
    got = _pairs(e.select(
        "SELECT ?s ?o FROM <urn:g:h> WHERE { ?s !^<urn:p:parent> ?o }"
    ))
    assert got == {("urn:n:a", "urn:n:x"), ("alpha", "urn:n:a")}
