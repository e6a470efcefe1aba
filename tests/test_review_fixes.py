"""Regression tests for the engine-conformance findings of the r02
self-review: WITH-as-dataset, disjoint OPTIONAL, term-equality joins,
repeated variables, reserved names, template bnodes, literal subjects,
USING NAMED, and side-effect-free plan()."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark import BGP, GraphStore, Term, Var, construct, pattern
from knowledge_graph_etl_spark.engine import Engine


def _store_with(spark, rows):
    """rows: (g, s, s_type, p, o_value, o_type, o_datatype, o_lang)"""
    store = GraphStore(spark)
    store.insert_data(list(rows))
    return store


IRI = "iri"
LIT = "literal"


def test_with_restricts_dataset_without_using(spark):
    store = _store_with(
        spark,
        [
            ("urn:g:A", "urn:a1", IRI, "urn:p", "x", LIT, None, None),
            ("urn:g:B", "urn:b1", IRI, "urn:p", "y", LIT, None, None),
        ],
    )
    eng = Engine(spark)
    eng.store = store
    eng.update(
        "WITH <urn:g:A> INSERT { ?s <urn:p2> ?o } WHERE { ?s <urn:p> ?o }"
    )
    got = {(r["s"], r["o_value"]) for r in
           store.graph("urn:g:A").where(F.col("p") == "urn:p2").collect()}
    # only graph A's triples matched; B's did not leak into A
    assert got == {("urn:a1", "x")}


def test_disjoint_optional_keeps_outer_rows_when_empty(spark):
    store = _store_with(
        spark,
        [("urn:g:A", "urn:a1", IRI, "urn:p", "x", LIT, None, None)],
    )
    eng = Engine(spark)
    eng.store = store
    out = eng.plan(
        "WITH <urn:g:A> INSERT { ?s <urn:has> ?y } "
        "WHERE { ?s <urn:p> ?o OPTIONAL { ?x <urn:q> ?y } }"
    )
    # ?y unbound -> template triple skipped, but the WHERE must still have
    # produced the outer binding row (crossJoin against empty dropped it)
    bindings = eng.plan(
        "WITH <urn:g:A> INSERT { ?s <urn:p2> ?o } "
        "WHERE { ?s <urn:p> ?o OPTIONAL { ?x <urn:q> ?y } }"
    )
    assert out.count() == 0
    assert bindings.count() == 1


def test_join_requires_full_term_equality(spark):
    quads = spark.createDataFrame(
        [
            ("g", "urn:a", IRI, "urn:p", "5", LIT, "urn:xsd:integer", None),
            ("g", "urn:b", IRI, "urn:q", "5", LIT, None, None),
            ("g", "urn:c", IRI, "urn:p", "same", LIT, None, None),
            ("g", "urn:d", IRI, "urn:q", "same", LIT, None, None),
        ],
        "g string, s string, s_type string, p string, o_value string, "
        "o_type string, o_datatype string, o_lang string",
    )
    b = BGP(quads)
    b.pattern(Var("x"), "urn:p", Var("v"))
    b.pattern(Var("y"), "urn:q", Var("v"))
    got = {(r["x"], r["y"]) for r in b.df.select("x", "y").collect()}
    # "5"^^xsd:integer must NOT unify with plain "5"; plain "same" does
    assert got == {("urn:c", "urn:d")}


def test_chain_join_excludes_literal_objects(spark):
    quads = spark.createDataFrame(
        [
            ("g", "urn:a", IRI, "urn:p", "urn:mid", IRI, None, None),
            ("g", "urn:b", IRI, "urn:p", "urn:mid", LIT, None, None),  # literal!
            ("g", "urn:mid", IRI, "urn:q", "end", LIT, None, None),
        ],
        "g string, s string, s_type string, p string, o_value string, "
        "o_type string, o_datatype string, o_lang string",
    )
    b = BGP(quads)
    b.pattern(Var("a"), "urn:p", Var("m"))
    b.pattern(Var("m"), "urn:q", Var("w"))
    got = {r["a"] for r in b.df.select("a").collect()}
    # the literal "urn:mid" object cannot chain onto the subject urn:mid
    assert got == {"urn:a"}


def test_repeated_variable_self_loop(spark):
    quads = spark.createDataFrame(
        [
            ("g", "urn:n1", IRI, "urn:knows", "urn:n1", IRI, None, None),  # self
            ("g", "urn:n2", IRI, "urn:knows", "urn:n3", IRI, None, None),
            ("g", "urn:n4", IRI, "urn:knows", "urn:n4", LIT, None, None),  # literal
        ],
        "g string, s string, s_type string, p string, o_value string, "
        "o_type string, o_datatype string, o_lang string",
    )
    out = pattern(quads, Var("s"), "urn:knows", Var("s"))
    rows = out.collect()
    assert {r["s"] for r in rows} == {"urn:n1"}
    # single exported column (plus companion), no ambiguity downstream
    assert out.columns == ["s", "s__type"]


def test_reserved_variable_names_rejected(spark):
    quads = spark.createDataFrame(
        [], "g string, s string, s_type string, p string, o_value string, "
        "o_type string, o_datatype string, o_lang string",
    )
    with pytest.raises(ValueError, match="reserved"):
        pattern(quads, Var("id__x"), "urn:p", Var("o"))
    from knowledge_graph_etl_spark.plans.parser import parse_update

    with pytest.raises(SyntaxError, match="reserved"):
        parse_update(
            "WITH <g> INSERT { ?id__x <urn:p> ?o } WHERE { ?id__x <urn:q> ?o }"
        )


def test_template_bnode_minted_per_row(spark):
    store = _store_with(
        spark,
        [
            ("urn:g:A", "urn:a1", IRI, "urn:p", "x", LIT, None, None),
            ("urn:g:A", "urn:a2", IRI, "urn:p", "y", LIT, None, None),
        ],
    )
    eng = Engine(spark)
    eng.store = store
    eng.update(
        "WITH <urn:g:out> INSERT { ?s <urn:rel> [ <urn:t> <urn:C> ] } "
        "USING <urn:g:A> WHERE { ?s <urn:p> ?o }"
    )
    out = store.graph("urn:g:out").collect()
    rels = [r for r in out if r["p"] == "urn:rel"]
    types = [r for r in out if r["p"] == "urn:t"]
    assert len(rels) == 2 and len(types) == 2
    # fresh bnode per solution row: the two rel objects differ...
    bnodes = {r["o_value"] for r in rels}
    assert len(bnodes) == 2
    assert all(r["o_type"] == "bnode" for r in rels)
    # ...and each is the subject of its own <urn:t> triple
    assert {r["s"] for r in types} == bnodes
    assert all(r["s_type"] == "bnode" for r in types)


def test_literal_subject_template_skipped(spark):
    quads = spark.createDataFrame(
        [("g", "urn:a", IRI, "urn:p", "litval", LIT, None, None)],
        "g string, s string, s_type string, p string, o_value string, "
        "o_type string, o_datatype string, o_lang string",
    )
    b = BGP(quads)
    b.pattern(Var("s"), "urn:p", Var("v"))
    out = construct(
        b.df, [(Var("v"), "urn:x", Term("urn:y", "iri"))], target_graph="urn:g:o"
    )
    assert out.count() == 0  # literal subject -> instantiation dropped


def test_using_named_parses_into_named_dataset(spark):
    # r1-review behavior (reject USING NAMED) was superseded when GRAPH
    # patterns landed: it now scopes the named-graph dataset instead
    # (semantics pinned in test_sparql_frontend.test_using_named_update)
    from knowledge_graph_etl_spark.plans.parser import parse_update

    node = parse_update(
        "WITH <urn:g:t> INSERT { ?s <urn:p2> ?o } "
        "USING NAMED <urn:g:n> WHERE { ?s <urn:p> ?o }"
    )
    assert node.using == [] and node.using_named == ["urn:g:n"]


def test_plan_is_side_effect_free(spark):
    store = _store_with(
        spark,
        [("urn:g:A", "urn:a1", IRI, "urn:p", "x", LIT, None, None)],
    )
    eng = Engine(spark)
    eng.store = store
    df = eng.plan(
        "WITH <urn:g:out> INSERT { ?s <urn:p2> ?o } USING <urn:g:A> "
        "WHERE { ?s <urn:p> ?o }"
    )
    # compiling must not have inserted anything or left checkpoint RDDs
    assert store.graph("urn:g:out").count() == 0
    assert df.count() == 1  # and the plan is still executable


# -- r02 second review batch (sources/store/streaming/functions) -----------


def test_turtle_anon_and_labeled_bnodes_distinct(spark, tmp_path):
    from knowledge_graph_etl_spark.sources.turtle import read_turtle

    p = tmp_path / "t.ttl"
    p.write_text('_:a1 <urn:p> <urn:o> .\n[ <urn:q> <urn:r> ] .\n')
    quads = read_turtle(spark, str(p), "urn:g").collect()
    subjects = {r["s"] for r in quads}
    assert len(subjects) == 2, f"anon and _:a1 merged: {subjects}"


def test_ntriples_strict_raises_on_malformed(spark, tmp_path):
    import pytest as _pytest

    from knowledge_graph_etl_spark.sources.ntriples import read_ntriples

    p = tmp_path / "bad.nt"
    p.write_text('<urn:s> <urn:p> "ok" .\n<urn:s> broken-line\n')
    # validation is folded into the load pass (r2 ADVICE: no eager
    # double-scan), so the error surfaces executor-side at action time
    with _pytest.raises(Exception, match="unparseable"):
        read_ntriples(spark, str(p), "urn:g").count()
    # lenient mode drops and continues
    assert read_ntriples(spark, str(p), "urn:g", strict=False).count() == 1


def test_ntriples_uchar_decoding(spark, tmp_path):
    from knowledge_graph_etl_spark.sources.ntriples import read_ntriples

    p = tmp_path / "u.nt"
    p.write_text(
        '<urn:s> <urn:p> "caf\\u00E9 \\U0001F600" .\n'
        '<urn:s> <urn:p2> "literal backslash \\\\u0041" .\n'
    )
    rows = {r["p"]: r["o_value"] for r in read_ntriples(spark, str(p), "urn:g").collect()}
    assert rows["urn:p"] == "café \U0001F600"
    # escaped backslash + u0041 is NOT a UCHAR
    assert rows["urn:p2"] == "literal backslash \\u0041"


def test_json_docs_unique_ids_across_files(spark, tmp_path):
    import json

    from knowledge_graph_etl_spark.sources.jsonsrc import read_json_docs

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.json").write_text(json.dumps([{"x": 1}, {"x": 2}]))
    (d / "b.json").write_text(json.dumps([{"y": 1}]))
    out = read_json_docs(spark, str(d)).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == 3 and len(set(ids)) == 3


def test_iif_null_condition_is_unbound(spark):
    from knowledge_graph_etl_spark.functions import iif

    df = spark.createDataFrame([(True,), (False,), (None,)], "c boolean")
    got = [r["v"] for r in df.select(iif(F.col("c"), F.lit("a"), F.lit("b")).alias("v")).collect()]
    assert got == ["a", "b", None]


def test_sessionize_custom_user_col_and_string_ids(spark):
    from knowledge_graph_etl_spark.streaming import sessionize

    df = spark.createDataFrame(
        [("acct-1", "2024-01-01T10:00:00"), ("acct-1", "2024-01-01T12:00:00")],
        "account string, ts_s string",
    ).select("account", F.to_timestamp("ts_s").alias("ts"))
    out = sessionize(df, gap_seconds=1800, user_col="account")
    rows = out.collect()
    assert out.columns[0] == "account"
    assert len(rows) == 2 and all(r["account"] == "acct-1" for r in rows)


def test_windowed_counts_custom_value_col(spark):
    from knowledge_graph_etl_spark.streaming import windowed_event_counts

    df = spark.createDataFrame(
        [("a", "2024-01-01T10:00:00", 2.0)], "kind string, ts_s string, amount double"
    ).select("kind", F.to_timestamp("ts_s").alias("ts"), "amount")
    out = windowed_event_counts(df, group_col="kind", value_col="amount").collect()
    assert out[0]["sum_value"] == 2.0
