"""BGP operators: star/chain joins, OPTIONAL, EXISTS, BIND, CONSTRUCT
(SURVEY.md §2 ops 14-24) against a hand-built quad fixture shaped like the
reference's ldap/teamleader graphs (FIXTURES.md §A2-A4)."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark import BGP, GraphStore, Term, Var, construct, iri, pattern
from knowledge_graph_etl_spark.functions import concat, md5, strlang, typed_literal, uri
from knowledge_graph_etl_spark.terms import XSD_BOOLEAN

SRC = "urn:src:"
G_LDAP = "urn:graph:ldap"
G_CF = "urn:graph:cf"


def lit_row(g, s, p, o, dt=None, lang=None):
    return (g, s, "bnode" if s.startswith("_:") else "iri", SRC + p, o, "literal", dt, lang)


def iri_row(g, s, p, o):
    return (g, s, "bnode" if s.startswith("_:") else "iri", SRC + p,
            o, "bnode" if o.startswith("_:") else "iri", None, None)


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        # two orgs, one School one CP; org2 has no street (OPTIONAL miss)
        lit_row(G_LDAP, "_:o1", "objectClass", "organization"),
        lit_row(G_LDAP, "_:o1", "businessCategory", "School"),
        lit_row(G_LDAP, "_:o1", "o", "OR-s1"),
        lit_row(G_LDAP, "_:o1", "street", "Teststraat 1"),
        lit_row(G_LDAP, "_:o2", "objectClass", "organization"),
        lit_row(G_LDAP, "_:o2", "businessCategory", "Content Partner"),
        lit_row(G_LDAP, "_:o2", "o", "OR-c2"),
        # an entity that is NOT an organization (must not match the star)
        lit_row(G_LDAP, "_:u1", "businessCategory", "School"),
        lit_row(G_LDAP, "_:u1", "o", "OR-u1"),
        # chain: company -> custom_fields bnode -> definition bnode -> id
        iri_row(G_CF, "_:c1", "custom_fields", "_:cf1"),
        lit_row(G_CF, "_:cf1", "value", "OR-c2"),
        iri_row(G_CF, "_:cf1", "definition", "_:d1"),
        lit_row(G_CF, "_:d1", "id", "cf-orid-uuid"),
        # the label lookup row (cross-graph join target)
        lit_row(G_CF, "_:lbl1", "id", "cf-orid-uuid"),
        lit_row(G_CF, "_:lbl1", "label", "5.1 - OR-ID"),
        # CP-status flag for the EXISTS test
        iri_row(G_CF, "_:c1", "custom_fields", "_:cf2"),
        lit_row(G_CF, "_:cf2", "value", "ja"),
        iri_row(G_CF, "_:cf2", "definition", "_:d2"),
        lit_row(G_CF, "_:d2", "id", "cf-status-uuid"),
    ]
    store = GraphStore(spark)
    store.insert_data(rows)
    return store.quads()


def test_pattern_scan_constant_object(quads):
    # op 14: constant predicate + object → subjects
    df = pattern(quads.where(F.col("g") == G_LDAP), Var("o"), SRC + "objectClass", "organization")
    assert {r["o"] for r in df.collect()} == {"_:o1", "_:o2"}


def test_star_join_and_bind(quads):
    # op 15 (3-way star) + op 20 (BIND uri(md5))
    b = BGP(quads.where(F.col("g") == G_LDAP))
    b.pattern(Var("o"), SRC + "objectClass", "organization")
    b.pattern(Var("o"), SRC + "businessCategory", "School", broadcast=True)
    b.pattern(Var("o"), SRC + "o", Var("orid"))
    b.bind("org", uri(concat(F.lit("urn:org:"), md5(F.col("orid")))))
    rows = b.df.collect()
    assert len(rows) == 1
    import hashlib

    assert rows[0]["org"] == "urn:org:" + hashlib.md5(b"OR-s1").hexdigest()
    assert rows[0]["org__type"] == "iri"


def test_chain_join_three_levels(quads):
    # op 16: ?c custom_fields ?cf / ?cf definition ?d / ?d id ?id
    b = BGP(quads.where(F.col("g") == G_CF))
    b.pattern(Var("c"), SRC + "custom_fields", Var("cf"))
    b.pattern(Var("cf"), SRC + "value", Var("v"))
    b.pattern(Var("cf"), SRC + "definition", Var("d"))
    b.pattern(Var("d"), SRC + "id", Var("id"))
    got = {(r["c"], r["v"], r["id"]) for r in b.df.collect()}
    assert got == {("_:c1", "OR-c2", "cf-orid-uuid"), ("_:c1", "ja", "cf-status-uuid")}


def test_cross_graph_value_join(quads):
    # op 17: label lookup joined to the company chain on the definition id
    lookup = BGP(quads.where(F.col("g") == G_CF))
    lookup.pattern(Var("lbl"), SRC + "label", "5.1 - OR-ID")
    lookup.pattern(Var("lbl"), SRC + "id", Var("id"))
    b = BGP(quads.where(F.col("g") == G_CF))
    b.pattern(Var("c"), SRC + "custom_fields", Var("cf"))
    b.pattern(Var("cf"), SRC + "definition", Var("d"))
    b.pattern(Var("d"), SRC + "id", Var("id"))
    b.pattern(Var("cf"), SRC + "value", Var("orid"))
    b.join_group(lookup.df.select("id"), broadcast=True)
    got = {(r["c"], r["orid"]) for r in b.df.collect()}
    assert got == {("_:c1", "OR-c2")}


def test_optional_left_join_nulls(quads):
    # op 18: street is OPTIONAL; o2 has none → NULL flows through
    opt = BGP(quads.where(F.col("g") == G_LDAP))
    opt.pattern(Var("o"), SRC + "street", Var("street"))
    b = BGP(quads.where(F.col("g") == G_LDAP))
    b.pattern(Var("o"), SRC + "objectClass", "organization")
    b.optional(opt.df)
    got = {(r["o"], r["street"]) for r in b.df.collect()}
    assert got == {("_:o1", "Teststraat 1"), ("_:o2", None)}


def test_exists_semi_join(quads):
    # op 19: CP-status "ja" constraint (tl_companies_mapping_cp.sparql:28-35)
    flag = BGP(quads.where(F.col("g") == G_CF))
    flag.pattern(Var("c"), SRC + "custom_fields", Var("cf2"))
    flag.pattern(Var("cf2"), SRC + "value", "ja")
    b = BGP(quads.where(F.col("g") == G_CF))
    b.pattern(Var("c"), SRC + "custom_fields", Var("cf"))
    b.pattern(Var("cf"), SRC + "value", Var("v"))
    b.exists(flag.df.select("c"))
    assert {r["c"] for r in b.df.collect()} == {"_:c1"}


def test_construct_template_null_skip_and_dedup(quads):
    # op 21: unbound optional var skips only its template triple; set dedup
    opt = BGP(quads.where(F.col("g") == G_LDAP)).pattern(Var("o"), SRC + "street", Var("street"))
    b = BGP(quads.where(F.col("g") == G_LDAP))
    b.pattern(Var("o"), SRC + "objectClass", "organization")
    b.pattern(Var("o"), SRC + "o", Var("orid"))
    b.optional(opt.df)
    b.bind("org", uri(concat(F.lit("urn:org:"), F.col("orid"))))
    out = construct(
        b.df,
        [
            (Var("org"), "rdf:type", Term("urn:cls:Org", "iri")),
            (Var("org"), "schema:address", Var("street")),
            (Var("org"), "rdf:type", Term("urn:cls:Org", "iri")),  # duplicate template line
        ],
        target_graph="urn:graph:out",
    )
    rows = {(r["s"], r["p"], r["o_value"], r["o_type"]) for r in out.collect()}
    assert rows == {
        ("urn:org:OR-s1", "rdf:type", "urn:cls:Org", "iri"),
        ("urn:org:OR-c2", "rdf:type", "urn:cls:Org", "iri"),
        ("urn:org:OR-s1", "schema:address", "Teststraat 1", "literal"),
    }
    assert out.count() == 3  # dedup collapsed the doubled type triple


def test_construct_term_metadata_flow(quads):
    # STRLANG / typed-literal metadata must survive into the output quads
    b = BGP(quads.where(F.col("g") == G_LDAP))
    b.pattern(Var("o"), SRC + "o", Var("orid"))
    b.bind("desc", strlang(F.col("orid"), "nl"))
    b.bind("flag", typed_literal(F.lit("true"), XSD_BOOLEAN))
    out = construct(
        b.df,
        [(iri("urn:e:1"), "p:d", Var("desc")), (iri("urn:e:1"), "p:f", Var("flag"))],
        "urn:graph:out",
    )
    by_p = {r["p"]: r for r in out.collect()}
    assert by_p["p:d"]["o_lang"] == "nl"
    assert by_p["p:f"]["o_datatype"] == XSD_BOOLEAN


def test_idempotence_set_semantics(spark, quads):
    # SURVEY.md §5.2 item 6: running a mapping twice leaves the target identical
    store = GraphStore(spark)
    b = BGP(quads.where(F.col("g") == G_LDAP))
    b.pattern(Var("o"), SRC + "o", Var("orid"))
    out = construct(b.df, [(Var("o"), "p:id", Var("orid"))], "urn:graph:tgt")
    store.insert(out)
    once = {tuple(r) for r in store.quads().collect()}
    store.insert(out)
    assert {tuple(r) for r in store.quads().collect()} == once
