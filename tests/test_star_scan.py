"""star_scan — the property-table rewrite (SURVEY.md §4.2): must be
binding-for-binding equivalent to the chained-join BGP path, with one scan
and one shuffle."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark import BGP, GraphStore, Term, Var, star_scan

SRC = "urn:src:"
G = "urn:g:star"


def lit_row(s, p, o, dt=None, lang=None):
    return (G, s, "iri", SRC + p, o, "literal", dt, lang)


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        lit_row("urn:e:1", "objectClass", "organization"),
        lit_row("urn:e:1", "name", "Org One"),
        lit_row("urn:e:1", "tag", "a"),
        lit_row("urn:e:1", "tag", "b"),  # multi-valued predicate
        lit_row("urn:e:1", "alias", "o1a"),
        lit_row("urn:e:1", "alias", "o1b"),
        lit_row("urn:e:2", "objectClass", "organization"),
        lit_row("urn:e:2", "name", "Org Two"),
        lit_row("urn:e:2", "tag", "x"),
        lit_row("urn:e:2", "alias", "o2"),
        # not an organization: must not appear
        lit_row("urn:e:3", "name", "Other"),
        lit_row("urn:e:3", "tag", "z"),
        lit_row("urn:e:3", "alias", "zz"),
        # organization but missing 'tag': required pattern excludes it
        lit_row("urn:e:4", "objectClass", "organization"),
        lit_row("urn:e:4", "name", "No Tag"),
        # language-tagged name must not match the plain-literal constant
        lit_row("urn:e:5", "objectClass", "organization", lang="nl"),
        lit_row("urn:e:5", "name", "Taal"),
        lit_row("urn:e:5", "tag", "t"),
        lit_row("urn:e:5", "alias", "ta"),
    ]
    store = GraphStore(spark)
    store.insert_data(rows)
    return store.quads()


STAR = [
    (SRC + "objectClass", "organization"),
    (SRC + "name", Var("name")),
    (SRC + "tag", Var("tag")),
    (SRC + "alias", Var("alias")),
]


def _join_path(quads):
    b = BGP(quads)
    b.pattern(Var("e"), SRC + "objectClass", "organization")
    b.pattern(Var("e"), SRC + "name", Var("name"))
    b.pattern(Var("e"), SRC + "tag", Var("tag"))
    b.pattern(Var("e"), SRC + "alias", Var("alias"))
    return b.df


def test_star_scan_equivalent_to_joins(quads):
    """Same bindings, including the multi-valued cross product (e1: 2 tags
    × 2 aliases = 4 rows) and constant-object / lang-tag filtering."""
    cols = ["e", "name", "tag", "alias"]
    join_rows = sorted(tuple(r) for r in _join_path(quads).select(*cols).collect())
    star_rows = sorted(
        tuple(r) for r in star_scan(quads, Var("e"), STAR).select(*cols).collect()
    )
    assert star_rows == join_rows
    assert len(star_rows) == 5  # e1: 2×2, e2: 1

    # companion columns carried like pattern() does
    out = star_scan(quads, Var("e"), STAR)
    assert "e__type" in out.columns and "name__type" in out.columns


def test_star_scan_single_shuffle(quads):
    """The rewrite's point: ONE exchange (the groupBy on s) in the whole
    plan vs one per join in the chained path."""
    plan = star_scan(quads, Var("e"), STAR)._jdf.queryExecution().executedPlan().toString()
    # the cached store relation embeds its own (already-executed) insert
    # plan in toString — count exchanges only in the live query section
    live = plan.split("InMemoryTableScan")[0]
    assert live.count("Exchange") == 1


def test_star_scan_in_builder_joins_with_chains(quads):
    b = BGP(quads)
    b.star(Var("e"), [(SRC + "objectClass", "organization"), (SRC + "name", Var("name"))])
    got = {(r["e"], r["name"]) for r in b.df.select("e", "name").collect()}
    # e5's objectClass is lang-tagged: a plain-literal constant must not
    # match it (full term equality), so only e1/e2/e4 qualify
    assert got == {
        ("urn:e:1", "Org One"),
        ("urn:e:2", "Org Two"),
        ("urn:e:4", "No Tag"),
    }


def test_star_scan_term_constants(quads):
    got = star_scan(
        quads,
        Var("e"),
        [
            (SRC + "objectClass", Term("organization", "literal", None, "nl")),
            (SRC + "name", Var("name")),
        ],
    )
    assert [r["e"] for r in got.collect()] == ["urn:e:5"]


def test_star_scan_rejects_var_predicates_and_dup_vars(quads):
    with pytest.raises(ValueError):
        star_scan(quads, Var("e"), [(Var("p"), Var("o"))])
    with pytest.raises(ValueError):
        star_scan(quads, Var("e"), [(SRC + "a", Var("o")), (SRC + "b", Var("o"))])
    with pytest.raises(ValueError):
        star_scan(quads, "not-a-var", [(SRC + "a", Var("o"))])
