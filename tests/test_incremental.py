"""Incremental target-graph maintenance (knowledge_graph_etl_spark/
incremental.py): full-refresh equivalence — the maintained derived table
must be row-identical to mapping the new snapshot from scratch — plus
the scale plan pins (broadcast anti-join delete, delta-only remap)."""

from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.changelog import snapshot_diff
from knowledge_graph_etl_spark.incremental import incremental_remap
from knowledge_graph_etl_spark.ingest import json_to_quads, quadify


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )


def _content(cols):
    return F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_remap_equals_full_refresh_quadify(spark):
    """Every delta class at once — removed, text-changed, lang-only-
    changed (caught because the content hash covers ALL mapped columns),
    NULL-text edge, added, unchanged — and the result is the full
    refresh, row for row."""
    old = _docs(
        spark,
        [
            (1, "alpha", "en"),
            (2, "bravo", "en"),     # removed
            (3, "charlie", "en"),   # text changes
            (4, "delta", "en"),     # lang-only change
            (5, None, "de"),        # NULL text, unchanged
            (6, "echo", None),      # NULL lang, text -> NULL (mapped away)
        ],
    )
    new = _docs(
        spark,
        [
            (1, "alpha", "en"),
            (3, "charlie EDITED", "en"),
            (4, "delta", "fr"),
            (5, None, "de"),
            (6, None, None),
            (7, "foxtrot", "nl"),   # added
        ],
    )

    def map_fn(d):
        return quadify(
            d, "doc_id", "urn:doc:", "urn:g:t",
            columns=["text", "lang"], src_col="src_id",
        )

    diff = snapshot_diff(
        old.select("doc_id", _content(["text", "lang"]).alias("__c")),
        new.select("doc_id", _content(["text", "lang"]).alias("__c")),
        "doc_id", "__c",
    )
    got = incremental_remap(map_fn(old), new, diff, map_fn)
    assert _sorted_rows(got) == _sorted_rows(map_fn(new))
    # the lang-only edit MUST have been remapped (content hash covers it)
    langs = {
        (r["src_id"], r["o_value"])
        for r in got.where(F.col("p") == "http://localhost/lang").collect()
    }
    assert ("4", "fr") in langs and ("4", "en") not in langs


def test_incremental_remap_equals_full_refresh_json(spark):
    """Same equivalence through the Arrow mapInPandas direct mapping
    (json_to_quads src_col provenance), nested objects included — the
    mapping the reference pipeline actually runs."""
    old_rows = [
        (10, '{"name": "a", "tags": ["x", "y"]}'),
        (11, '{"name": "b", "addr": {"city": "Gent"}}'),
        (12, '{"name": "c"}'),
    ]
    new_rows = [
        (10, '{"name": "a", "tags": ["x", "y"]}'),      # unchanged
        (11, '{"name": "B", "addr": {"city": "Gent"}}'),  # changed
        (13, '{"name": "d", "addr": {"city": "Aalst"}}'),  # added; 12 removed
    ]
    old = spark.createDataFrame(old_rows, "doc_id bigint, json string")
    new = spark.createDataFrame(new_rows, "doc_id bigint, json string")

    def map_fn(d):
        return json_to_quads(d, "urn:g:j", src_col="src_id")

    diff = snapshot_diff(old, new, "doc_id", "json")
    got = incremental_remap(map_fn(old), new, diff, map_fn)
    assert _sorted_rows(got) == _sorted_rows(map_fn(new))
    # provenance column is present and scoped per doc
    assert set(
        r["src_id"] for r in got.select("src_id").distinct().collect()
    ) == {"10", "11", "13"}


def test_incremental_remap_plan_pins(spark):
    """Scale shape: the stale-quad delete is a broadcast LEFT ANTI hash
    join (the big derived table never shuffles on the dirty ids) and the
    remap input is a broadcast LEFT SEMI join (the corpus scan is pruned
    to the delta before the mapping work)."""
    old = _docs(spark, [(i, f"t{i}", "en") for i in range(1, 50)])
    new = _docs(
        spark,
        [(i, f"t{i}" if i != 5 else "t5x", "en") for i in range(2, 51)],
    )

    def map_fn(d):
        return quadify(
            d, "doc_id", "urn:doc:", "urn:g:t",
            columns=["text", "lang"], src_col="src_id",
        )

    diff = snapshot_diff(
        old.select("doc_id", _content(["text", "lang"]).alias("__c")),
        new.select("doc_id", _content(["text", "lang"]).alias("__c")),
        "doc_id", "__c",
    )
    out = incremental_remap(map_fn(old), new, diff, map_fn)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert _sorted_rows(out) == _sorted_rows(map_fn(new))


def test_quadify_src_col_and_quad_schema_unchanged(spark):
    """src_col is additive: without it quadify/json_to_quads keep the
    exact 8-column quad schema (the shared QUAD_SCHEMA must not be
    mutated by the src variant)."""
    from knowledge_graph_etl_spark.terms import QUAD_COLUMNS

    d = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    base = quadify(d, "doc_id", "urn:doc:", "urn:g:t", columns=["text"])
    assert base.columns == QUAD_COLUMNS
    j = json_to_quads(
        spark.createDataFrame([(1, '{"a": 1}')], "doc_id bigint, json string"),
        "urn:g:j",
        src_col="src_id",
    )
    assert j.columns == QUAD_COLUMNS + ["src_id"]
    j2 = json_to_quads(
        spark.createDataFrame([(1, '{"a": 1}')], "doc_id bigint, json string"),
        "urn:g:j",
    )
    assert j2.columns == QUAD_COLUMNS
    assert len(QUAD_COLUMNS) == 8


def test_join_view_delta_equals_full_recompute(spark):
    """The IVM contract: V_old ∪ ΔV == (A∪ΔA) ⋈ (B∪ΔB), with bag
    semantics (duplicate keys multiply) and no row double-counted."""
    from knowledge_graph_etl_spark.extensions.changelog import join_view_delta

    a_old = spark.createDataFrame(
        [(1, "a1"), (1, "a1b"), (2, "a2")], "k bigint, av string"
    )
    a_new = spark.createDataFrame([(2, "a2new"), (3, "a3")], "k bigint, av string")
    b_old = spark.createDataFrame([(1, "b1"), (3, "b3")], "k bigint, bv string")
    b_new = spark.createDataFrame([(1, "b1new"), (2, "b2")], "k bigint, bv string")

    delta = join_view_delta(a_old, a_new, b_old, b_new, on="k")
    v_old = a_old.join(b_old, "k")
    incremental = sorted(map(tuple, v_old.unionByName(delta).collect()))
    full = sorted(
        map(
            tuple,
            a_old.unionByName(a_new).join(b_old.unionByName(b_new), "k").collect(),
        )
    )
    assert incremental == full and len(full) == 7  # 2*2 + 2*1 + 1*1


def test_join_view_delta_empty_deltas(spark):
    from knowledge_graph_etl_spark.extensions.changelog import join_view_delta

    a = spark.createDataFrame([(1, "x")], "k bigint, av string")
    b = spark.createDataFrame([(1, "y")], "k bigint, bv string")
    empty_a = spark.createDataFrame([], "k bigint, av string")
    empty_b = spark.createDataFrame([], "k bigint, bv string")
    assert join_view_delta(a, empty_a, b, empty_b, on="k").count() == 0
