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


def test_optimize_clusters_by_subject(spark, tmp_path):
    """cluster_by='s' compaction (SURVEY.md §4.3): data preserved and each
    rewritten file covers a tight, sorted subject range."""
    store = GraphStore(spark, str(tmp_path / "q"))
    rows = [
        ("urn:g:a", f"urn:s:{i:03d}", "iri", "urn:p:x", f"v{i}", "literal", None, None)
        for i in range(100)
    ]
    store.insert_data(rows)
    before = {tuple(r) for r in store.quads().collect()}
    store.optimize(cluster_by="s", target_files=4)
    assert {tuple(r) for r in store.quads().collect()} == before
    # range partitioning: per-file subject ranges must not overlap
    import pyspark.sql.functions as F

    per_file = (
        store.quads()
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next


def test_bucketed_table_star_join_has_no_shuffle(spark, tmp_path):
    """as_bucketed_table co-locates by subject: a star self-join compiles
    to SortMergeJoin with NO shuffle exchange (the SURVEY §4.3 claim)."""
    import pyspark.sql.functions as F

    store = GraphStore(spark, str(tmp_path / "q"))
    rows = []
    for i in range(50):
        rows.append(("urn:g:a", f"urn:s:{i}", "iri", "urn:p:name", f"n{i}", "literal", None, None))
        rows.append(("urn:g:a", f"urn:s:{i}", "iri", "urn:p:kind", "thing", "literal", None, None))
    store.insert_data(rows)
    tbl = store.as_bucketed_table("quads_b_test", buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = tbl.where(F.col("p") == "urn:p:kind").select(F.col("s").alias("e"))
        b = tbl.where(F.col("p") == "urn:p:name").select(
            F.col("s").alias("e"), F.col("o_value").alias("name")
        )
        j = a.join(b, "e")
        assert j.count() == 50
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS quads_b_test")


def test_inmemory_clear_consolidates_cache(spark):
    from knowledge_graph_etl_spark.store import GraphStore

    s = GraphStore(spark)  # in-memory
    rows1 = [("urn:g:a", "s1", "iri", "p", "v1", "literal", None, None)]
    rows2 = [("urn:g:b", "s2", "iri", "p", "v2", "literal", None, None)]
    s.insert_data(rows1)
    s.insert_data(rows2)
    assert len(s._mem_pieces) == 2
    s.clear("urn:g:a")
    # consolidated to one cached piece; cleared graph gone, other intact
    assert len(s._mem_pieces) == 1
    got = {(r["g"], r["s"]) for r in s.quads().collect()}
    assert got == {("urn:g:b", "s2")}
    s.close()
    assert s._mem_pieces == [] and s.quads().count() == 0


# --------------------------------------------------------------------------
# crash-safe optimize: every crash window recovers to a complete graph
# --------------------------------------------------------------------------


def _crashy_store(spark, tmp_path, crash_in):
    """GraphStore whose compaction dies at a chosen protocol step."""
    path = str(tmp_path / "q")
    store = GraphStore(spark, path)
    store.insert_data(ROWS)
    before = {tuple(r) for r in store.quads().collect()}
    orig = GraphStore._complete_swap

    if crash_in == "before_commit":
        # die while writing the compacted generation (no marker yet):
        # simulate by leaving an uncommitted tmp dir behind
        import os

        junk = os.path.join(path, "_compact_tmp", "urn%3Ag%3Aa")
        os.makedirs(junk)
        with open(os.path.join(junk, "part-junk.parquet"), "w") as f:
            f.write("half-written garbage")
    elif crash_in == "after_commit":
        # die between the COMMIT marker and the swap
        def boom(self, gname):
            raise RuntimeError("injected crash after commit point")

        GraphStore._complete_swap = boom
        try:
            with pytest.raises(RuntimeError, match="injected"):
                store.optimize()
        finally:
            GraphStore._complete_swap = orig
    elif crash_in == "after_swap":
        # die between the rename and marker removal: marker with no tmp dir
        import os

        tmp_root = os.path.join(path, "_compact_tmp")
        os.makedirs(tmp_root, exist_ok=True)
        with open(os.path.join(tmp_root, "urn%3Ag%3Ab.COMMIT"), "w"):
            pass
    return path, before


@pytest.mark.parametrize("crash_in", ["before_commit", "after_commit", "after_swap"])
def test_optimize_crash_recovery(spark, tmp_path, crash_in):
    """Kill the compaction at each protocol step; a fresh GraphStore over
    the same path must read the COMPLETE original graph (the r02 code left
    the graph empty if the process died between drop and re-append)."""
    path, before = _crashy_store(spark, tmp_path, crash_in)
    reopened = GraphStore(spark, path)
    assert {tuple(r) for r in reopened.quads().collect()} == before
    # and a subsequent optimize on the recovered store succeeds cleanly
    reopened.optimize()
    assert {tuple(r) for r in reopened.quads().collect()} == before


def test_optimize_recovery_is_idempotent(spark, tmp_path):
    """Recovery replayed twice (crash during recovery itself) is safe."""
    path, before = _crashy_store(spark, tmp_path, "after_commit")
    GraphStore(spark, path)
    reopened = GraphStore(spark, path)
    assert {tuple(r) for r in reopened.quads().collect()} == before


def test_register_view_sql_bridge(spark):
    store = GraphStore(spark)
    store.insert_data(
        [("urn:g:v", "urn:s:1", "iri", "urn:p:x", "hello", "literal", None, None)]
    )
    store.register_view("quads_v")
    got = spark.sql(
        "SELECT o_value FROM quads_v WHERE g = 'urn:g:v' AND p = 'urn:p:x'"
    ).collect()
    assert [r["o_value"] for r in got] == ["hello"]
