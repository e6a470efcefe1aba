"""Physical-plan evidence tests (SURVEY.md §4.2): the scale posture is a
property of the PLAN, not of small-data timings, so assert it directly on
`.explain("formatted")` output.

* partition pruning — a `graph()` / pattern read over the parquet-backed
  store must carry the `g = const` filter as a PartitionFilter (one graph
  scanned, not the store);
* predicate pushdown — constant-predicate / constant-object pattern scans
  must reach the parquet reader as PushedFilters (row groups skipped at
  100 TB, not filtered post-scan);
* column pruning — a pattern projecting (s, o_value) must not read the
  term-metadata columns in ReadSchema;
* whole-stage codegen — the scalar-function pipeline stays inside codegen
  (no interpreted Python/eval nodes in the hot path).
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark import BGP, GraphStore, Var
from knowledge_graph_etl_spark.ingest import quadify


@pytest.fixture(scope="module")
def pstore(spark, tmp_path_factory):
    store = GraphStore(spark, path=str(tmp_path_factory.mktemp("planstore")))
    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("c_name"),
        F.when(F.col("id") % 2 == 0, "BUILDING").otherwise("AUTO").alias("c_seg"),
    )
    store.insert(
        quadify(df, "k", "urn:c:", "urn:g:one", namespace="urn:p:"),
        dedup_against_store=False,
        batch_distinct=True,
    )
    store.insert(
        quadify(df, "k", "urn:x:", "urn:g:two", namespace="urn:p:"),
        dedup_against_store=False,
        batch_distinct=True,
    )
    return store


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_graph_read_prunes_partitions(pstore):
    plan = _plan(pstore.graph("urn:g:one"))
    assert "PartitionFilters" in plan
    # the partition filter must carry the constant graph binding
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "g" in pf_line and "urn:g:one" in pf_line


def test_pattern_scan_pushes_predicate_and_object(pstore):
    b = BGP(pstore.graph("urn:g:one"))
    b.pattern(Var("s"), "urn:p:c_seg", "BUILDING")
    plan = _plan(b.df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    joined = " ".join(pushed)
    assert "urn:p:c_seg" in joined, joined
    assert "BUILDING" in joined, joined


def test_pattern_scan_prunes_columns(pstore):
    b = BGP(pstore.graph("urn:g:one"))
    b.pattern(Var("s"), "urn:p:c_name", Var("name"))
    plan = _plan(b.df.select("s", "name"))
    schema_lines = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_value" in schema_lines
    # term-metadata columns the query never touches must not be read
    assert "o_lang" not in schema_lines
    assert "o_datatype" not in schema_lines


def test_scalar_pipeline_stays_in_codegen(spark):
    from knowledge_graph_etl_spark.functions import (
        concat,
        encode_for_uri,
        md5,
        strafter,
    )

    df = spark.range(100).select(F.concat(F.lit("v#"), F.col("id")).alias("x"))
    out = df.select(
        md5(F.col("x")).alias("h"),
        strafter(F.col("x"), "#").alias("a"),
        encode_for_uri(concat(F.col("x"), F.lit(" y"))).alias("e"),
    )
    plan = _plan(out)
    # formatted mode marks codegen stages as "[codegen id : N]"
    assert "codegen id" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
