"""Unit tests for group_quantiles, normalize_text, pack_sequences,
corpus_ngram_topk and tfidf_top_terms on hand-built corner cases."""

import math

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.curation import (
    corpus_ngram_topk,
    pack_sequences,
    tfidf_top_terms,
)
from knowledge_graph_etl_spark.extensions.stats import group_quantiles
from knowledge_graph_etl_spark.extensions.text import normalize_text


def test_group_quantiles_rank_selection(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in group_quantiles(df, "g", "v").collect()}
    a = out["a"]
    # percentile_disc: value at rank ceil(p*n); n=10 -> ranks 3, 5, 8
    assert (a["p0_25"], a["p0_5"], a["p0_75"]) == (3.0, 5.0, 8.0)
    assert a["n_rows"] == 10
    b = out["b"]  # single-row group: every quantile is that row
    assert (b["p0_25"], b["p0_5"], b["p0_75"]) == (5.0, 5.0, 5.0)


def test_group_quantiles_validates_fracs(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="fractions"):
        group_quantiles(df, "g", "v", fracs=[0.5, 1.5])
    with pytest.raises(ValueError, match="non-empty"):
        group_quantiles(df, "g", "v", fracs=[])


def test_normalize_text(spark):
    out = spark.range(1).select(
        normalize_text(F.lit("  a\t\tb\r\nc\x00d  ")).alias("t")
    ).collect()[0]["t"]
    assert out == "a b c d"


def test_pack_sequences_layout(spark):
    df = spark.createDataFrame(
        [("d1", 100), ("d2", 50), ("d3", 60), ("d4", 10)],
        "doc_id string, n_tokens long",
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, max_tokens=128).collect()}
    # cumulative starts: d1@0, d2@100, d3@150, d4@210
    assert (out["d1"]["seq_id"], out["d1"]["seq_offset"]) == (0, 0)
    assert (out["d2"]["seq_id"], out["d2"]["seq_offset"]) == (0, 100)
    assert (out["d3"]["seq_id"], out["d3"]["seq_offset"]) == (1, 22)
    assert (out["d4"]["seq_id"], out["d4"]["seq_offset"]) == (1, 82)
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(df, max_tokens=0)


def test_pack_sequences_per_shard_independent(spark):
    df = spark.createDataFrame(
        [("a", 0, 150), ("b", 1, 150), ("c", 0, 100)],
        "doc_id string, shard int, n_tokens long",
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, max_tokens=128, shard_col="shard").collect()
    }
    # each shard starts its own cumulative layout at 0
    assert out["a"]["seq_id"] == 0 and out["b"]["seq_id"] == 0
    assert (out["c"]["seq_id"], out["c"]["seq_offset"]) == (1, 22)  # starts at 150


def test_corpus_ngram_topk_order_and_ties(spark):
    docs = spark.createDataFrame(
        [("1", "x y z"), ("2", "x y z"), ("3", "a b c")],
        "doc_id string, text string",
    )
    rows = corpus_ngram_topk(docs, n=3, k=2).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in rows] == [
        ("x y z", 2),
        ("a b c", 1),
    ]


def test_tfidf_top_terms(spark):
    docs = spark.createDataFrame(
        [
            ("1", "apple apple banana common"),
            ("2", "banana cherry common"),
            ("3", "cherry common common"),
        ],
        "doc_id string, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r for r in out}
    # 'common' appears in every doc -> idf 0 -> never the top term
    assert top["1"]["token"] == "apple"
    assert top["1"]["tf"] == 2 and top["1"]["df"] == 1
    assert top["1"]["score"] == pytest.approx(round(2 * math.log(3 / 1), 6))
    assert top["2"]["token"] in ("banana", "cherry")  # tie -> token asc
    assert top["2"]["token"] == "banana"


def test_kmv_distinct_exact_and_estimate(spark):
    from knowledge_graph_etl_spark.extensions.stats import kmv_distinct

    rows = [("small", f"v{i}") for i in range(5)] + [
        ("big", f"u{i}") for i in range(500)
    ] + [("big", "u0")]  # duplicate must not inflate the sketch
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=16).collect()}
    # below k distinct -> exact
    assert out["small"]["est_distinct"] == 5.0 and out["small"]["n_kept"] == 5
    # at 500 distinct with k=16 the estimate is within ~3 standard errors
    # (se ≈ 1/sqrt(14) ≈ 27%)
    assert out["big"]["n_kept"] == 16
    assert 500 * 0.3 < out["big"]["est_distinct"] < 500 * 2.2
    # deterministic: identical estimate on re-run
    again = {r["g"]: r["est_distinct"] for r in kmv_distinct(df, "g", "v", k=16).collect()}
    assert again["big"] == out["big"]["est_distinct"]
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "g", "v", k=1)
