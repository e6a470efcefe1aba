"""Tests for the r06 additions: quality_classifier (hashed linear
scorer), dsir_importance (DSIR-shaped importance weights), and
linkpred_scores (Jaccard + resource-allocation link prediction)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.curation import (
    dsir_importance,
    quality_classifier,
)
from knowledge_graph_etl_spark.extensions.graph import linkpred_scores


def _u60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# quality_classifier
# ---------------------------------------------------------------------------


def _expected_quality(text: str, threshold: int = 0):
    toks = [t for t in text.lower().strip().split() if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not grams:
        return (0, -1_000_000, False)
    off = sum(_u60(f"qw:{g}") % 2_000_001 for g in grams)
    score = off // len(grams) - 1_000_000
    return (len(grams), score, score >= threshold)


def test_quality_classifier_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spark spark spark"),
        (3, "a"),
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_feats"], r["score_micro"], r["quality_pass"])
        for r in quality_classifier(df).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _expected_quality(text), (doc_id, text)


def test_quality_classifier_is_a_pure_map(spark):
    """No shuffle: the whole operator must compile to a single projected
    scan (no Exchange in the physical plan)."""
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    plan = (
        quality_classifier(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_quality_classifier_threshold_and_unigram_mode(spark):
    df = spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
    uni = quality_classifier(df, use_bigrams=False).collect()[0]
    assert uni["n_feats"] == 2
    # impossible threshold -> nothing passes
    hard = quality_classifier(df, threshold_micro=2_000_000).collect()[0]
    assert not hard["quality_pass"]


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------


def _bucket(g: str, buckets: int = 4096) -> int:
    return _u60(f"dsir:{g}") % buckets


def _bigrams(text: str):
    toks = [t for t in text.lower().strip().split() if t]
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_dsir_importance_matches_python_reference(spark):
    corpus = [
        (1, "machine learning models train on data"),
        (2, "the cat sat on the mat"),
        (3, "machine learning needs quality data"),
        (4, "solo"),  # no bigrams -> importance 0, not selected
    ]
    target = [(100, "machine learning data")]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    tgt = spark.createDataFrame(target, ["doc_id", "text"])

    from collections import Counter

    raw = Counter(
        _bucket(g) for _, t in corpus for g in _bigrams(t)
    )
    tc = Counter(_bucket(g) for _, t in target for g in _bigrams(t))

    def expect(text):
        gs = [_bucket(g) for g in _bigrams(text)]
        if not gs:
            return (0, 0, False)
        s = sum((tc[b] + 1) * 1_000_000 // (raw[b] + 1) for b in gs)
        imp = s // len(gs)
        return (len(gs), imp, imp >= 1_000_000)

    got = {
        r["doc_id"]: (r["n_grams"], r["importance_ppm"], r["selected"])
        for r in dsir_importance(docs, tgt).collect()
    }
    for doc_id, text in corpus:
        assert got[doc_id] == expect(text), (doc_id, text)
    # target-overlapping docs must outrank the unrelated one
    assert got[1][1] > got[2][1] and got[3][1] > got[2][1]


# ---------------------------------------------------------------------------
# linkpred_scores
# ---------------------------------------------------------------------------


def _edges(spark):
    rows = [
        ("A", "d1"), ("B", "d1"),
        ("A", "d2"), ("B", "d2"), ("C", "d2"),
        ("B", "d3"), ("C", "d3"),
        ("A", "d4"),
    ]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_linkpred_known_graph(spark):
    out = {
        (r["src_a"], r["src_b"]): r
        for r in linkpred_scores(_edges(spark), min_common=1).collect()
    }
    # deg: d1=2 d2=3 d3=2 d4=1; |N(A)|=3 |N(B)|=3 |N(C)|=2
    ab = out[("A", "B")]
    assert ab["common"] == 2
    assert ab["ra_ppm"] == 1_000_000 // 2 + 1_000_000 // 3
    assert ab["jaccard_ppm"] == 2 * 1_000_000 // (3 + 3 - 2)
    bc = out[("B", "C")]
    assert bc["common"] == 2
    assert bc["ra_ppm"] == 1_000_000 // 3 + 1_000_000 // 2
    assert bc["jaccard_ppm"] == 2 * 1_000_000 // (3 + 2 - 2)
    ac = out[("A", "C")]
    assert ac["common"] == 1
    assert ac["ra_ppm"] == 1_000_000 // 3
    assert ac["jaccard_ppm"] == 1 * 1_000_000 // (3 + 2 - 1)


def test_linkpred_min_common_prunes(spark):
    out = linkpred_scores(_edges(spark), min_common=2)
    pairs = {(r["src_a"], r["src_b"]) for r in out.collect()}
    assert pairs == {("A", "B"), ("B", "C")}


def test_linkpred_hub_cap_drops_hot_dst(spark):
    # d2 (degree 3) removed by cap=2: A-B keep d1 only; B-C keep d3 only
    out = {
        (r["src_a"], r["src_b"]): r
        for r in linkpred_scores(
            _edges(spark), max_hub_degree=2, min_common=1
        ).collect()
    }
    assert set(out) == {("A", "B"), ("B", "C")}
    ab = out[("A", "B")]
    # capped graph degrees: N(A)={d1,d4} N(B)={d1,d3} N(C)={d3}
    assert ab["common"] == 1 and ab["ra_ppm"] == 1_000_000 // 2
    assert ab["jaccard_ppm"] == 1_000_000 // (2 + 2 - 1)
