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


def test_quality_classifier_trained_weights(spark):
    """Trained-weights path: known weights average exactly; OOV grams take
    default_weight_micro; empty docs keep the worst score."""
    w = spark.createDataFrame(
        [("good", 600_000), ("bad", -400_000), ("good bad", 100_000)],
        "term string, weight_micro long",
    )
    df = spark.createDataFrame(
        [(1, "good bad"), (2, "unseen words"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_micro"], r["quality_pass"])
        for r in quality_classifier(df, weights=w).collect()
    }
    # doc 1: grams good, bad, "good bad" -> (600000 - 400000 + 100000) // 3
    assert got[1] == (3, 100_000, True)
    # doc 2: 3 grams, all OOV at default 0
    assert got[2] == (3, 0, True)
    # doc 3: no grams -> worst score
    assert got[3] == (0, -1_000_000, False)
    # non-zero OOV default shifts doc 2's average
    got2 = {
        r["doc_id"]: r["score_micro"]
        for r in quality_classifier(df, weights=w, default_weight_micro=-300_000).collect()
    }
    assert got2[2] == -300_000
    assert got2[1] == 100_000  # fully in-vocabulary doc unaffected
    # out-of-contract weights CLAMP to [-1e6, 1e6] instead of silently
    # breaking offset-space exactness (advice r07): -5e6 behaves as -1e6,
    # +9e6 as +1e6
    w_oob = spark.createDataFrame(
        [("good", 9_000_000), ("bad", -5_000_000), ("good bad", 100_000)],
        "term string, weight_micro long",
    )
    got3 = {
        r["doc_id"]: r["score_micro"]
        for r in quality_classifier(df, weights=w_oob).collect()
    }
    assert got3[1] == (1_000_000 - 1_000_000 + 100_000) // 3


def test_quality_classifier_trained_broadcasts_weights(spark):
    """The weight join must be a broadcast hash join (no shuffle on the
    corpus side for the join itself)."""
    w = spark.createDataFrame([("x", 1000)], "term string, weight_micro long")
    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    plan = (
        quality_classifier(df, weights=w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


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


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_flags_and_admits(spark):
    from knowledge_graph_etl_spark.extensions.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated corpus text about spark engines"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
            (11, "novel content that matches nothing in the corpus"),
            (12, ""),  # token-less: no signature, trivially admitted
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in incremental_dedup(corpus, batch, threshold=0.5).collect()
    }
    assert not out[10]["admitted"]
    assert out[10]["dup_of"] == 1 and out[10]["est_jaccard"] == 1.0
    assert out[11]["admitted"] and out[11]["dup_of"] is None
    assert out[12]["admitted"] and out[12]["n_dups"] == 0
    # batch-internal duplicates are NOT this operator's job
    assert set(out) == {10, 11, 12}


def test_incremental_dedup_best_match_tiebreak(spark):
    from knowledge_graph_etl_spark.extensions.dedup import incremental_dedup

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(5, text), (3, text)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame([(100, text)], ["doc_id", "text"])
    row = incremental_dedup(corpus, batch, threshold=0.5).collect()[0]
    # two perfect matches: n_dups counts both, dup_of ties to smaller id
    assert row["n_dups"] == 2 and row["dup_of"] == 3


def test_incremental_matches_selfpair_semantics(spark):
    """incremental(corpus, batch) must agree with the cross-subset pairs
    of minhash_lsh_pairs run on the union (same machinery guarantee)."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        incremental_dedup,
        minhash_lsh_pairs,
    )

    rows = [
        (i, f"shared common prefix tokens {'x' * (i % 3)} tail {i % 4}")
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = df.where("doc_id % 2 = 1")
    batch = df.where("doc_id % 2 = 0")
    pairs = minhash_lsh_pairs(df, threshold=0.5).collect()
    cross = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in pairs
        if (r["id_a"] % 2) != (r["id_b"] % 2)
    }
    inc = incremental_dedup(corpus, batch, threshold=0.5).collect()
    flagged = {r["doc_id"] for r in inc if not r["admitted"]}
    expect_flagged = {x for p in cross for x in p if x % 2 == 0}
    assert flagged == expect_flagged


def test_incremental_steady_matches_oneshot(spark):
    """Probing the prebuilt bucketed index must return exactly what the
    one-shot form returns on the same corpus/batch/parameters."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_steady,
    )

    rows = [
        (i, f"shared common prefix tokens {'x' * (i % 3)} tail {i % 4}")
        for i in range(1, 31)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = df.where("doc_id % 2 = 1")
    batch = df.where("doc_id % 2 = 0")
    spark.sql("DROP TABLE IF EXISTS t_steady_bands")
    spark.sql("DROP TABLE IF EXISTS t_steady_sigs")
    try:
        build_dedup_index(corpus, "t_steady", num_buckets=4)
        key = lambda r: (  # noqa: E731
            r["doc_id"], r["n_dups"], r["dup_of"], r["est_jaccard"], r["admitted"]
        )
        oneshot = sorted(map(key, incremental_dedup(corpus, batch, threshold=0.5).collect()))
        steady = sorted(
            map(key, incremental_dedup_steady(batch, "t_steady", threshold=0.5).collect())
        )
        assert steady == oneshot and len(steady) == 15
    finally:
        spark.sql("DROP TABLE IF EXISTS t_steady_bands")
        spark.sql("DROP TABLE IF EXISTS t_steady_sigs")


def test_incremental_steady_corpus_side_is_bucketed_scan(spark):
    """Plan evidence for the steady-state claim: with broadcast disabled,
    the probe join reads the corpus band index as a bucketed scan — the
    ONLY Exchange on the candidate join's inputs is over the batch side
    (the corpus paid its shuffle once, at index-build time)."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        build_dedup_index,
        incremental_dedup_steady,
    )

    rows = [(i, f"alpha beta gamma {i % 5}") for i in range(1, 41)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spark.sql("DROP TABLE IF EXISTS t_steadyplan_bands")
    spark.sql("DROP TABLE IF EXISTS t_steadyplan_sigs")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        build_dedup_index(df.where("doc_id % 2 = 1"), "t_steadyplan", num_buckets=4)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = incremental_dedup_steady(
            df.where("doc_id % 2 = 0"), "t_steadyplan", threshold=0.5
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the bands-table scan must carry its bucket spec into the join:
        # scans of t_steadyplan_bands appear with SelectedBucketsCount
        # (bucket pruning metadata) and no Exchange directly above them
        assert "t_steadyplan_bands" in plan
        assert "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_steadyplan_bands")
        spark.sql("DROP TABLE IF EXISTS t_steadyplan_sigs")


# ---------------------------------------------------------------------------
# range_search
# ---------------------------------------------------------------------------


def test_range_search_exact_matches_bruteforce(spark):
    import math

    from knowledge_graph_etl_spark.extensions.similarity import range_search

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.9, 0.1, 0.0],
        3: [0.0, 1.0, 0.0],
        4: [-1.0, 0.0, 0.0],
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], ["vec_id", "embedding"]
    )
    q = df.where("vec_id = 1").selectExpr("vec_id AS query_id", "embedding")
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in range_search(df, q, threshold=0.5).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    expect = {
        (1, k): round(cos(vecs[1], v), 6)
        for k, v in vecs.items()
        if cos(vecs[1], v) >= 0.5
    }
    assert got == expect  # {1: itself, 2: ~0.993} and NOT 3 (0.0) or 4 (-1)


# ---------------------------------------------------------------------------
# ktruss
# ---------------------------------------------------------------------------


def _truss_edges(spark):
    # two triangles (a,b,c) and (b,c,d) sharing edge b-c, plus pendant d-e
    rows = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("b", "d"), ("d", "e")]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_ktruss_known_graph(spark):
    from knowledge_graph_etl_spark.extensions.graph import ktruss

    out3 = {
        (r["src"], r["dst"]): r["support"]
        for r in ktruss(_truss_edges(spark), k=3).collect()
    }
    # 3-truss: pendant d-e (support 0) peeled; both triangles survive
    assert out3 == {
        ("a", "b"): 1,
        ("a", "c"): 1,
        ("b", "c"): 2,
        ("b", "d"): 1,
        ("c", "d"): 1,
    }
    # 4-truss: only b-c has support 2; removing the rest cascades to empty
    out4 = ktruss(_truss_edges(spark), k=4)
    assert out4.count() == 0
    # the empty path must keep the contract schema (src, dst, support) —
    # regression: it returned (u, v, support) and broke downstream
    # projections at SFs where the truss empties
    assert out4.columns == ["src", "dst", "support"]


def test_ktruss_k2_keeps_triangle_free_edges(spark):
    from knowledge_graph_etl_spark.extensions.graph import ktruss

    out = {
        (r["src"], r["dst"]): r["support"]
        for r in ktruss(_truss_edges(spark), k=2).collect()
    }
    assert out[("d", "e")] == 0 and len(out) == 6


def test_ktruss_canonicalizes_and_handles_empty(spark):
    from knowledge_graph_etl_spark.extensions.graph import ktruss

    # reversed/duplicate/self edges collapse; k=3 on one triangle
    rows = [("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "a")]
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = {(r["src"], r["dst"]) for r in ktruss(df, k=3).collect()}
    assert out == {("a", "b"), ("b", "c"), ("a", "c")}
    empty = spark.createDataFrame([], "src string, dst string")
    assert ktruss(empty, k=3).count() == 0


def test_ktruss_oracle_unroll_covers_peeling_depth(spark):
    """graph_ktruss_q runs with max_iter=KTRUSS_ORACLE_ROUNDS at every
    SF the driver gates — assert convergence within that depth at sf0.01
    (ktruss raises past max_iter), mirroring the kcore contract."""
    from __spark_entry__ import KTRUSS_ORACLE_ROUNDS, graph_ktruss_q

    out = graph_ktruss_q(spark, "/root/testdata/sf0.01")
    assert out.count() >= 0  # converging without RuntimeError is the test
    assert KTRUSS_ORACLE_ROUNDS <= 10  # keep the unrolled oracle bounded


# ---------------------------------------------------------------------------
# source_reputation
# ---------------------------------------------------------------------------


def test_source_reputation_matches_python_reference(spark):
    from knowledge_graph_etl_spark.extensions.curation import source_reputation

    rows = [
        (1, "the quick brown fox", "a.example"),
        (2, "jumps over the lazy dog", "a.example"),
        (3, "", "b.example"),
        (4, "one two three four five", "b.example"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r for r in source_reputation(df).collect()}

    from collections import defaultdict

    agg = defaultdict(list)
    for _, text, src in rows:
        n, score, _p = _expected_quality(text)
        ntok = len([t for t in text.lower().strip().split() if t])
        agg[src].append((ntok, score))
    for src, items in agg.items():
        n_docs = len(items)
        total_tokens = sum(t for t, _ in items)
        mean = sum(s + 1_000_000 for _, s in items) // n_docs - 1_000_000
        passes = sum(1 for _, s in items if s >= 0)
        r = got[src]
        assert r["n_docs"] == n_docs
        assert r["total_tokens"] == total_tokens
        assert r["mean_score_micro"] == mean
        assert r["pass_rate_ppm"] == 1_000_000 * passes // n_docs


# ---------------------------------------------------------------------------
# cdc_chunks / cdc_dedup_stats
# ---------------------------------------------------------------------------


_CDC_TEXT = " ".join(f"w{i % 97}x{i % 13}" for i in range(400))


def test_cdc_chunks_roundtrip_and_maxcut(spark):
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks

    df = spark.createDataFrame([(1, _CDC_TEXT)], ["doc_id", "text"])
    rows = sorted(
        cdc_chunks(df, mask_bits=4, max_tokens=64).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert sum(r["n_tokens"] for r in rows) == 400  # partition, no loss
    assert all(1 <= r["n_tokens"] <= 64 for r in rows)
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    # boundaries are content-driven: expected chunk length ~2^4, so a
    # 400-token doc must split into many chunks, not hit only max-cuts
    assert len(rows) > 400 // 64


def test_cdc_boundaries_realign_after_prefix_insertion(spark):
    """THE content-defined property: prepending tokens shifts every
    fixed-size chunk, but CDC boundaries re-align at the first
    content-cut after the insertion — later chunks hash identically."""
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks

    df = spark.createDataFrame(
        [(1, _CDC_TEXT), (2, "inserted prefix tokens here " + _CDC_TEXT)],
        ["doc_id", "text"],
    )
    out = cdc_chunks(df, mask_bits=4, max_tokens=64).collect()
    a = [r["chunk_md5"] for r in out if r["doc_id"] == 1]
    b = [r["chunk_md5"] for r in out if r["doc_id"] == 2]
    shared = set(a) & set(b)
    # all but the first few chunks must be identical between the docs
    assert len(shared) >= len(a) - 3, (len(shared), len(a))


def test_cdc_chunks_min_parity_without_min(spark):
    """min_tokens=1 suppresses nothing: the stateful scan must reproduce
    the window form EXACTLY (same chunks, indices, lengths, hashes)."""
    from knowledge_graph_etl_spark.extensions.curation import (
        cdc_chunks,
        cdc_chunks_min,
    )

    # doc 5's NULL text must behave as the window form does (silently
    # dropped), not crash the Arrow scan (advice r07)
    df = spark.createDataFrame(
        [(1, _CDC_TEXT), (2, "short doc"), (3, ""), (4, "one"), (5, None)],
        "doc_id bigint, text string",
    )
    key = lambda r: (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_md5"])  # noqa: E731
    win = sorted(map(key, cdc_chunks(df, mask_bits=4, max_tokens=64).collect()))
    seq = sorted(
        map(key, cdc_chunks_min(df, mask_bits=4, max_tokens=64, min_tokens=1).collect())
    )
    assert seq == win and len(seq) > 5


def test_cdc_chunks_min_enforces_minimum(spark):
    """With min_tokens=m every chunk except a document's LAST holds >= m
    tokens; the partition (no token loss) and max-cut invariants hold."""
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks_min

    df = spark.createDataFrame([(1, _CDC_TEXT)], ["doc_id", "text"])
    rows = sorted(
        cdc_chunks_min(df, mask_bits=2, max_tokens=16, min_tokens=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert sum(r["n_tokens"] for r in rows) == 400
    assert all(r["n_tokens"] <= 16 for r in rows)
    assert all(r["n_tokens"] >= 8 for r in rows[:-1])
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    # mask_bits=2 -> expected content-chunk ~4 tokens, so the min MUST
    # actually suppress boundaries (chunks differ from the min-free form)
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks

    free = cdc_chunks(df, mask_bits=2, max_tokens=16).collect()
    assert any(r["n_tokens"] < 8 for r in free)  # min-free form has short chunks
    assert len(rows) < len(free)


def test_cdc_chunks_min_matches_python_mirror(spark):
    """Exact per-token mirror of the scan rule in plain Python."""
    import hashlib

    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks_min

    text = " ".join(f"t{i % 37}" for i in range(100))
    mask_bits, mx, mn = 3, 10, 4

    def cut(tok):
        h = int(hashlib.md5(f"cdc:{tok}".encode()).hexdigest()[:15], 16)
        return h % (1 << mask_bits) == 0

    toks = text.split()
    expect, start, n, ci = [], 0, 0, 0
    for i, tk in enumerate(toks):
        n += 1
        if (cut(tk) and n >= mn) or n == mx:
            expect.append((ci, n, hashlib.md5(" ".join(toks[start : i + 1]).encode()).hexdigest()))
            start, n, ci = i + 1, 0, ci + 1
    if n:
        expect.append((ci, n, hashlib.md5(" ".join(toks[start:]).encode()).hexdigest()))

    df = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    got = sorted(
        (
            (r["chunk_idx"], r["n_tokens"], r["chunk_md5"])
            for r in cdc_chunks_min(
                df, mask_bits=mask_bits, max_tokens=mx, min_tokens=mn
            ).collect()
        )
    )
    assert got == expect


def test_cdc_chunks_min_rejects_bad_params(spark):
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks_min

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        cdc_chunks_min(df, min_tokens=0)
    with pytest.raises(ValueError):
        cdc_chunks_min(df, max_tokens=8, min_tokens=9)


def test_cdc_dedup_stats_counts_duplicate_chunks(spark):
    from knowledge_graph_etl_spark.extensions.curation import cdc_dedup_stats

    df = spark.createDataFrame(
        [(1, _CDC_TEXT), (2, _CDC_TEXT)], ["doc_id", "text"]
    )
    r = cdc_dedup_stats(df).collect()[0]
    assert r["n_tokens"] == 800 and r["unique_tokens"] == 400
    assert r["n_chunks"] == 2 * r["n_unique_chunks"]
    assert r["dedup_ratio_ppm"] == 500_000


# ---------------------------------------------------------------------------
# bm25_topk / bm25_scores
# ---------------------------------------------------------------------------


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Pure-python BM25 mirror (Lucene +1-idf), micro-quantized like the
    operator: floor(contrib * 1e6 + 0.5) per term, summed as ints."""
    import math

    toked = {d: t.lower().split() for d, t in docs}
    lens = {d: len(t) for d, t in toked.items() if t}
    n = len(lens)
    avgdl = sum(lens.values()) / n
    out = {}
    for qid, qtext in queries:
        terms = set(qtext.lower().split())
        scores = {}
        for t in terms:
            df = sum(1 for tk in toked.values() if t in tk)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, tk in toked.items():
                tf = tk.count(t)
                if tf == 0:
                    continue
                contrib = (
                    idf
                    * tf
                    * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * lens[d] / avgdl))
                )
                nh, s = scores.get(d, (0, 0))
                scores[d] = (nh + 1, s + math.floor(contrib * 1e6 + 0.5))
        out[qid] = scores
    return out


def test_bm25_matches_python_reference(spark):
    from knowledge_graph_etl_spark.extensions.search import bm25_topk

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, "a completely different document about spark"),
        (5, "the the the the the the the the"),
        (6, ""),
    ]
    queries = [(100, "the cat"), (101, "spark"), (102, "zzz_absent")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame(queries, ["qid", "query"])
    got = bm25_topk(ddf, qdf, k=10).collect()
    ref = _bm25_reference(docs, queries)
    # every returned row matches the reference score exactly
    for r in got:
        nh, s = ref[r["qid"]][r["doc_id"]]
        assert (r["n_hit_terms"], r["score_micro"]) == (nh, s), dict(r)
    # zero-hit query produces no rows; others return all matching docs
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    assert 102 not in by_q
    assert {r["doc_id"] for r in by_q[100]} == set(ref[100])
    assert {r["doc_id"] for r in by_q[101]} == set(ref[101])
    # ranks are dense from 1 and ordered by (-score, doc_id)
    for qid, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        key = [(-r["score_micro"], r["doc_id"]) for r in rows]
        assert key == sorted(key)


def test_bm25_prefers_rarer_term_and_shorter_doc(spark):
    """Directional sanity: a doc matching a rare term outranks one
    matching only a ubiquitous term; among equal-tf docs the shorter
    wins (length normalization)."""
    from knowledge_graph_etl_spark.extensions.search import bm25_topk

    docs = [
        (1, "common rare"),
        (2, "common common common common common common"),
        (3, "common"),
        (4, "common filler filler filler"),
    ]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame([(1, "rare common")], ["qid", "query"])
    rows = sorted(
        bm25_topk(ddf, qdf, k=4).collect(), key=lambda r: r["rank"]
    )
    assert rows[0]["doc_id"] == 1  # rare-term doc on top
    docs_by_rank = [r["doc_id"] for r in rows]
    assert docs_by_rank.index(3) < docs_by_rank.index(4)  # shorter wins


def test_bm25_k_truncation_and_validation(spark):
    from knowledge_graph_etl_spark.extensions.search import bm25_topk

    ddf = spark.createDataFrame(
        [(i, "term filler%d" % i) for i in range(8)], ["doc_id", "text"]
    )
    qdf = spark.createDataFrame([(1, "term")], ["qid", "query"])
    assert bm25_topk(ddf, qdf, k=3).count() == 3
    with pytest.raises(ValueError):
        bm25_topk(ddf, qdf, k=0)


# ---------------------------------------------------------------------------
# rrf_fuse (hybrid retrieval)
# ---------------------------------------------------------------------------


def test_rrf_fuse_matches_hand_computation(spark):
    from knowledge_graph_etl_spark.extensions.search import rrf_fuse

    # qid 1: doc 10 ranked 1st by A and 2nd by B; doc 20 only in A (2nd);
    # doc 30 only in B (1st).
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], ["qid", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 30, 1), (1, 10, 2)], ["qid", "doc_id", "rank"]
    )
    rows = {
        r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()
    }
    c1, c2 = 1_000_000 // 61, 1_000_000 // 62
    assert rows[10]["rrf_micro"] == c1 + c2 and rows[10]["n_systems"] == 2
    assert rows[20]["rrf_micro"] == c2 and rows[20]["n_systems"] == 1
    assert rows[30]["rrf_micro"] == c1 and rows[30]["n_systems"] == 1
    # two-system doc on top, then the two single-system docs by their
    # contribution; tie impossible here, ranks dense from 1
    assert rows[10]["rank"] == 1 and rows[30]["rank"] == 2
    assert rows[20]["rank"] == 3


def test_rrf_fuse_tie_breaks_on_doc_id_and_topk(spark):
    from knowledge_graph_etl_spark.extensions.search import rrf_fuse

    # docs 5 and 7 get identical contributions -> tie broken by doc_id
    a = spark.createDataFrame(
        [(1, 7, 1), (1, 5, 2), (1, 9, 3)], ["qid", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 5, 1), (1, 7, 2)], ["qid", "doc_id", "rank"]
    )
    rows = sorted(
        rrf_fuse([a, b], k=60).collect(), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in rows[:2]] == [5, 7]
    assert rows[0]["rrf_micro"] == rows[1]["rrf_micro"]
    # topk truncation keeps only the fused head
    top1 = rrf_fuse([a, b], k=60, topk=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == 5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with _pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_rrf_fuse_single_system_preserves_order(spark):
    from knowledge_graph_etl_spark.extensions.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 30, 1)], ["qid", "doc_id", "rank"]
    )
    rows = rrf_fuse([a], k=60).collect()
    got = {(r["qid"], r["doc_id"]): r["rank"] for r in rows}
    assert got == {(1, 10): 1, (1, 20): 2, (2, 30): 1}


def test_rrf_fuse_weighted(spark):
    from knowledge_graph_etl_spark.extensions.search import rrf_fuse

    a = spark.createDataFrame([(1, 10, 1), (1, 20, 2)], ["qid", "doc_id", "rank"])
    b = spark.createDataFrame([(1, 20, 1), (1, 10, 2)], ["qid", "doc_id", "rank"])
    # heavily weight system a: doc 10 (a-rank 1) must beat doc 20 (b-rank 1)
    rows = {
        r["doc_id"]: r
        for r in rrf_fuse([a, b], k=60, weights_ppm=[900_000, 100_000]).collect()
    }
    assert rows[10]["rrf_micro"] == 900_000 // 61 + 100_000 // 62
    assert rows[20]["rrf_micro"] == 900_000 // 62 + 100_000 // 61
    assert rows[10]["rank"] == 1 and rows[20]["rank"] == 2
    # default weights reproduce the unweighted form bit-for-bit
    unw = sorted(map(tuple, rrf_fuse([a, b], k=60).collect()))
    expl = sorted(
        map(tuple, rrf_fuse([a, b], k=60, weights_ppm=[1_000_000, 1_000_000]).collect())
    )
    assert unw == expl
    with pytest.raises(ValueError):
        rrf_fuse([a, b], k=60, weights_ppm=[1_000_000])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], k=60, weights_ppm=[1_000_000, -1])


# ---------------------------------------------------------------------------
# boolean_search
# ---------------------------------------------------------------------------


def test_parse_boolean_query_forms():
    from knowledge_graph_etl_spark.extensions.search import parse_boolean_query

    assert parse_boolean_query("a b") == ([[("term", "a")], [("term", "b")]], [])
    assert parse_boolean_query('A OR b c -D "x y z"') == (
        [
            [("term", "a"), ("term", "b")],
            [("term", "c")],
            [("phrase", "x", "y", "z")],
        ],
        ["d"],
    )
    # single-token phrase degrades to a term atom
    assert parse_boolean_query('"solo"') == ([[("term", "solo")]], [])
    import pytest as _pytest

    for bad in ["OR a", "a OR", "a OR -b", '-"x y"', "", '""']:
        with _pytest.raises(ValueError):
            parse_boolean_query(bad)


def test_boolean_search_matches_semantics(spark):
    from knowledge_graph_etl_spark.extensions.search import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta alpha"),          # has both terms, not the phrase
            (3, "alpha beta"),          # phrase hit
            (4, "gamma delta"),
            (5, "alpha beta gamma dup"),
        ],
        ["doc_id", "text"],
    )
    out = boolean_search(
        docs,
        [
            (1, "alpha beta"),            # AND
            (2, '"alpha beta"'),          # phrase adjacency
            (3, "gamma OR delta -dup"),   # OR group + negation
            (4, "-alpha"),                # pure negation
        ],
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], set()).add(r["doc_id"])
    assert got[1] == {1, 2, 3, 5}
    assert got[2] == {1, 3, 5}
    assert got[3] == {1, 4}
    assert got[4] == {4}


def test_boolean_search_single_scan_no_shuffle(spark):
    """All queries evaluate in one scan: the physical plan has no
    Exchange (filter + project + generate only)."""
    from knowledge_graph_etl_spark.extensions.search import boolean_search

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        boolean_search(docs, [(1, "a"), (2, '"b c"')])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError):
        boolean_search(docs, [])


def test_append_to_dedup_index_grows_corpus(spark):
    """Admission cycle: build → probe → append admitted → a later batch
    duplicating an appended doc is flagged against it; the appended
    table keeps its bucket spec (probe plan still bucket-pruned)."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        incremental_dedup_steady,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    novel = "totally different content about spark engines here"
    spark.sql("DROP TABLE IF EXISTS t_grow_bands")
    spark.sql("DROP TABLE IF EXISTS t_grow_sigs")
    try:
        build_dedup_index(corpus, "t_grow", num_buckets=4)
        b1 = spark.createDataFrame([(10, novel)], ["doc_id", "text"])
        r1 = incremental_dedup_steady(b1, "t_grow", threshold=0.5).collect()[0]
        assert r1["admitted"]
        append_to_dedup_index(b1.where("doc_id = 10"), "t_grow", num_buckets=4)
        # a re-submission of the admitted text must now be rejected vs doc 10
        b2 = spark.createDataFrame([(20, novel)], ["doc_id", "text"])
        r2 = incremental_dedup_steady(b2, "t_grow", threshold=0.5).collect()[0]
        assert not r2["admitted"] and r2["dup_of"] == 10
        # bucket spec survived the append
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                incremental_dedup_steady(b2, "t_grow", threshold=0.5)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "SelectedBucketsCount" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_grow_bands")
        spark.sql("DROP TABLE IF EXISTS t_grow_sigs")


def test_steady_admission_multi_batch_cycle(spark):
    """The full steady-state admission CYCLE over two batches: probe →
    filter to admitted → append_to_dedup_index → probe the next batch.
    Batch-2 rejections must include batch-1 ADMITS (the index tracks the
    corpus, dedup.py append contract), corpus dups must still reject,
    index row growth must equal the admitted count, and the appended
    tables must keep their bucket spec (probe plan still bucket-pruned)."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        incremental_dedup_steady,
    )

    c1 = "alpha beta gamma delta epsilon zeta eta theta"
    c2 = "one two three four five six seven eight"
    n1 = "spark engine shuffles partitions across executors tonight"
    n2 = "ducks swim quietly under the old stone bridge"
    n3 = "fresh novel content nobody has ever indexed before"
    corpus = spark.createDataFrame(
        [(1, c1), (2, c2)], ["doc_id", "text"]
    )
    spark.sql("DROP TABLE IF EXISTS t_cycle_bands")
    spark.sql("DROP TABLE IF EXISTS t_cycle_sigs")
    try:
        build_dedup_index(corpus, "t_cycle", num_buckets=4)
        b1 = spark.createDataFrame(
            [(10, c1), (11, n1), (12, n2)], ["doc_id", "text"]
        )
        r1 = {r["doc_id"]: r for r in
              incremental_dedup_steady(b1, "t_cycle", threshold=0.5).collect()}
        assert not r1[10]["admitted"] and r1[10]["dup_of"] == 1
        assert r1[11]["admitted"] and r1[12]["admitted"]
        admitted_ids = [i for i, r in r1.items() if r["admitted"]]
        sigs_before = spark.table("t_cycle_sigs").count()
        append_to_dedup_index(
            b1.where(F.col("doc_id").isin(admitted_ids)), "t_cycle",
            num_buckets=4,
        )
        # index grew by exactly the admitted rows
        assert spark.table("t_cycle_sigs").count() == sigs_before + 2
        b2 = spark.createDataFrame(
            [(20, n1), (21, c2), (22, n3)], ["doc_id", "text"]
        )
        r2 = {r["doc_id"]: r for r in
              incremental_dedup_steady(b2, "t_cycle", threshold=0.5).collect()}
        # batch-2 rejection against a batch-1 ADMIT — the cycle's point
        assert not r2[20]["admitted"] and r2[20]["dup_of"] == 11
        # corpus dups still reject after the append
        assert not r2[21]["admitted"] and r2[21]["dup_of"] == 2
        assert r2[22]["admitted"]
        # bucket spec survived the append: probe still bucket-pruned
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                incremental_dedup_steady(b2, "t_cycle", threshold=0.5)
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "SelectedBucketsCount" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cycle_bands")
        spark.sql("DROP TABLE IF EXISTS t_cycle_sigs")


def test_phrase_search_occurrences_and_overlap(spark):
    from knowledge_graph_etl_spark.extensions.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),     # "a b" twice
            (2, "a a a"),         # "a a" overlapping -> 2 occurrences
            (3, "b a"),           # reversed, no "a b"
            (4, "x y z"),
        ],
        ["doc_id", "text"],
    )
    out = phrase_search(
        docs, [(1, "a b"), (2, "a a"), (3, "x y z"), (4, "c")]
    ).collect()
    got = {(r["qid"], r["doc_id"]): r["n_occurrences"] for r in out}
    assert got == {
        (1, 1): 2,
        (2, 2): 2,   # overlapping starts at pos 0 and 1
        (3, 4): 1,
        (4, 1): 1,   # single-term phrase = term frequency
    }
    with pytest.raises(ValueError):
        phrase_search(docs, [])
    with pytest.raises(ValueError):
        phrase_search(docs, [(1, "  ")])


def test_phrase_search_posting_table_is_vocab_filtered(spark):
    """The posting scan must filter to the phrase vocabulary before any
    shuffle: the physical plan's scan-side filter names the terms."""
    from knowledge_graph_etl_spark.extensions.search import phrase_search

    docs = spark.createDataFrame([(1, "p q r")], ["doc_id", "text"])
    # the operator's localCheckpoint severs the posting subtree from the
    # final plan, so assert on the pre-checkpoint posting construction:
    # vocabulary filter + posexplode compile to a single shuffle-free scan
    from knowledge_graph_etl_spark.extensions.text import tokens as _tk
    from pyspark.sql import functions as _F

    pre = (
        docs.select(
            _F.col("doc_id"),
            _F.posexplode(_tk(_F.col("text"))).alias("pos", "term"),
        )
        .where(_F.col("term").isin(["p", "q"]))
    )
    pplan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in pplan, pplan


def test_quality_classifier_trained_edge_contracts(spark):
    """Review-pinned edges: duplicate weight terms resolve to MAX (no
    join fan-out), out-of-range OOV default rejected, broadcast optional."""
    from knowledge_graph_etl_spark.extensions.curation import quality_classifier

    w = spark.createDataFrame(
        [("x", 100_000), ("x", 700_000)], "term string, weight_micro long"
    )
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    r = quality_classifier(df, weights=w).collect()[0]
    assert r["n_feats"] == 1 and r["score_micro"] == 700_000
    with pytest.raises(ValueError):
        quality_classifier(df, weights=w, default_weight_micro=-2_000_000)
    r2 = quality_classifier(df, weights=w, broadcast_weights=False).collect()[0]
    assert (r2["n_feats"], r2["score_micro"]) == (1, 700_000)


def test_negative_samples_never_positive_and_deterministic(spark):
    from knowledge_graph_etl_spark.extensions.graph import negative_edge_samples

    edges = spark.createDataFrame(
        [(s, d) for s in range(5) for d in range(10) if (s + d) % 3 != 0],
        "src bigint, dst bigint",
    )
    pos = {(r["src"], r["dst"]) for r in edges.collect()}
    out = negative_edge_samples(edges, m=3).collect()
    assert out, "must produce negatives"
    for r in out:
        assert (r["src"], r["pos_dst"]) in pos       # anchored to a positive
        assert (r["src"], r["neg_dst"]) not in pos   # never a false negative
    # <= m per positive edge, and rerun-identical
    from collections import Counter

    per_edge = Counter((r["src"], r["pos_dst"]) for r in out)
    assert max(per_edge.values()) <= 3
    again = negative_edge_samples(edges, m=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# steady-state inverted index (search.build_text_index / bm25_topk_steady)
# ---------------------------------------------------------------------------


def _drop_text_index(spark, prefix):
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_postings")
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_stats")


def test_bm25_steady_equals_one_shot(spark):
    """Probe of the prebuilt index is bit-identical to bm25_topk over the
    same corpus — same scoring expression (_bm25_contrib), same stats."""
    from knowledge_graph_etl_spark.extensions.search import (
        bm25_topk,
        bm25_topk_steady,
        build_text_index,
    )

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, "a completely different document about spark"),
        (5, ""),
    ]
    queries = [(100, "the cat"), (101, "spark log")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame(queries, ["qid", "query"])
    _drop_text_index(spark, "t_txtidx")
    try:
        build_text_index(ddf, "t_txtidx", num_buckets=4)
        got = {tuple(r) for r in bm25_topk_steady(qdf, "t_txtidx", k=10).collect()}
        want = {tuple(r) for r in bm25_topk(ddf, qdf, k=10).collect()}
        assert got == want and got
    finally:
        _drop_text_index(spark, "t_txtidx")


def test_bm25_steady_append_equals_union_oneshot(spark):
    """append_to_text_index then probe == one-shot over the union corpus:
    df, N and avgdl all recompose from the appended postings + stats
    partials."""
    from knowledge_graph_etl_spark.extensions.search import (
        append_to_text_index,
        bm25_topk,
        bm25_topk_steady,
        build_text_index,
    )

    base = [
        (1, "alpha beta gamma"),
        (2, "alpha alpha delta"),
        (3, "gamma delta epsilon"),
    ]
    batch = [(10, "alpha zeta"), (11, "beta beta beta eta")]
    queries = [(7, "alpha beta"), (8, "zeta")]
    qdf = spark.createDataFrame(queries, ["qid", "query"])
    _drop_text_index(spark, "t_txtidx2")
    try:
        build_text_index(
            spark.createDataFrame(base, ["doc_id", "text"]),
            "t_txtidx2",
            num_buckets=4,
        )
        append_to_text_index(
            spark.createDataFrame(batch, ["doc_id", "text"]),
            "t_txtidx2",
            num_buckets=4,
        )
        got = {
            tuple(r)
            for r in bm25_topk_steady(qdf, "t_txtidx2", k=10).collect()
        }
        union = spark.createDataFrame(base + batch, ["doc_id", "text"])
        want = {tuple(r) for r in bm25_topk(union, qdf, k=10).collect()}
        assert got == want and got
    finally:
        _drop_text_index(spark, "t_txtidx2")


def test_bm25_steady_probe_is_bucket_pruned(spark):
    """The probe's postings scan carries SelectedBucketsCount (bucket
    pruning from the literal term IN filter) — the shuffle-free index
    property; and empty/invalid probes behave."""
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.search import (
        bm25_topk_steady,
        build_text_index,
    )

    docs = [(i, f"term{i} shared") for i in range(1, 9)]
    qdf = spark.createDataFrame([(1, "term3")], ["qid", "query"])
    _drop_text_index(spark, "t_txtidx3")
    try:
        build_text_index(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "t_txtidx3",
            num_buckets=8,
        )
        out = bm25_topk_steady(qdf, "t_txtidx3", k=5)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "SelectedBucketsCount" in plan, plan
        assert [r.doc_id for r in out.collect()] == [3]
        # empty query vocabulary -> empty result, no table scan crash
        eq = spark.createDataFrame([(9, "")], ["qid", "query"])
        assert bm25_topk_steady(eq, "t_txtidx3", k=5).count() == 0
        with _pytest.raises(ValueError):
            bm25_topk_steady(qdf, "t_txtidx3", k=0)
    finally:
        _drop_text_index(spark, "t_txtidx3")


def test_connected_components_structure_and_sizes(spark):
    from knowledge_graph_etl_spark.extensions.graph import (
        connected_components,
    )

    # two components: {1,2,3} (chain) and {10,11}; min-id labels
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    out = {r.node: r for r in connected_components(e).collect()}
    assert {n: (r.component, r.component_size) for n, r in out.items()} == {
        1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2),
    }


def test_connected_components_transitive_long_chain(spark):
    from knowledge_graph_etl_spark.extensions.graph import (
        connected_components,
    )

    # a 20-node chain exercises pointer jumping past one round's reach
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)], "src long, dst long"
    )
    out = connected_components(e).collect()
    assert len(out) == 20
    assert all(r.component == 1 and r.component_size == 20 for r in out)


def test_degree_assortativity_disassortative_and_guard(spark):
    from knowledge_graph_etl_spark.extensions.graph import degree_assortativity

    # perfectly disassortative bipartite graph: one hub source fans out
    # to 4 degree-1 dests (pairs (4,1)), and 4 degree-1 sources converge
    # on one hub dest (pairs (1,4)) -> endpoint degrees perfectly
    # anticorrelated, r = -1
    edges = [("h", f"d{i}") for i in range(4)] + [
        (f"s{i}", "hd") for i in range(4)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    assert r.n_edges == 8
    assert abs(r.r - (-1.0)) < 1e-6, r

    # degree-regular graph: zero variance on both sides -> the den=0
    # guard reports 0, not NaN
    edges = [(f"s{i}", f"d{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    assert (r.n_edges, r.r) == (5, 0.0)


def test_degree_assortativity_distinct_edges(spark):
    from knowledge_graph_etl_spark.extensions.graph import degree_assortativity

    # duplicate edge rows must not inflate degrees: same graph as the
    # disassortative case with every edge repeated 3x -> identical r
    base = [("h", f"d{i}") for i in range(4)] + [
        (f"s{i}", "hd") for i in range(4)
    ]
    df = spark.createDataFrame(base * 3, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    assert r.n_edges == 8 and abs(r.r - (-1.0)) < 1e-6, r


def test_build_dedup_index_auto_buckets_scale_with_corpus(spark):
    """num_buckets=None (the r12 default) sizes the bucket count to the
    corpus — max(16, rows/target) rounded up to a power of two — records
    it in the metastore, probes return output identical to an
    explicitly-bucketed build, and appends inherit the count with no
    caller plumbing."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        _auto_num_buckets,
        _table_num_buckets,
        append_to_dedup_index,
        build_dedup_index,
        incremental_dedup_steady,
    )

    # the sizing rule itself
    assert _auto_num_buckets(1) == 16
    assert _auto_num_buckets(16 * 250_000) == 16
    assert _auto_num_buckets(16 * 250_000 + 1) == 32
    assert _auto_num_buckets(10_000_000) == 64  # 40 buckets needed -> 64
    assert _auto_num_buckets(100, target=10) == 16
    assert _auto_num_buckets(1000, target=10) == 128  # scales with corpus

    rows = [
        (i, f"shared common prefix tokens {'x' * (i % 3)} tail {i % 4}")
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = df.where("doc_id % 2 = 1")
    batch = df.where("doc_id % 2 = 0")
    for t in ("t_auto_bands", "t_auto_sigs", "t_pin_bands", "t_pin_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        build_dedup_index(corpus, "t_auto")  # auto: 30 rows -> floor 16
        assert _table_num_buckets(spark, "t_auto_bands") == 16
        build_dedup_index(corpus, "t_pin", num_buckets=4)
        assert _table_num_buckets(spark, "t_pin_bands") == 4
        key = lambda r: (  # noqa: E731
            r["doc_id"], r["n_dups"], r["dup_of"], r["est_jaccard"], r["admitted"]
        )
        auto = sorted(
            map(key, incremental_dedup_steady(batch, "t_auto", threshold=0.5).collect())
        )
        pinned = sorted(
            map(key, incremental_dedup_steady(batch, "t_pin", threshold=0.5).collect())
        )
        assert auto == pinned and len(auto) == 30
        # append with NO num_buckets argument inherits the stored spec
        admitted = batch.limit(3)
        append_to_dedup_index(admitted, "t_auto")
        assert _table_num_buckets(spark, "t_auto_bands") == 16
        append_to_dedup_index(admitted, "t_pin")
        assert _table_num_buckets(spark, "t_pin_bands") == 4
    finally:
        for t in ("t_auto_bands", "t_auto_sigs", "t_pin_bands", "t_pin_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
