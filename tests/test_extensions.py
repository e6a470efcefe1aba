"""Tests for the beyond-reference extension operators: dedup families
(exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity search
(brute-force, LSH, IVF), and the scale guards the 100 TB design relies on.

The md5 hash_fn variants are verified end-to-end against DuckDB oracles by
the driver (tools/check_oracle.py); these tests cover the xxhash64 scale
paths and the structural invariants the oracles can't express (skew
bounds, broadcast-vs-shuffle plan equivalence, recall floors, subset
containment).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from knowledge_graph_etl_spark.extensions.similarity import (
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind distant purple mountains and rivers flow quietly through green valleys"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("purple", "orange")),  # near-dup of 0
        (3, "completely different text about databases indexes and query engines"),
        (4, "yet another unrelated document concerning maritime navigation charts"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # 20..24: tiny perturbations of 0..4 → guaranteed near-dups
    for i in range(5):
        rows.append((20 + i, [float(x + 0.001) for x in base[i]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


# -- minhash ----------------------------------------------------------------


def test_minhash_both_hash_fns_find_duplicates(docs):
    for hash_fn in ("xxhash64", "md5"):
        out = minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, threshold=0.5, hash_fn=hash_fn
        )
        rows = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out.collect()}
        assert rows[(0, 1)] == 1.0, hash_fn  # exact dup: all hashes agree
        assert (0, 2) in rows and rows[(0, 2)] >= 0.5, hash_fn  # near-dup
        assert (3, 4) not in rows, hash_fn  # unrelated never paired


# -- n-gram jaccard + skew guard ----------------------------------------------


def test_ngram_jaccard_exact_pairs(docs):
    out = ngram_jaccard_pairs(docs, n=3, threshold=0.7)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert rows[(0, 1)] == 1.0
    # one word changed in a long doc: most shingles survive → jaccard > 0.7
    assert (0, 2) in rows and 0.7 < rows[(0, 2)] < 1.0


def test_ngram_hot_shingle_skew_guard(spark):
    # 60 documents sharing ONE viral shingle but otherwise disjoint: the
    # inverted-index join would emit 60·59/2 = 1770 candidate rows for that
    # single key; the frequency cap drops it, bounding candidates to 0.
    hot = "click here now"
    rows = [(i, f"{hot} unique{i} filler{i} token{i} body{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = ngram_jaccard_pairs(df, n=3, threshold=0.1, max_shingle_freq=50)
    assert guarded.count() == 0
    unguarded = ngram_jaccard_pairs(df, n=3, threshold=0.1, max_shingle_freq=None)
    assert unguarded.count() == 1770  # the k² blowup the default prevents


def test_ngram_guard_keeps_true_dups(spark):
    # true near-dups still found with the cap active: shared content
    # shingles are below the frequency cap
    rows = [(0, BASE), (1, BASE)] + [
        (i, f"noise{i} padding{i} words{i} etc{i} more{i}") for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, n=3, threshold=0.8, max_shingle_freq=10)
    assert _pairs(out) == {(0, 1)}


# -- simhash ------------------------------------------------------------------


def test_simhash_both_hash_fns(docs):
    for hash_fn in ("xxhash64", "md5"):
        out = simhash_pairs(docs, max_hamming=3, blocks=4, hash_fn=hash_fn)
        rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
        assert rows[(0, 1)] == 0, hash_fn  # identical text → identical simhash
        assert (3, 4) not in rows, hash_fn  # unrelated docs never paired


def test_simhash_md5_matches_python_reference(spark):
    """Unit oracle for the md5 simhash path: recompute the per-bit majority
    vote in pure Python (hashlib.md5) and compare segments exactly."""
    import hashlib

    from knowledge_graph_etl_spark.extensions.text import simhash_segments_table

    texts = {0: BASE, 1: "alpha beta gamma", 2: "one two three four five six"}

    def ref_segments(text: str) -> list[int]:
        toks = set(text.lower().strip().split())
        segs = []
        for k in range(4):
            votes = [0] * 16
            for t in toks:
                v = int(hashlib.md5(t.encode()).hexdigest()[4 * k : 4 * k + 4], 16)
                for b in range(16):
                    votes[b] += 1 if (v >> b) & 1 else -1
            segs.append(sum((1 << b) for b in range(16) if votes[b] > 0))
        return segs

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["id"]: [r["seg0"], r["seg1"], r["seg2"], r["seg3"]]
        for r in simhash_segments_table(df, hash_fn="md5").collect()
    }
    for i, text in texts.items():
        assert got[i] == ref_segments(text), i


# -- similarity ---------------------------------------------------------------


def _queries(vectors):
    return vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_lsh_topk_broadcast_and_shuffle_paths_equal(vectors):
    q = _queries(vectors)
    a = lsh_topk(vectors, q, k=5, dim=16, broadcast_queries=True)
    b = lsh_topk(vectors, q, k=5, dim=16, broadcast_queries=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lsh_topk_finds_perturbed_neighbor(vectors):
    q = _queries(vectors)
    out = lsh_topk(vectors, q, k=5, dim=16)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid in (0, 1, 2):
        # the 0.001-perturbed twin (id+20) shares every bucket in practice
        assert qid + 20 in by_q[qid]
        assert by_q[qid][0] == qid  # rank 1 = the query itself (cos 1.0)


def test_ivf_topk_recall_vs_exact(vectors):
    q = _queries(vectors)
    exact = cosine_topk(vectors, q, k=5)
    approx = ivf_topk(vectors, q, k=5, nlist=4, nprobe=2)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # nprobe/nlist = 1/2 of the lists probed → demand ≥ 60% recall and the
    # trivial self+twin hits
    assert len(ex & ap) / len(ex) >= 0.6
    for qid in (0, 1, 2):
        assert (qid, qid) in ap


def test_ivf_topk_plan_no_literal_centroids(vectors):
    q = _queries(vectors)
    plan = ivf_topk(vectors, q, k=5, nlist=4, nprobe=2)._jdf.queryExecution().toString()
    # the plan must not embed centroid vectors as literals — assignment goes
    # through the pandas UDF over a broadcast numpy matrix
    assert "pythonUDF" in plan or "ArrowEvalPython" in plan


def test_neardup_lsh_subset_of_exact_with_recall(vectors):
    exact = cosine_neardup_pairs(vectors, threshold=0.9, block_size=8)
    approx = cosine_neardup_lsh(vectors, threshold=0.9, dim=16)
    ex, ap = _pairs(exact), _pairs(approx)
    assert ap <= ex  # exact rescoring → no false positives
    assert len(ap) >= 0.8 * len(ex)  # 4 tables × 8 planes → high recall here
    for i in range(5):
        assert (i, 20 + i) in ap  # the planted twins all land in shared buckets


def test_exact_dedup_groups(docs):
    out = {r["keep_id"]: r["group_size"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 identical
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_winnow_fingerprints_shared_run_guarantee(spark):
    """Winnowing guarantee: two documents sharing a run of >= window+k-1
    tokens share at least one fingerprint; disjoint docs share none."""
    from knowledge_graph_etl_spark.extensions.text import winnow_fingerprints

    k, w = 4, 5
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= w+k-1
    rows = [
        ("a", f"one two {shared} three"),
        ("b", f"{shared} four five six"),
        ("c", "totally different words with no overlap at all here"),
        ("d", "tiny doc"),  # < k tokens -> empty fingerprint set
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=k, window=w).alias("fps")
        ).collect()
    }
    assert fps["a"] & fps["b"], "shared run must yield a shared fingerprint"
    assert not (fps["a"] & fps["c"])
    assert fps["d"] == set()


def test_sample_frames_fanout_and_kind_filter(spark):
    from knowledge_graph_etl_spark.extensions.multimodal import sample_frames

    rows = [
        ("v1", "video", b"payload-1", 2500),   # frames at 0,1000,2000
        ("v2", "video", b"payload-2", 999),    # frame at 0
        ("v3", "video", None, 5000),           # null payload -> skipped
        ("a1", "audio", b"payload-3", 9000),   # wrong kind -> filtered
        ("v4", "video", b"payload-4", None),   # null duration -> skipped
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, duration_ms long"
    )
    out = sample_frames(media, every_ms=1000).collect()
    got = {(r["media_id"], r["frame_ts_ms"]) for r in out}
    assert got == {("v1", 0), ("v1", 1000), ("v1", 2000), ("v2", 0)}
    # frames are deterministic: same payload+ts -> same bytes across runs
    again = {(r["media_id"], r["frame_ts_ms"], bytes(r["frame"])) for r in
             sample_frames(media, every_ms=1000).collect()}
    first = {(r["media_id"], r["frame_ts_ms"], bytes(r["frame"])) for r in out}
    assert again == first


def test_ivf_kmeans_centroids_recall(spark):
    """Lloyd-refined centroids: recall@k vs exact top-k must clear a floor
    and not regress against the md5-sample init at the same nprobe."""
    from knowledge_graph_etl_spark.extensions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }

    def recall(centroids):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, k=10, nlist=16, nprobe=4, centroids=centroids
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_sample = recall("sample")
    r_kmeans = recall("kmeans")
    assert r_kmeans >= 0.5
    # refinement must not hurt at matched parameters (small tolerance for
    # assignment boundary flips on this tiny corpus)
    assert r_kmeans >= r_sample - 0.1


def test_resize_images_plumbing(spark):
    from knowledge_graph_etl_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rows = [
        ("i1", "image", b"img-bytes-1", "image/png", 640, 480, None),
        ("i2", "image", None, "image/png", 10, 10, None),
        ("a1", "audio", b"wav", "audio/wav", None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, 64, 64).collect()}
    assert set(out) == {"i1", "i2"}  # non-images filtered
    assert out["i1"]["width"] == 64 and out["i1"]["height"] == 64
    assert len(bytes(out["i1"]["payload"])) == (64 * 64) // 64
    assert out["i2"]["payload"] is None  # null payload preserved
    # deterministic: same input -> same resized bytes
    again = {r["media_id"]: r for r in resize_images(media, 64, 64).collect()}
    assert bytes(again["i1"]["payload"]) == bytes(out["i1"]["payload"])


def test_word_shingles_null_and_short_text(spark):
    from knowledge_graph_etl_spark.extensions.dedup import word_shingles

    df = spark.createDataFrame(
        [("a", None), ("b", ""), ("c", "one two"), ("d", "one two three four")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", word_shingles(F.col("text"), 3).alias("sh")).collect()
    }
    # empty array, never NULL (callers compute size()/explode on it)
    assert got["a"] == [] and got["b"] == [] and got["c"] == []
    assert got["d"] == ["one two three", "two three four"]


def test_ivf_kmeans_small_corpus(spark):
    """Corpus smaller than nlist: fewer centroids, no crash."""
    from knowledge_graph_etl_spark.extensions.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").where(
        F.col("vec_id") < 10
    )
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries, k=5, nlist=16, nprobe=4, centroids="kmeans")
    assert out.count() > 0


def test_winnow_rows_equivalent_to_array_form(spark):
    from knowledge_graph_etl_spark.extensions.text import (
        winnow_fingerprint_rows,
        winnow_fingerprints,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    arr = {
        (r["doc_id"], fp)
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=4, window=5).alias("fps")
        ).collect()
        for fp in r["fps"]
    }
    rows = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprint_rows(docs, k=4, window=5).collect()
    }
    assert rows == arr and len(rows) > 0


def test_blank_docs_produce_no_dedup_pairs(spark):
    from knowledge_graph_etl_spark.extensions.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [("1", ""), ("2", "   "), ("3", "\t"), ("4", "real text here okay")],
        "doc_id string, text string",
    )
    # blank docs must NOT pair up as est_jaccard=1.0 duplicates
    assert minhash_lsh_pairs(docs, num_hashes=16, bands=4).count() == 0
    assert simhash_pairs(docs, max_hamming=3, blocks=4).count() == 0


def test_minhash_bands_validation(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame([("1", "a b c")], "doc_id string, text string")
    with _pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, num_hashes=32, bands=64)
    with _pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, num_hashes=32, bands=5)


def test_simhash_pigeonhole_validation(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.dedup import simhash_pairs

    docs = spark.createDataFrame([("1", "a b c")], "doc_id string, text string")
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=4, blocks=4)


def test_neardup_pairs_rejects_non_numeric_ids(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.similarity import cosine_neardup_pairs

    emb = spark.createDataFrame(
        [("doc_a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="numeric id"):
        cosine_neardup_pairs(emb)


def test_lsh_dim_mismatch_clear_error(spark):
    from knowledge_graph_etl_spark.extensions.similarity import lsh_topk

    emb = spark.createDataFrame(
        [(1, [1.0] * 32), (2, [0.5] * 32)], "vec_id long, embedding array<double>"
    )
    q = emb.selectExpr("vec_id as query_id", "embedding")
    try:
        lsh_topk(emb, q, k=1, dim=64).collect()
        raise AssertionError("expected dim-mismatch error")
    except Exception as e:  # Spark wraps the UDF's ValueError
        assert "dim=32" in str(e)


def test_resize_null_payload_keeps_metadata(spark):
    from knowledge_graph_etl_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rows = [("i1", "image", None, "image/png", 640, 480, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, 64, 64).collect()[0]
    # not resized -> original dimensions preserved, not claimed as 64x64
    assert out["width"] == 640 and out["height"] == 480


# --------------------------------------------------------------------------
# resolve_clusters: pairs -> per-document keep/drop (connected components)
# --------------------------------------------------------------------------


def _cc_oracle(pairs, nodes):
    """Driver-side union-find for small graphs."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _check_resolution(spark, edges, nodes, **kw):
    from knowledge_graph_etl_spark.extensions.dedup import resolve_clusters

    pairs = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        pairs = pairs.where(F.lit(False))
    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in resolve_clusters(pairs, docs=docs, **kw).collect()
    }
    want_rep = _cc_oracle(edges, nodes)
    from collections import Counter

    sizes = Counter(want_rep.values())
    assert got == {n: (want_rep[n], sizes[want_rep[n]]) for n in nodes}


def test_resolve_clusters_path_graph(spark):
    """A 40-node path is the worst case for plain label propagation
    (diameter 39 > default rounds); pointer jumping must contract it."""
    edges = [(i, i + 1) for i in range(39)]
    _check_resolution(spark, edges, list(range(40)), max_iter=12)


def test_resolve_clusters_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    _check_resolution(spark, edges, nodes)


def test_resolve_clusters_singletons_and_no_docs(spark):
    """Without docs=, only nodes appearing in pairs are labeled; with
    docs=, isolated documents come back as singleton clusters."""
    from knowledge_graph_etl_spark.extensions.dedup import resolve_clusters

    pairs = spark.createDataFrame([(5, 3), (3, 9)], "id_a long, id_b long")
    out = resolve_clusters(pairs).collect()
    assert {r["doc_id"]: r["cluster_rep"] for r in out} == {3: 3, 5: 3, 9: 3}
    assert all(r["cluster_size"] == 3 for r in out)
    _check_resolution(spark, [(5, 3), (3, 9)], [1, 3, 5, 9])


def test_resolve_clusters_empty_pairs(spark):
    _check_resolution(spark, [], [1, 2, 3])


def test_resolve_clusters_transitive_drop(spark):
    """A~B and B~C (A~C never emitted) must still collapse to one cluster —
    the reason pair output alone can't drive keep/drop."""
    _check_resolution(spark, [(10, 20), (20, 30)], [10, 20, 30, 40])


# --------------------------------------------------------------------------
# IVF index materialization: build / persist / load / query
# --------------------------------------------------------------------------


def test_ivf_build_query_matches_one_shot(spark, tmp_path):
    """build(path)+query ≡ one-shot ivf_topk, through a full persist/load
    round trip; the probe scans only the probed list_id partitions."""
    import os

    from knowledge_graph_etl_spark.extensions.similarity import (
        ivf_build,
        ivf_load,
        ivf_query,
        ivf_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 13) % 19) - 9.0 for j in range(8)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = {tuple(r) for r in ivf_topk(emb, queries, k=5, nlist=8, nprobe=3).collect()}

    path = str(tmp_path / "ivf")
    ivf_build(emb, nlist=8, path=path)
    idx = ivf_load(spark, path)
    got = ivf_query(idx, queries, k=5, nprobe=3)
    assert {tuple(r) for r in got.collect()} == want

    # on-disk layout: one partition dir per non-empty list
    dirs = [d for d in os.listdir(path + "/assigned") if d.startswith("list_id=")]
    assert 1 <= len(dirs) <= 8
    # probe plan reads a static subset of partitions (isin filter present)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan


def test_ivf_index_reuse_skips_corpus_assignment(spark, tmp_path):
    """After build, probing must not re-run the corpus-assignment UDF:
    the probe plan over the loaded index contains no pandas UDF on the
    corpus side (only the tiny query-side assignment, which is collected
    before the final plan)."""
    from knowledge_graph_etl_spark.extensions.similarity import (
        ivf_build,
        ivf_load,
        ivf_query,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 11) for j in range(4)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "ivf2")
    ivf_build(emb, nlist=4, path=path)
    idx = ivf_load(spark, path)
    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_query(idx, q, k=3, nprobe=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # corpus side is a plain parquet relation; the only Python evaluation
    # left would be the checkpointed query-side RDD scan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert out.count() > 0


# -- semantic dedup (SemDeDup) ------------------------------------------------


def test_semantic_dedup_transitive_keep_drop(spark):
    from knowledge_graph_etl_spark.extensions.similarity import semantic_dedup

    # two tight direction-clusters + one loner; within-cluster cosine ≈ 1
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # ~dup of 1
        (3, [0.998, 0.02, 0.0]),   # ~dup of 1 and 2 (transitive chain)
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.999, 0.01]),  # ~dup of 10
        (20, [0.0, 0.0, 1.0]),     # loner
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, nlist=3, threshold=0.95).collect()}
    assert out[1]["keep"] and out[1]["cluster_size"] == 3
    assert not out[2]["keep"] and out[2]["cluster_rep"] == 1
    assert not out[3]["keep"] and out[3]["cluster_rep"] == 1
    assert out[10]["keep"] and not out[11]["keep"]
    assert out[20]["keep"] and out[20]["cluster_size"] == 1
    # exactly one representative per cluster
    reps = [r for r in out.values() if r["keep"]]
    assert len(reps) == 3


# -- product quantization ------------------------------------------------------


def test_pq_topk_recall_and_compression(spark):
    from knowledge_graph_etl_spark.extensions.similarity import (
        cosine_topk,
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    import math
    # 40 vectors in 4 tight direction clusters (dim 16) — PQ must rank
    # same-cluster vectors above cross-cluster ones
    rows = []
    for i in range(40):
        c = i % 4
        base = [0.0] * 16
        base[c * 4] = 1.0
        base[c * 4 + 1] = 0.5
        jitter = [(((i * 31 + j * 7) % 11) - 5) / 200.0 for j in range(16)]
        rows.append((i, [b + j for b, j in zip(base, jitter)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = pq_topk(df, queries, m=4, ksub=8, k=5)
    exact = cosine_topk(df, queries, k=5)
    pq_sets = {}
    for r in pq.collect():
        pq_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ex_sets = {}
    for r in exact.collect():
        ex_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # recall@5 ≥ 3/5 per query on clearly-clustered data
    for qid in ex_sets:
        assert len(pq_sets[qid] & ex_sets[qid]) >= 3, (qid, pq_sets[qid], ex_sets[qid])
    # encoding shape: m int codes per vector, codes < ksub
    cbs = pq_codebooks(df, m=4, ksub=8)
    enc = pq_encode(df, cbs).collect()
    assert all(len(r["codes"]) == 4 and max(r["codes"]) < 8 for r in enc)


def test_pq_codebooks_validation(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.similarity import pq_codebooks

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="divisible"):
        pq_codebooks(df, m=2, ksub=1)


# -- real multimodal decode (codec-free stdlib/numpy paths) -------------------


def _ppm_bytes(w, h):
    import numpy as np

    img = np.arange(w * h * 3, dtype=np.int64).reshape(h, w, 3) % 256
    return img.astype(np.uint8), b"P6\n# a comment\n%d %d\n255\n" % (w, h) + img.astype(
        np.uint8
    ).tobytes()


def _bmp_bytes(img):
    """Encode HxWx3 uint8 as an uncompressed bottom-up 24-bit BMP."""
    import struct

    import numpy as np

    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    px = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + px


def _wav_bytes(samples_f32, rate=8000):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples_f32 * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_decode_image_ppm_and_bmp_roundtrip():
    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import decode_image

    img, ppm = _ppm_bytes(5, 4)
    assert np.array_equal(decode_image(ppm), img)
    assert np.array_equal(decode_image(_bmp_bytes(img)), img)


def test_decode_wav_roundtrip():
    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import decode_wav

    t = np.arange(800) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(_wav_bytes(sine))
    assert rate == 8000 and samples.size == 800
    assert float(np.abs(samples - sine).max()) < 1e-3  # int16 quantization


def test_real_decode_featurize(spark):
    """fake_decode=False end-to-end on generated PPM + WAV payloads: the
    Arrow-batched pipeline runs the REAL decoders and the features match
    the driver-side numpy reference exactly."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import (
        _audio_feature,
        _image_feature,
        decode_and_featurize,
        decode_wav,
    )

    img, ppm = _ppm_bytes(8, 6)
    t = np.arange(1600) / 8000.0
    wav = _wav_bytes(0.25 * np.sin(2 * np.pi * 220 * t))
    media = spark.createDataFrame(
        [("i1", "image", ppm), ("a1", "audio", wav)],
        "media_id string, kind string, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in decode_and_featurize(media, dim=8, fake_decode=False).collect()
    }
    assert out["i1"]["n_bytes"] == len(ppm)
    assert out["i1"]["feature"] == pytest.approx(_image_feature(img, 8), abs=1e-6)
    assert out["a1"]["feature"] == pytest.approx(
        _audio_feature(*decode_wav(wav), 8), abs=1e-6
    )
    # video without ffmpeg stays an honest NotImplementedError
    vid = spark.createDataFrame(
        [("v1", "video", b"\x00\x01")], "media_id string, kind string, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        decode_and_featurize(vid, dim=4, fake_decode=False).collect()


def test_real_resize_nearest_neighbor(spark):
    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        resize_images,
    )

    img, ppm = _ppm_bytes(6, 4)
    media = spark.createDataFrame(
        [("i1", "image", ppm, "image/x-portable-pixmap", 6, 4, None)], MEDIA_SCHEMA
    )
    out = resize_images(media, 3, 2, fake_decode=False).collect()[0]
    assert out["width"] == 3 and out["height"] == 2
    got = decode_image(bytes(out["payload"]))
    rows = (np.arange(2) * 4) // 2
    cols = (np.arange(3) * 6) // 3
    assert np.array_equal(got, img[rows][:, cols])


def test_auto_nlist_scales_with_corpus():
    """The nlist ∝ N default keeps expected cluster size constant as the
    corpus grows — the misuse mode (fixed nlist, quadratic cluster-local
    join) cannot happen silently."""
    from knowledge_graph_etl_spark.extensions.similarity import auto_nlist

    small, large = auto_nlist(1_000), auto_nlist(10_000)
    # expected cluster size stays ~target at both scales (10x corpus ->
    # ~10x lists, NOT 10x cluster size)
    assert 16 <= 1_000 / small <= 32
    assert 16 <= 10_000 / large <= 32
    assert 8 <= large / small <= 12
    # floor for tiny corpora
    assert auto_nlist(10) == 16
    import pytest as _pytest

    with _pytest.raises(ValueError):
        auto_nlist(100, target_cluster_size=0)


def test_semantic_dedup_auto_default_matches_explicit(spark):
    """Default (auto-sized) semantic_dedup equals an explicit nlist equal
    to the rule's output — proves the default wiring, and that results
    remain a pure function of (corpus, rule)."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import (
        auto_nlist,
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    n = 640  # auto_nlist -> ceil(640/32) = 20
    rows = [(i, rng.normal(size=8).tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    auto = semantic_dedup(df, threshold=0.9)
    explicit = semantic_dedup(df, nlist=auto_nlist(n), threshold=0.9)
    assert auto_nlist(n) == 20
    a = sorted(map(tuple, auto.collect()))
    e = sorted(map(tuple, explicit.collect()))
    assert a == e


def test_resample_audio_roundtrip(spark):
    """Real DSP path: an 8 kHz sine resampled to 16 kHz must preserve
    duration and frequency (zero-crossing count) and match the numpy
    linear-interp reference sample-for-sample (within int16 quantization)."""
    import io
    import wave

    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import (
        _resample_linear,
        decode_wav,
        resample_audio,
    )

    src_rate, freq, dur = 8000, 440.0, 0.5
    t = np.arange(int(src_rate * dur)) / src_rate
    sig = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float64)
    pcm = np.round(sig * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(src_rate)
        wf.writeframes(pcm.tobytes())
    wav = buf.getvalue()

    media = spark.createDataFrame(
        [("a1", "audio", bytearray(wav), src_rate), ("v1", "video", None, 0)],
        "media_id string, kind string, payload binary, sample_rate int",
    )
    out = {r["media_id"]: r for r in resample_audio(media, 16_000).collect()}
    assert list(out) == ["a1"]  # non-audio filtered
    assert out["a1"]["sample_rate"] == 16_000
    samples, rate = decode_wav(bytes(out["a1"]["payload"]))
    assert rate == 16_000
    assert abs(samples.size - 16_000 * dur) <= 2  # duration preserved
    # frequency preserved: a 440 Hz tone has 2*440*dur zero crossings
    zc = int(np.sum(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    assert abs(zc - 2 * freq * dur) <= 4
    # matches the numpy reference within int16 quantization
    ref_src, _ = decode_wav(wav)
    ref = _resample_linear(ref_src, src_rate, 16_000)
    assert float(np.max(np.abs(samples - np.clip(ref, -1, 1)))) < 2.0 / 32767


def test_customer_order_dist_zero_bucket(spark):
    """The Q13 shape's point: customers with NO (surviving) orders land
    in the c_count=0 bucket — an engine silently planning the outer join
    as inner loses them."""
    import __spark_entry__ as m

    from pyspark.sql import functions as F

    rows = {
        r["c_count"]: r["custdist"]
        for r in m.customer_order_dist(spark, "/root/testdata/sf0.001").collect()
    }
    c = m._t(spark, "/root/testdata/sf0.001", "customer")
    o = m._t(spark, "/root/testdata/sf0.001", "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    # independent outer-join pin: the 0 bucket must equal the anti-join
    # count (customers with no surviving orders) — an inner-join plan
    # would drop them from the histogram entirely
    expected_zero = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).count()
    assert rows.get(0, 0) == expected_zero
    assert sum(rows.values()) == c.count()  # partition of the customer set


def test_dormant_customer_value_semantics(spark):
    """Q22-shape pins: every reported customer group consists of
    above-average-balance customers with no post-cutoff orders —
    verified against an independent recomputation."""
    from pyspark.sql import functions as F

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    out = {r["c_nationkey"]: (r["numcust"], r["total_cents"])
           for r in m.dormant_customer_value(spark, sf).collect()}
    c = m._t(spark, sf, "customer")
    o = m._t(spark, sf, "orders").where(F.col("o_orderdate") >= "2000-01-01")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    rows = c.select("c_custkey", "c_nationkey", cents.alias("cents")).collect()
    pos = [r["cents"] for r in rows if r["cents"] > 0]
    s, n = sum(pos), len(pos)
    active = {r["o_custkey"] for r in o.select("o_custkey").distinct().collect()}
    exp = {}
    for r in rows:
        if r["cents"] * n > s and r["c_custkey"] not in active:
            cnt, tot = exp.get(r["c_nationkey"], (0, 0))
            exp[r["c_nationkey"]] = (cnt + 1, tot + r["cents"])
    assert out == exp and sum(v[0] for v in out.values()) >= 1


def test_image_ahash_invariances_and_dedup(spark):
    """Perceptual aHash over REAL decodes: a global brightness shift and
    a BMP re-encode hash identically to the PPM original; a different
    pattern hashes differently; undecodable payloads survive as ok=false;
    ahash_dedup groups the perceptual trio with the min-id canonical."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import (
        ahash_dedup,
        image_ahash,
    )

    rng = np.random.RandomState(2)
    img = (rng.rand(16, 16, 3) * 150).astype(np.uint8)  # headroom for +40
    ppm = b"P6\n16 16\n255\n" + img.tobytes()
    brighter = b"P6\n16 16\n255\n" + (img + 40).astype(np.uint8).tobytes()
    bmp = _bmp_bytes(img)
    other = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    ppm_other = b"P6\n16 16\n255\n" + other.tobytes()
    media = spark.createDataFrame(
        [
            (1, bytearray(ppm)),
            (2, bytearray(brighter)),
            (3, bytearray(bmp)),
            (4, bytearray(ppm_other)),
            (5, bytearray(b"not an image at all")),
            # 4x4 image: smaller than the 8x8 hash grid — must be
            # rejected (ok=false), not silently hashed to 0
            (6, bytearray(b"P6\n4 4\n255\n" + bytes(48))),
        ],
        "media_id bigint, payload binary",
    )
    got = {r["media_id"]: r for r in image_ahash(media).collect()}
    assert got[1]["ok"] and got[1]["ahash"] == got[2]["ahash"] == got[3]["ahash"]
    assert got[4]["ok"] and got[4]["ahash"] != got[1]["ahash"]
    assert not got[5]["ok"] and got[5]["ahash"] is None
    assert not got[6]["ok"] and got[6]["ahash"] is None
    d = {r["media_id"]: r for r in ahash_dedup(media).collect()}
    assert set(d) == {1, 2, 3, 4}  # undecodable excluded
    assert d[1]["n_copies"] == 3 and d[1]["is_canonical"]
    assert not d[2]["is_canonical"] and not d[3]["is_canonical"]
    assert d[4]["n_copies"] == 1 and d[4]["is_canonical"]


def test_hamming_neardup_pairs_banding_exact(spark):
    """Hand-built 64-bit hashes with known hamming distances: pairs
    within the radius are found via some shared 16-bit band (pigeonhole),
    a candidate pair above the radius is verified away, a pair differing
    in all 4 bands is never even a candidate, and negative (sign-bit-set)
    hashes band correctly under arithmetic shift + mask."""
    import pytest

    from knowledge_graph_etl_spark.extensions.multimodal import (
        hamming_neardup_pairs,
    )

    base = 0x123456789ABCDEF0
    rows = [
        (1, base),
        (2, base ^ (1 << 5)),  # hamming 1 vs 1
        (3, base ^ (1 | (1 << 20) | (1 << 40))),  # hamming 3 vs 1, 3 bands hit
        (4, base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48))),  # all 4 bands
        (5, (1 << 64) - 1),  # all 64 bits set (signed -1)
        (6, ((1 << 64) - 1) ^ (1 << 63)),  # hamming 1 vs 5, sign bit off
    ]
    signed = [(i, h - (1 << 64) if h >= (1 << 63) else h) for i, h in rows]
    df = spark.createDataFrame(signed, "media_id bigint, ahash bigint")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df, max_hamming=3).collect()
    }
    # python-int ground truth over all pairs
    exp = {}
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                exp[(ia, ib)] = d
    assert exp[(1, 2)] == 1 and exp[(1, 3)] == 3 and exp[(5, 6)] == 1
    assert (1, 4) not in exp  # distance 4: candidate via no shared band? —
    assert got == exp
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, max_hamming=4, bands=4)
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, bands=5)


def test_ahash_neardup_image_path(spark):
    """Real decode composition: an 8x8-block checkerboard and the same
    image with ONE block flipped are hamming-1 aHash neighbors — found
    by the banded radius search, missed by hamming-0 grouping; an
    unrelated pattern and an undecodable payload produce no pairs."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.multimodal import (
        ahash_dedup,
        ahash_neardup,
    )

    def checker(flip=None):
        img = np.zeros((16, 16), dtype=np.uint8)
        for r in range(8):
            for c in range(8):
                if (r + c) % 2 == 0:
                    img[2 * r : 2 * r + 2, 2 * c : 2 * c + 2] = 255
        if flip is not None:
            r, c = flip
            v = img[2 * r, 2 * c]
            img[2 * r : 2 * r + 2, 2 * c : 2 * c + 2] = 255 - int(v)
        rgb = np.stack([img] * 3, axis=2)
        return b"P6\n16 16\n255\n" + rgb.tobytes()

    rng = np.random.RandomState(7)
    other = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(checker())),
            (2, bytearray(checker(flip=(3, 4)))),
            (3, bytearray(b"P6\n16 16\n255\n" + other.tobytes())),
            (4, bytearray(b"garbage")),
        ],
        "media_id bigint, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_neardup(media, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): 1}
    # hamming-0 grouping misses exactly this near-pair
    d = {r["media_id"]: r["n_copies"] for r in ahash_dedup(media).collect()}
    assert d[1] == 1 and d[2] == 1


def test_image_ahash_validation(spark):
    import pytest

    from knowledge_graph_etl_spark.extensions.multimodal import image_ahash

    media = spark.createDataFrame(
        [(1, bytearray(b"x"))], "media_id bigint, payload binary"
    )
    with pytest.raises(ValueError):
        image_ahash(media, hash_size=9)  # 81 bits > 64


def test_copurchase_topk_reused_exchange_and_bound(spark):
    """Scale pins for the basket self-join: both join sides read ONE
    orderkey exchange (ReusedExchange — the per-order part set is
    shuffled once, not twice) and the result is the deterministic
    top-20."""
    import __spark_entry__ as m

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # the scale regime: broadcast off forces the SMJ path, where both
    # join sides must read ONE orderkey exchange (at small scale Catalyst
    # rightly broadcasts the build side instead — also fine)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = m.copurchase_topk(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan, plan
        # the global top-k must prune BEFORE the single-task window
        assert "TakeOrderedAndProject" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert len(rows) == 20
    counts = [r["n_orders"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert counts == sorted(counts, reverse=True)
    assert all(r["part_a"] < r["part_b"] for r in rows)


def test_pair_eval_known_values(spark):
    """Hand-built pair sets: reversed orientation and duplicates are
    normalized before counting; exact ppm arithmetic; NULL ratios when a
    denominator is zero."""
    from knowledge_graph_etl_spark.extensions.dedup import pair_eval

    cand = spark.createDataFrame(
        # (2,1) reversed == (1,2); (3,4) duplicated; (5,6) false positive
        [(2, 1), (3, 4), (4, 3), (5, 6)],
        "id_a bigint, id_b bigint",
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8)], "id_a bigint, id_b bigint"
    )
    r = pair_eval(cand, truth).collect()[0]
    assert (r["n_candidates"], r["n_truth"], r["n_hits"]) == (3, 3, 2)
    assert r["recall_ppm"] == 666666 and r["precision_ppm"] == 666666
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    r0 = pair_eval(empty, truth).collect()[0]
    assert (r0["n_candidates"], r0["n_hits"]) == (0, 0)
    assert r0["recall_ppm"] == 0 and r0["precision_ppm"] is None
    r1 = pair_eval(cand, empty).collect()[0]
    assert r1["n_truth"] == 0 and r1["recall_ppm"] is None


def test_leakage_safe_split_exact_and_pairs_modes(spark):
    """Duplicate clusters never straddle splits: exact mode groups by
    md5(text) (rep = min id), pairs mode resolves connected components —
    linked docs inherit ONE split even across a chain; assignment equals
    assign_split of the rep (deterministic, engine-reproducible)."""
    from knowledge_graph_etl_spark.extensions.curation import (
        assign_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i % 4}") for i in range(40)],  # 4 clusters of 10
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs).collect()}
    assert len(out) == 40
    for i in range(40):
        assert out[i]["cluster_rep"] == i % 4  # min id of the md5 group
        assert out[i]["split"] == out[i % 4]["split"]  # inherits rep's split
    # the rep's split equals plain assign_split of the rep id
    reps = spark.createDataFrame(
        [(i,) for i in range(4)], "cluster_rep bigint"
    )
    ref = {
        r["cluster_rep"]: r["split"]
        for r in assign_split(reps, id_col="cluster_rep").collect()
    }
    for i in range(4):
        assert out[i]["split"] == ref[i]
    # pairs mode: a chain 100-101-102 plus singleton 103 — the whole
    # chain lands in one split keyed by rep 100
    docs2 = spark.createDataFrame(
        [(100, "a"), (101, "b"), (102, "c"), (103, "d")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(100, 101), (101, 102)], "id_a bigint, id_b bigint"
    )
    out2 = {
        r["doc_id"]: r
        for r in leakage_safe_split(docs2, pairs=pairs).collect()
    }
    assert {out2[i]["cluster_rep"] for i in (100, 101, 102)} == {100}
    assert len({out2[i]["split"] for i in (100, 101, 102)}) == 1
    assert out2[103]["cluster_rep"] == 103


# -- prefix-filtered exact set-similarity join --------------------------------


def test_setsim_prefix_equals_full_inverted_index(docs):
    """The prefix filter is lossless: same pairs and same exact Jaccard as
    the full-posting-list ngram_jaccard_pairs at the same (n, t)."""
    from knowledge_graph_etl_spark.extensions.dedup import setsim_prefix_pairs

    full = ngram_jaccard_pairs(docs, n=3, threshold=0.7, max_shingle_freq=None)
    pref = setsim_prefix_pairs(docs, n=3, threshold=0.7)
    f = {(r["id_a"], r["id_b"]): r["jaccard"] for r in full.collect()}
    p = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pref.collect()}
    assert f == p and (0, 1) in p and p[(0, 1)] == 1.0


def test_setsim_prefix_index_is_smaller(spark):
    """The point of the operator: at t=0.8 the indexed prefix holds ~20%
    of each doc's shingles (|s| - ceil(0.8|s|) + 1), vs 100% for the full
    inverted index — measured on the materialized index itself."""
    from pyspark.sql import Window
    from knowledge_graph_etl_spark.extensions.dedup import word_shingles

    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(40)) + " shared tail words here")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = df.select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text"), 3).alias("sh")
    ).withColumn("sz", F.size("sh"))
    flat = base.select("id", "sz", F.explode("sh").alias("tok")).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )
    pos = flat.withColumn(
        "pos", F.row_number().over(Window.partitionBy("id").orderBy("df", "tok"))
    )
    t = 0.8
    n_full = flat.count()
    n_pref = pos.where(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).count()
    assert n_pref < 0.3 * n_full  # ~(1-t) of the postings, never all


def test_setsim_prefix_length_filter_blocks_subset_pairs(spark):
    """A tiny doc fully contained in a huge doc can't reach Jaccard t —
    the symmetric length filter drops the pair before verification."""
    from knowledge_graph_etl_spark.extensions.dedup import setsim_prefix_pairs

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"pad{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, small), (1, big)], "doc_id long, text string"
    )
    assert setsim_prefix_pairs(df, n=3, threshold=0.5).count() == 0


# -- record linkage -----------------------------------------------------------


def test_idf_linkage_recovers_true_match(spark):
    """Dirty records (a dropped word) link back to their own reference
    record, not to other references sharing common words."""
    from knowledge_graph_etl_spark.extensions.linkage import idf_weighted_linkage

    refs = [
        (1, "acme corporation global widget division"),
        (2, "globex corporation sprocket division"),
        (3, "initech corporation widget division"),
    ]
    dirty = [
        (11, "acme global widget division"),      # ref 1 minus "corporation"
        (12, "globex corporation sprocket"),      # ref 2 minus "division"
    ]
    ref = spark.createDataFrame(refs, "id bigint, name string")
    dy = spark.createDataFrame(dirty, "id bigint, name string")
    out = {
        r["dirty_id"]: (r["match_id"], r["score_ppm"])
        for r in idf_weighted_linkage(
            dy, ref, block_tokens=2, min_score_ppm=100_000
        ).collect()
    }
    assert out[11][0] == 1 and out[12][0] == 2
    assert all(v[1] > 400_000 for v in out.values())


def test_idf_linkage_idf_beats_plain_overlap(spark):
    """Sharing one RARE word outweighs sharing two words that appear in
    every reference — the reason for IDF weights over plain Jaccard."""
    from knowledge_graph_etl_spark.extensions.linkage import idf_weighted_linkage

    # "zephyr" appears in exactly one reference; "trading company" in all
    refs = [(i, f"filler{i} trading company") for i in range(1, 9)] + [
        (9, "zephyr trading company")
    ]
    dy = [(100, "zephyr imports")]
    out = idf_weighted_linkage(
        spark.createDataFrame(dy, "id bigint, name string"),
        spark.createDataFrame(refs, "id bigint, name string"),
        block_tokens=1,
        min_score_ppm=1,
    ).collect()
    assert len(out) == 1 and out[0]["match_id"] == 9


def test_idf_linkage_no_candidates_no_row(spark):
    """A dirty record sharing no blocking token with any reference is
    absent from the output (blocked-out, by design)."""
    from knowledge_graph_etl_spark.extensions.linkage import idf_weighted_linkage

    ref = spark.createDataFrame([(1, "alpha beta gamma")], "id bigint, name string")
    dy = spark.createDataFrame([(2, "delta epsilon zeta")], "id bigint, name string")
    assert (
        idf_weighted_linkage(dy, ref, block_tokens=3, min_score_ppm=1).count() == 0
    )


# -- covariance / PCA ---------------------------------------------------------


def test_embedding_comoments_exact_and_pca_pipeline(spark):
    """Co-moments are exact integers (hand-checked on a tiny corpus);
    the PCA built on them recovers the dominant direction, components
    are orthonormal with descending variance, and projection matches a
    numpy reference."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import (
        embedding_comoments,
        pca_from_comoments,
        project_embeddings,
    )

    # 2-D data stretched along (1, 1): first PC must be ~(0.707, 0.707)
    rng = np.random.RandomState(3)
    t = rng.randn(200)
    pts = np.stack([t + 0.05 * rng.randn(200), t + 0.05 * rng.randn(200)], 1)
    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(pts)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    com = embedding_comoments(emb).collect()
    # exactness: recompute sum_ij for (0, 1) in integer numpy
    q = np.floor(pts.astype(np.float32).astype(np.float64) * 1e6 + 0.5).astype(
        np.int64
    )
    by_pair = {(r["i"], r["j"]): r for r in com}
    assert by_pair[(0, 1)]["sum_ij"] == int((q[:, 0] * q[:, 1]).sum())
    assert by_pair[(0, 0)]["n"] == 200

    comp, var = pca_from_comoments(com, k=2)
    assert var[0] > 50 * var[1]  # dominant direction carries the mass
    assert np.allclose(comp @ comp.T, np.eye(2), atol=1e-9)  # orthonormal
    assert np.allclose(np.abs(comp[0]), [0.7071, 0.7071], atol=0.02)

    proj = {
        r["vec_id"]: (r["pc0"], r["pc1"])
        for r in project_embeddings(emb, comp).collect()
    }
    ref = pts.astype(np.float32).astype(np.float64) @ comp.T
    assert abs(proj[0][0] - ref[0, 0]) < 1e-6
    assert abs(proj[7][1] - ref[7, 1]) < 1e-6


def test_pca_sign_convention_deterministic(spark):
    """Negating the input flips nothing: the largest-|loading|-positive
    convention pins the eigenvector sign."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import (
        embedding_comoments,
        pca_from_comoments,
    )

    pts = np.stack([np.linspace(-1, 1, 50), 0.1 * np.linspace(1, -1, 50)], 1)
    for flip in (1.0, -1.0):
        rows = [
            (i, [float(a * flip), float(b * flip)])
            for i, (a, b) in enumerate(pts)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        comp, _ = pca_from_comoments(embedding_comoments(emb).collect(), k=1)
        assert comp[0][np.argmax(np.abs(comp[0]))] > 0


def test_kcenter_select_covers_clusters(spark):
    """Three well-separated clusters: the first three picks (seed + 2)
    land in three DIFFERENT clusters — the covering property uniform
    sampling lacks — and dmin at pick time is non-increasing."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import kcenter_select

    rng = np.random.RandomState(11)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(30):
            p = c + 0.1 * rng.randn(2)
            rows.append((vid, [float(p[0]), float(p[1])], ci))
            vid += 1
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<float>"
    )
    cluster_of = {i: c for i, _, c in rows}
    out = kcenter_select(emb, k=5).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert len({cluster_of[i] for i in order[:3]}) == 3
    dmins = [r["dmin_q"] for r in sorted(out, key=lambda r: r["rank"])][1:]
    assert all(a >= b for a, b in zip(dmins, dmins[1:]))  # greedy invariant


def test_kcenter_select_deterministic_rerun(spark):
    from knowledge_graph_etl_spark.extensions.similarity import kcenter_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = [(r["rank"], r["vec_id"]) for r in kcenter_select(emb, k=4).collect()]
    b = [(r["rank"], r["vec_id"]) for r in kcenter_select(emb, k=4).collect()]
    assert a == b


def test_matryoshka_recall_full_dim_perfect_and_monotone_ish(spark):
    """Full-dim entry recalls itself at 1e6 ppm; prefixes carrying the
    dominant signal recall well, pure-noise prefixes don't."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import (
        matryoshka_recall,
    )

    rng = np.random.RandomState(5)
    # dims 0..3 carry cluster structure; 4..15 are iid noise, so the
    # 4-prefix nearly reproduces the full ranking and a 2-prefix is rough
    base = np.concatenate(
        [np.repeat(rng.randn(10, 4), 5, axis=0), rng.randn(50, 12) * 0.05], axis=1
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["dim"]: r["recall_ppm"]
        for r in matryoshka_recall(
            emb, emb.where("vec_id < 4"), dims=[4, 16], k=5, query_id_col="vec_id"
        ).collect()
    }
    assert out[16] == 1_000_000            # truth vs itself
    assert out[4] >= 600_000               # signal prefix retains most


# ---------------------------------------------------------------------------
# edit1_pairs (extensions/dedup.edit1_pairs)
# ---------------------------------------------------------------------------


def test_edit1_pairs_all_three_edit_kinds(spark):
    from knowledge_graph_etl_spark.extensions.dedup import edit1_pairs

    vocab = spark.createDataFrame(
        [("colour",), ("color",), ("colors",), ("gizmo",), ("gizmos",)],
        "word string",
    )
    got = {
        (r.word_a, r.word_b)
        for r in edit1_pairs(vocab, "word", min_len=4).collect()
    }
    # deletion (colour/color), insertion (color/colors), suffix-add
    assert ("color", "colour") in got
    assert ("color", "colors") in got
    assert ("gizmo", "gizmos") in got
    # colour/colors is distance 2 -> absent
    assert ("colors", "colour") not in got


def test_edit1_pairs_shared_variant_false_positive_filtered(spark):
    from knowledge_graph_etl_spark.extensions.dedup import edit1_pairs

    # 'abcd'/'bacd' share deletion variants ('acd','bcd') but are
    # distance 2 -- the exact verify must drop them
    vocab = spark.createDataFrame([("abcd",), ("bacd",)], "word string")
    assert edit1_pairs(vocab, "word", min_len=4).count() == 0


def test_edit1_pairs_min_len_and_substitution(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.dedup import edit1_pairs

    vocab = spark.createDataFrame(
        [("cat",), ("cut",), ("cart",), ("curt",)], "word string"
    )
    got = {
        (r.word_a, r.word_b, r.dist)
        for r in edit1_pairs(vocab, "word", min_len=4).collect()
    }
    # cat/cut are below min_len=4 and excluded entirely
    assert got == {("cart", "curt", 1)}
    with _pytest.raises(ValueError):
        edit1_pairs(vocab, "word", min_len=1)


# ---------------------------------------------------------------------------
# nearest_event_match (extensions/temporal.nearest_event_match)
# ---------------------------------------------------------------------------


def test_nearest_match_both_directions_and_tolerance(spark):
    from knowledge_graph_etl_spark.extensions.temporal import (
        nearest_event_match,
    )

    left = spark.createDataFrame(
        [(1, 7, 100), (2, 7, 1000), (3, 8, 100)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        # user 7: at 103 (|dt|=3 to left 1) and 92 (|dt|=8): nearest is
        # AFTER the left event -- as-of would pick 92
        [(11, 7, 103), (12, 7, 92), (13, 9, 100)],
        "event_id long, user_id long, ts long",
    )
    out = {
        r.left_id: r
        for r in nearest_event_match(
            left, right, "user_id", "ts", 10, "event_id", "event_id"
        ).collect()
    }
    assert (out[1].right_id, out[1].dt) == (11, 3)
    # left 2 at 1000: nothing within 10 -> unmatched NULL row
    assert out[2].right_id is None and out[2].dt is None
    # left 3: user 8 has no right events at all
    assert out[3].right_id is None


def test_nearest_match_tiebreak_and_bucket_edges(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.temporal import (
        nearest_event_match,
    )

    left = spark.createDataFrame(
        [(1, 5, 100)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        # equidistant at +-4: tie-break earlier right_ts (96)
        [(21, 5, 104), (22, 5, 96), (23, 5, 110)],
        "event_id long, user_id long, ts long",
    )
    out = nearest_event_match(
        left, right, "user_id", "ts", 10, "event_id", "event_id"
    ).collect()
    assert len(out) == 1 and out[0].right_id == 22 and out[0].dt == -4
    # exact tolerance boundary included: |dt| == tolerance
    left2 = spark.createDataFrame(
        [(9, 5, 120)], "event_id long, user_id long, ts long"
    )
    out2 = nearest_event_match(
        left2, right, "user_id", "ts", 10, "event_id", "event_id"
    ).collect()
    assert out2[0].right_id == 23 and out2[0].dt == -10
    with _pytest.raises(ValueError):
        nearest_event_match(
            left, right, "user_id", "ts", 0, "event_id", "event_id"
        )


# ---------------------------------------------------------------------------
# priority_sample (extensions/curation.priority_sample)
# ---------------------------------------------------------------------------


def test_priority_sample_matches_python_priorities(spark):
    import hashlib

    from knowledge_graph_etl_spark.extensions.curation import priority_sample

    rows = [(i, "g", float(i)) for i in range(1, 21)]  # weight = id
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out = priority_sample(df, "w", group_col="lang", id_col="doc_id", n=5)
    got = [(r.doc_id, r.sample_rank) for r in out.orderBy("sample_rank").collect()]

    def prio(i):
        h = int(hashlib.md5(f"prio{i}".encode()).hexdigest()[:15], 16)
        return (float(h) / (i * 1000.0), i)

    want = sorted(range(1, 21), key=prio)[:5]
    assert [d for d, _ in got] == want
    assert [r for _, r in got] == [1, 2, 3, 4, 5]


def test_priority_sample_excludes_nonpositive_and_validates(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.curation import priority_sample

    rows = [(1, 0.0), (2, -3.0), (3, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = priority_sample(df, "w", id_col="doc_id", n=10).collect()
    assert [r.doc_id for r in out] == [3]
    assert out[0].w_milli == 2000
    with _pytest.raises(ValueError):
        priority_sample(df, "w", n=0)


def test_nearest_match_string_right_id_type_preserved(spark):
    """ADVICE r09 (low): the unmatched tail hardcoded a long-typed NULL
    for right_id; with a string right-id column the union coerced or
    failed. The NULL literal now derives its type from the source."""
    from knowledge_graph_etl_spark.extensions.temporal import (
        nearest_event_match,
    )

    left = spark.createDataFrame(
        [(1, 5, 100), (2, 5, 500)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [("r-1", 5, 103)], "event_id string, user_id long, ts long"
    )
    out_df = nearest_event_match(
        left, right, "user_id", "ts", 10, "event_id", "event_id"
    )
    assert out_df.schema["right_id"].dataType.simpleString() == "string"
    out = {r.left_id: r for r in out_df.collect()}
    assert out[1].right_id == "r-1" and out[1].dt == 3
    assert out[2].right_id is None and out[2].dt is None


def test_mine_hard_negatives_excludes_neardup_band(spark):
    """The query's self-match (cosine 1.0) and near-duplicates above the
    exclusion threshold never appear; results are the top-k of the
    remaining band, rank-ordered."""
    from knowledge_graph_etl_spark.extensions.similarity import (
        mine_hard_negatives,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.045, 0.0]),   # near-dup of 1 (cos ~0.999)
        (3, [0.8, 0.6, 0.0]),       # hard negative (cos 0.8)
        (4, [0.6, 0.8, 0.0]),       # hard negative (cos 0.6)
        (5, [0.0, 0.0, 1.0]),       # orthogonal (cos 0.0 -> kept, rank last)
        (6, [-1.0, 0.0, 0.0]),      # negative cos -> below min_sim, dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    got = mine_hard_negatives(emb, q, k=10, exclude_above=0.95).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ids == [3, 4, 5]
    assert all(r["cosine_sim"] < 0.95 for r in got)
    import pytest

    with pytest.raises(ValueError):
        mine_hard_negatives(emb, q, exclude_above=0.0)
