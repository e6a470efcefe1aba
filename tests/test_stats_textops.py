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


def test_hll_distinct_determinism_and_accuracy(spark):
    from pyspark.sql import functions as F

    from knowledge_graph_etl_spark.extensions.stats import hll_distinct

    df = spark.range(30000).select(
        (F.col("id") % 2).alias("g"),
        F.concat(
            (F.col("id") % 2).cast("string"),
            F.lit(":"),
            (F.col("id") % ((F.col("id") % 2) * 4000 + 3000)).cast("string"),
        ).alias("v"),
    )
    a = sorted(map(tuple, hll_distinct(df, "g", "v").collect()))
    b = sorted(map(tuple, hll_distinct(df, "g", "v").collect()))
    assert a == b  # deterministic sketch — identical estimate on re-run
    exact = {
        r["g"]: r["c"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("c")).collect()
    }
    for g, nregs, est_micro in a:
        est = est_micro / 1e6
        # raw estimator at m=64: ~13% stderr; allow 3 sigma + small-range bias
        assert abs(est - exact[g]) / exact[g] < 0.5, (g, est, exact[g])
        assert nregs <= 64


def test_hll_distinct_validates_p(spark):
    import pytest

    from knowledge_graph_etl_spark.extensions.stats import hll_distinct

    df = spark.range(5).selectExpr("'a' AS g", "CAST(id AS STRING) AS v")
    with pytest.raises(ValueError):
        hll_distinct(df, "g", "v", p=3)


def test_neardup_verify_pairs(spark):
    from pyspark.sql import functions as F

    from knowledge_graph_etl_spark.extensions.dedup import neardup_verify_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # 3 edits
            (3, "completely different text with nothing shared at all"),
        ],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a bigint, id_b bigint"
    )
    out = {
        (r["id_a"], r["id_b"]): (r["lev"], r["lev_permille"])
        for r in neardup_verify_pairs(
            docs, pairs, max_lev_permille=300
        ).collect()
    }
    assert (1, 2) in out and (1, 3) not in out  # dissimilar pair rejected
    lev, permille = out[(1, 2)]
    assert lev == 3 and permille == (1000 * 3) // 43
    # permissive threshold keeps both
    all_out = neardup_verify_pairs(docs, pairs, max_lev_permille=1000)
    assert all_out.count() == 2


def test_knn_graph_exact_when_single_list(spark):
    """nlist=1 puts every vector in one list → the knn graph IS exact
    brute-force kNN; verify ranks against a manual cosine computation."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import knn_graph

    vecs = {
        0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0], 3: [0.1, 0.9],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<double>"
    )
    out = knn_graph(df, k=2, nlist=1)
    got = {
        (r["id"], r["rank"]): r["neighbor_id"] for r in out.collect()
    }

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    for i in vecs:
        ranked = sorted(
            ((cos(vecs[i], vecs[j]), j) for j in vecs if j != i),
            key=lambda t: (-t[0], t[1]),
        )
        assert got[(i, 1)] == ranked[0][1]
        assert got[(i, 2)] == ranked[1][1]


def test_closeness_path_graph(spark):
    from knowledge_graph_etl_spark.extensions.graph import closeness

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    rows = {
        r["node"]: (r["n_reached"], r["dist_sum"], r["closeness_micro"])
        for r in closeness(edges, max_depth=2).collect()
    }
    # a: reaches b@1, c@2 -> (2, 3, 2M div 3); b: a@1, c@1, d@2 -> (3, 4)
    assert rows["a"] == (2, 3, 2_000_000 // 3)
    assert rows["b"] == (3, 4, 3_000_000 // 4)
    assert rows["c"] == rows["b"] and rows["d"] == rows["a"]


def test_closeness_sampled_sources(spark):
    from knowledge_graph_etl_spark.extensions.graph import closeness

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    srcs = spark.createDataFrame([("a",)], "node string")
    rows = {
        r["node"]: (r["n_reached"], r["dist_sum"])
        for r in closeness(edges, sources=srcs).collect()
    }
    assert rows["a"] == (2, 3)  # only the sampled source scores
    assert rows["b"] == (0, 0) and rows["c"] == (0, 0)


def _funnel_events(spark):
    import datetime

    t0 = datetime.datetime(2026, 1, 1)

    def e(uid, typ, minutes):
        return (uid, typ, t0 + datetime.timedelta(minutes=minutes))

    rows = [
        # u1 completes view -> click -> buy in order
        e(1, "view", 0), e(1, "click", 10), e(1, "buy", 20),
        # u2: click BEFORE view -> click step not reached after view
        e(2, "click", 0), e(2, "view", 5),
        # u3: view + click, no buy
        e(3, "view", 0), e(3, "click", 1),
        # u4: never views
        e(4, "buy", 0),
        # u5: completes but click is slow (2 hours after view)
        e(5, "view", 0), e(5, "click", 120), e(5, "buy", 121),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


def test_funnel_conversion_ordering(spark):
    from knowledge_graph_etl_spark.extensions.events import funnel_conversion

    out = {
        r["step_index"]: (r["step"], r["n_users"], r["conversion_ppm"])
        for r in funnel_conversion(
            _funnel_events(spark), ["view", "click", "buy"]
        ).collect()
    }
    assert out[1] == ("view", 4, 1_000_000)  # u1,u2,u3,u5
    assert out[2] == ("click", 3, 750_000)  # u2's click precedes its view
    assert out[3] == ("buy", 2, 500_000)  # u1, u5


def test_funnel_conversion_within_window(spark):
    import pytest

    from knowledge_graph_etl_spark.extensions.events import funnel_conversion

    out = {
        r["step_index"]: r["n_users"]
        for r in funnel_conversion(
            _funnel_events(spark), ["view", "click", "buy"], within_seconds=3600
        ).collect()
    }
    assert out[2] == 2 and out[3] == 1  # u5's 2-hour click falls outside
    with pytest.raises(ValueError):
        funnel_conversion(_funnel_events(spark), ["view"])


def test_retention_cohorts(spark):
    import datetime

    from knowledge_graph_etl_spark.extensions.events import retention_cohorts

    day = 86_400
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        # u1 first day 0, active day 0 and day 2
        (1, t0), (1, t0 + datetime.timedelta(days=2)),
        # u2 first day 0 only
        (2, t0 + datetime.timedelta(hours=3)),
        # u3 first day 2, active days 2 and 3
        (3, t0 + datetime.timedelta(days=2)),
        (3, t0 + datetime.timedelta(days=3)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_active"],
            r["retention_ppm"],
        )
        for r in retention_cohorts(df, period_seconds=day).collect()
    }
    c0 = min(k[0] for k in out)
    assert out[(c0, 0)] == (2, 1_000_000)
    assert out[(c0, 2)] == (1, 500_000)
    assert out[(c0 + 2, 0)] == (1, 1_000_000)  # cohort day-2 = u3 only
    assert out[(c0 + 2, 1)] == (1, 1_000_000)
    assert (c0, 1) not in out  # nobody from cohort 0 active on day 1


def test_bpe_train_classic_example(spark):
    """Sennrich's canonical corpus: 'low'x5 'lower'x2 'newest'x6
    'widest'x3 — the first merges must assemble the frequent subwords
    ('es'+'t' from newest+widest before anything 'low'-specific)."""
    from knowledge_graph_etl_spark.extensions.tokenize import bpe_train

    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    docs = spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(rows)], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, num_merges=4)
    assert merges[0] == ("e", "s")  # 9 occurrences, the clear winner
    assert merges[1] == ("es", "t")
    # merges are deterministic across runs
    assert merges == bpe_train(docs, num_merges=4)


def test_bpe_encode_roundtrip_and_invariants(spark):
    from knowledge_graph_etl_spark.extensions.tokenize import (
        _EOW,
        bpe_encode,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the catalog of the category"),
            (3, "unrelated words entirely different"),
        ],
        "doc_id bigint, text string",
    )
    merges = bpe_train(docs, num_merges=50)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for i, text in [(1, "the cat sat on the mat"), (2, "the catalog of the category")]:
        toks = out[i]["bpe_tokens"]
        # reassembling tokens gives back the words (EOW markers internal
        # to the pipeline never leak into output tokens as suffixes)
        joined = "".join(t.replace(_EOW, " ") for t in toks)
        # a word may be split across tokens; concatenation per word must
        # reconstruct the whitespace-tokenized text
        assert joined.split() == text.lower().split()
        assert out[i]["n_bpe_tokens"] == len(toks)
        # subword tokenization never exceeds character count
        assert len(toks) <= len(text.replace(" ", ""))
    # 'the' occurs 4x -> trained into a single token (marker-suffixed)
    assert "the" + _EOW in out[1]["bpe_tokens"]


def test_beam_search_equals_bruteforce_with_full_reach(spark):
    """With every node an entry point, one round of beam search has
    visited the whole corpus — the result must equal brute-force cosine
    top-k (self excluded), ranks tie-broken on neighbor id."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import (
        beam_search_topk,
        knn_graph,
    )

    vecs = {
        0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0],
        3: [0.1, 0.9], 4: [0.7, 0.7], 5: [-1.0, 0.2],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id bigint, embedding array<double>",
    )
    adj = knn_graph(df, k=2, nlist=1).select("id", "neighbor_id")
    qs = df.where("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = beam_search_topk(
        df, qs, adj, k=3, beam=2, rounds=1, n_entry=len(vecs)
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in out.collect()
    }

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    for qi in (0, 1):
        ranked = sorted(
            ((cos(vecs[qi], vecs[j]), j) for j in vecs if j != qi),
            key=lambda t: (-t[0], t[1]),
        )
        for rank in (1, 2, 3):
            sim, j = ranked[rank - 1]
            assert got[(qi, rank)] == (j, sim)


def test_beam_search_expands_beyond_entry_points(spark):
    """n_entry=1 with a star adjacency from the (md5-computed) single
    entry point: the traversal must reach nodes NOT in the entry set —
    the expansion through graph edges is what's under test."""
    import hashlib

    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import beam_search_topk

    vecs = {i: [float(np.cos(i)), float(np.sin(i))] for i in range(6)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id bigint, embedding array<double>",
    )
    entry = min(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), str(i)))
    # star: the entry point links to every other node
    adj = spark.createDataFrame(
        [(entry, j) for j in vecs if j != entry], "id bigint, neighbor_id bigint"
    )
    qs = df.where("vec_id = 3").selectExpr("vec_id AS query_id", "embedding")
    out = beam_search_topk(df, qs, adj, k=5, beam=1, rounds=1, n_entry=1)
    rows = out.collect()
    # all 5 non-query nodes visited (entry + its 4-or-5 star neighbors)
    got_ids = {r["neighbor_id"] for r in rows}
    assert got_ids == {j for j in vecs if j != 3}
    # ranks follow exact cosine order

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    ranked = sorted(
        ((cos(vecs[3], vecs[j]), j) for j in vecs if j != 3),
        key=lambda t: (-t[0], t[1]),
    )
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in by_rank] == [j for _, j in ranked]


def test_beam_search_param_validation(spark):
    import pytest

    from knowledge_graph_etl_spark.extensions.similarity import beam_search_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    adj = spark.createDataFrame([], "id bigint, neighbor_id bigint")
    qs = df.selectExpr("vec_id AS query_id", "embedding")
    with pytest.raises(ValueError):
        beam_search_topk(df, qs, adj, k=0)
    with pytest.raises(ValueError):
        beam_search_topk(df, qs, adj, rounds=0)


def test_ivfpq_equals_pq_when_probing_all_lists(spark):
    """nprobe = nlist probes every list, so IVF-PQ must reproduce plain
    PQ/ADC bit-for-bit (same codebooks, codes, LUT partials, ranking)."""
    from knowledge_graph_etl_spark.extensions.similarity import ivfpq_topk, pq_topk

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(16).round(3).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qs = df.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["score_q"])  # noqa: E731
    full = sorted(map(key, pq_topk(df, qs, m=4, ksub=8, k=5).collect()))
    ivf = sorted(
        map(
            key,
            ivfpq_topk(
                df, qs, k=5, m=4, ksub=8, nlist=4, nprobe=4
            ).collect(),
        )
    )
    assert ivf == full and len(ivf) == 15


def test_ivfpq_probe_is_broadcast_join_and_subset(spark):
    """nprobe < nlist: the probe joins corpus codes to a BROADCAST query
    side (no corpus shuffle), and every returned neighbor lies in one of
    the query's probed lists."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import ivfpq_topk

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(16).round(3).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qs = df.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    out = ivfpq_topk(df, qs, k=50, m=4, ksub=8, nlist=6, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    rows_out = out.collect()
    assert rows_out
    # fewer candidates than the corpus: probing 2/6 lists prunes
    per_q = {}
    for r in rows_out:
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert all(len(v) < 60 for v in per_q.values())


def test_ivfpq_param_validation(spark):
    import pytest

    from knowledge_graph_etl_spark.extensions.similarity import ivfpq_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    qs = df.selectExpr("vec_id AS query_id", "embedding")
    with pytest.raises(ValueError):
        ivfpq_topk(df, qs, nprobe=8, nlist=4)
    with pytest.raises(ValueError):
        ivfpq_topk(df, qs, k=0)


def test_embedding_decontaminate_known_vectors(spark):
    """Hand-checked semantic decontamination: exact cosines, self-match
    at 1.0, nearest-benchmark tie toward the lower bench id, empty
    benchmark rejected."""
    import numpy as np
    import pytest

    from knowledge_graph_etl_spark.extensions.similarity import (
        embedding_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # benchmark row: self-match 1.0
            (1, [0.0, 1.0]),   # orthogonal to bid 0, aligned with bid 10
            (2, [1.0, 1.0]),   # cos 0.707107 to both -> tie -> bid 0
            (3, [-1.0, 0.0]),  # cos -1 / 0 -> max 0.0 with bid 10
        ],
        "vec_id bigint, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(0, [1.0, 0.0]), (10, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["max_cos"], r["nearest_bench_id"], r["contaminated"])
        for r in embedding_decontaminate(corpus, bench, threshold=0.9).collect()
    }
    assert got[0] == (1.0, 0, True)
    assert got[1] == (1.0, 10, True)
    c = round(float(1 / np.sqrt(2)), 6)
    assert got[2] == (c, 0, False)  # tie at 0.707107 -> lower bench id
    assert got[3] == (0.0, 10, False)
    with pytest.raises(ValueError):
        embedding_decontaminate(corpus, bench.where("vec_id < 0"))


def test_ivf_append_admission_cycle(spark, tmp_path):
    """Build on half the corpus, admit the other half via ivf_append:
    probes must return appended vectors (exact same results as an index
    whose assignment covers the union with the BUILD half's centroids),
    and the appended rows land in the existing list_id partition
    layout."""
    import os

    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import (
        IvfIndex,
        ivf_append,
        ivf_build,
        ivf_query,
        _nearest_lists_udf,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    build_half = df.where("vec_id % 2 = 0")
    batch = df.where("vec_id % 2 = 1")
    path = str(tmp_path / "ivf_idx")
    idx0 = ivf_build(build_half, nlist=4, path=path)
    idx = ivf_append(spark, path, batch)
    qs = df.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_sim"])
        for r in ivf_query(idx, qs, k=8, nprobe=4).collect()
    )
    # reference: same centroids, assignment recomputed over the union
    assign1 = _nearest_lists_udf(df, idx0.cent_rows, "embedding", 1)
    ref_assigned = df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cvec"),
        F.element_at(assign1(F.col("embedding")), 1).alias("list_id"),
    )
    ref = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_sim"])
        for r in ivf_query(
            IvfIndex(idx0.cent_rows, ref_assigned), qs, k=8, nprobe=4
        ).collect()
    )
    assert got == ref
    # nprobe=4 of nlist=4 probes everything: odd (appended) ids appear
    assert any(nid % 2 == 1 for (_, _, nid, _) in got)
    # appended rows live inside the existing partition layout
    dirs = {
        d for d in os.listdir(path + "/assigned") if d.startswith("list_id=")
    }
    assert dirs and all(d.split("=")[1].isdigit() for d in dirs)


def test_beam_search_visited_side_broadcasts(spark):
    """Scale posture pin: the per-round scoring join must BROADCAST the
    bounded visited/query side — the corpus is only ever probed by
    id-equi-joins, never shuffled for the traversal."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.similarity import beam_search_topk

    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    adj = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "id bigint, neighbor_id bigint"
    )
    qs = df.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    out = beam_search_topk(df, qs, adj, k=5, beam=2, rounds=1, n_entry=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_beam_search_table_mode_equals_dataframe_mode(spark):
    """Persisted-adjacency probe (r08 verdict stretch 8): with the
    adjacency written as an id-bucketed managed table, table-mode
    beam_search_topk returns EXACTLY the DataFrame-mode result, and the
    expansion reads the table as a bucket-PRUNED point lookup —
    SelectedBucketsCount strictly below the bucket count in the plan
    (the literal IN pushdown of the bounded beam ids), no Exchange paid
    by the adjacency side."""
    import numpy as np

    from knowledge_graph_etl_spark.extensions.layout import write_bucketed
    from knowledge_graph_etl_spark.extensions.similarity import (
        beam_search_topk,
        knn_graph,
    )

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    adj = knn_graph(df, k=3, nlist=4).select("id", "neighbor_id")
    spark.sql("DROP TABLE IF EXISTS t_beam_adj")
    try:
        write_bucketed(adj, "t_beam_adj", bucket_by=["id"], num_buckets=8)
        qs = df.where("vec_id < 3").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        kw = dict(k=5, beam=3, rounds=2, n_entry=4)
        ref = beam_search_topk(df, qs, adj, **kw)
        out = beam_search_topk(df, qs, "t_beam_adj", **kw)
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        assert sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[3])) == \
            sorted(map(tuple, ref.collect()), key=lambda t: (t[0], t[3]))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan, plan
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_beam_adj")


def test_profile_table_known_values(spark):
    """Hand-checked profiling: exact null/distinct counts, double min/max
    for numerics, NULL min/max for strings, NTZ timestamps converted
    tz-free (wall-clock µs), unsupported columns skipped by default but
    countable on request."""
    import datetime

    import pytest

    from knowledge_graph_etl_spark.extensions.stats import profile_table

    df = spark.createDataFrame(
        [
            (1, "a", 2.5, datetime.datetime(1970, 1, 1, 0, 0, 1), [1]),
            (2, "b", None, datetime.datetime(1970, 1, 2, 0, 0, 0), [2]),
            (2, None, -1.0, None, None),
        ],
        "k bigint, s string, v double, ts timestamp_ntz, arr array<int>",
    )
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v", "ts"}  # arr skipped by default
    k = rows["k"]
    assert (k["dtype"], k["n_rows"], k["n_nulls"], k["n_distinct"]) == (
        "bigint", 3, 0, 2,
    )
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_num"], s["max_num"]) == (
        1, 2, None, None,
    )
    v = rows["v"]
    assert (v["n_nulls"], v["min_num"], v["max_num"]) == (1, -1.0, 2.5)
    ts = rows["ts"]
    assert (ts["dtype"], ts["n_nulls"]) == ("timestamp_ntz", 1)
    assert (ts["min_num"], ts["max_num"]) == (1.0, 86400.0)
    # explicit request profiles the array column (counts; NULL min/max)
    arr = {r["col_name"]: r for r in profile_table(df, ["arr"]).collect()}["arr"]
    assert (arr["n_nulls"], arr["n_distinct"], arr["min_num"]) == (1, 2, None)
    with pytest.raises(ValueError):
        profile_table(df, [])


def test_merge_partials_equals_oneshot_and_one_sided_keys(spark):
    """Merge algebra: partials over any split merge to the one-shot
    aggregate; keys present in only one side pass through."""
    from knowledge_graph_etl_spark.extensions.stats import (
        aggregate_partials,
        merge_partials,
    )

    rows = [("a", 1), ("a", 5), ("b", 3), ("b", -2), ("c", 7)]
    df = spark.createDataFrame(rows, "k string, v long")
    oneshot = {
        r["k"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in aggregate_partials(df, ["k"], "v").collect()
    }
    a = aggregate_partials(df.where("v >= 3"), ["k"], "v")   # a:5 b:3 c:7
    b = aggregate_partials(df.where("v < 3"), ["k"], "v")    # a:1 b:-2
    merged = {
        r["k"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in merge_partials(a, b, ["k"]).collect()
    }
    assert merged == oneshot
    assert merged["c"] == (1, 7, 7, 7)  # one-sided key passes through
    assert merged["b"] == (2, 1, -2, 3)


def test_winsorize_by_group_exact_rank_bounds(spark):
    """Hand-checked rank quantiles: n=20 values 1..20 per group, p05/p95
    → ranks (19*5 div 100)+1=1 and (19*95 div 100)+1=19, so bounds are
    1 and 19 (value 20 clips to 19); a one-row group clips to itself;
    the bounds join must broadcast."""
    import pytest

    from knowledge_graph_etl_spark.extensions.stats import winsorize_by_group

    rows = (
        [(i, "a", i) for i in range(1, 21)]
        + [(100, "b", 7), (200, "a", None), (300, "c", None)]
    )
    df = spark.createDataFrame(rows, "event_id bigint, g string, v bigint")
    out = winsorize_by_group(df, "g", "v")
    got = {r["event_id"]: r["clipped"] for r in out.collect()}
    assert got[20] == 19  # above hi clips down
    assert got[1] == 1 and got[19] == 19 and got[10] == 10
    assert got[100] == 7  # singleton group: lo = hi = the value
    assert got[200] is None  # NULL passes through, not clipped to a bound
    assert got[300] is None  # all-NULL group survives the left bounds join
    assert len(got) == 23
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    with pytest.raises(ValueError):
        winsorize_by_group(df, "g", "v", p_lo_pct=60, p_hi_pct=40)


def test_recall_at_k_known_values(spark):
    """Hand-built approx/exact result tables: full hit, partial hit with
    exact integer-ppm value, a query the index missed entirely (spine
    keeps it at recall 0), rank>k rows ignored on both sides, and an
    approx-only query absent from the output (no ground truth, nothing
    to measure)."""
    import pytest

    from knowledge_graph_etl_spark.extensions.similarity import recall_at_k

    exact = spark.createDataFrame(
        # q1 truth {10,11,12}; q2 truth {20,21,22}; q3 truth {30}
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3),
         (3, 30, 1),
         (1, 99, 4)],  # rank 4 > k: not ground truth at k=3
        "query_id bigint, neighbor_id bigint, rank bigint",
    )
    approx = spark.createDataFrame(
        # q1 finds all 3; q2 finds 2 of 3 (one wrong); q3 absent;
        # q4 has no ground truth; one rank-4 approx row must not count
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 77, 3),
         (4, 40, 1),
         (2, 22, 4)],
        "query_id bigint, neighbor_id bigint, rank bigint",
    )
    got = {
        r["query_id"]: (r["n_hits"], r["n_truth"], r["recall_ppm"])
        for r in recall_at_k(approx, exact, k=3).collect()
    }
    assert got == {
        1: (3, 3, 1000000),
        2: (2, 3, 666666),  # integer div: 2_000_000 // 3
        3: (0, 1, 0),
    }
    with pytest.raises(ValueError):
        recall_at_k(approx, exact, k=0)


def test_profile_drift_known_values(spark):
    """Hand-checked drift: a nulled column moves null ppm exactly, a
    doubled value moves max but not min, added/removed columns carry
    one-sided stats with NULL drift fields, and a dtype change flags."""
    from knowledge_graph_etl_spark.extensions.stats import profile_drift

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id bigint, s string, v bigint",
    )
    new = spark.createDataFrame(
        # s: 2 of 4 NULL now; v: max doubled; id becomes string (dtype
        # change); t added; one row removed
        [("1", None, 10), ("2", None, 20), ("3", "c", 80)],
        "id string, s string, v bigint",
    )
    got = {
        r["col_name"]: r
        for r in profile_drift(
            old, new.select("id", "s", "v", F.lit("x").alias("t"))
        ).collect()
    }
    assert set(got) == {"id", "s", "v", "t"}
    assert got["t"]["status"] == "added" and got["t"]["old_n_rows"] is None
    assert got["t"]["null_drift_ppm"] is None
    assert got["id"]["dtype_changed"] is True
    s = got["s"]
    assert (s["old_nulls_ppm"], s["new_nulls_ppm"]) == (250000, 666666)
    assert s["null_drift_ppm"] == 416666
    v = got["v"]
    assert v["min_shifted"] is False and v["max_shifted"] is True
    assert (v["old_n_rows"], v["new_n_rows"]) == (4, 3)
    # removed column: profile old-only
    got2 = {
        r["col_name"]: r
        for r in profile_drift(old, new.select("id", "v")).collect()
    }
    assert got2["s"]["status"] == "removed"
    assert got2["s"]["new_n_rows"] is None and got2["s"]["max_shifted"] is None


def test_markov_transitions_counts_and_ppm(spark):
    from knowledge_graph_etl_spark.extensions.events import markov_transitions

    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        # u1: view -> click -> buy ; u2: view -> click -> view
        (1, 1, "view", t0), (2, 1, "click", t0 + datetime.timedelta(minutes=1)),
        (3, 1, "buy", t0 + datetime.timedelta(minutes=2)),
        (4, 2, "view", t0), (5, 2, "click", t0 + datetime.timedelta(minutes=1)),
        (6, 2, "view", t0 + datetime.timedelta(minutes=2)),
        # u3: single event -> contributes no transition
        (7, 3, "buy", t0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = {
        (r["src"], r["dst"]): (r["n"], r["src_total"], r["p_ppm"])
        for r in markov_transitions(df).collect()
    }
    assert out[("view", "click")] == (2, 2, 1_000_000)
    assert out[("click", "buy")] == (1, 2, 500_000)
    assert out[("click", "view")] == (1, 2, 500_000)
    assert len(out) == 3  # u3's lone event adds nothing


def test_markov_transitions_tie_break_deterministic(spark):
    """Equal timestamps: sequence order falls back to event_id, so the
    matrix is identical run to run (and matches the oracle's ordering)."""
    from knowledge_graph_etl_spark.extensions.events import markov_transitions

    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    rows = [(i, 1, typ, t0) for i, typ in enumerate(["a", "b", "c"])]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = {(r["src"], r["dst"]) for r in markov_transitions(df).collect()}
    assert out == {("a", "b"), ("b", "c")}


def test_kmv_overlap_exact_under_k(spark):
    """Union smaller than k: the sketch IS the union and every estimate
    collapses to the exact value."""
    from knowledge_graph_etl_spark.extensions.stats import kmv_overlap

    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 20)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    r = kmv_overlap(df, "g", "v", k=64).collect()[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["n_kept"] == 20 and r["n_both"] == 5  # |A∪B|=20, |A∩B|=5
    assert r["est_union"] == 20.0 and r["est_intersect"] == 5.0
    assert abs(r["est_jaccard"] - 0.25) < 1e-9


def test_kmv_overlap_estimates_within_error(spark):
    """Estimation path (union >> k): the k=256 estimate lands within a
    few standard errors (1/sqrt(k-2) ≈ 6%) of truth on a 50% overlap."""
    from knowledge_graph_etl_spark.extensions.stats import kmv_overlap

    n = 4000
    rows = [("a", v) for v in range(n)] + [("b", v) for v in range(n // 2, n + n // 2)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    r = kmv_overlap(df, "g", "v", k=256).collect()[0]
    true_union, true_inter = n + n // 2, n // 2
    assert r["n_kept"] == 256
    assert abs(r["est_union"] - true_union) / true_union < 0.2
    assert abs(r["est_intersect"] - true_inter) / true_inter < 0.3
    assert abs(r["est_jaccard"] - true_inter / true_union) < 0.1


def test_scene_cuts_detects_boundaries_not_noise(spark):
    """Signatures drifting by 1-2 bits stay in one scene; a ~30-bit jump
    opens a new one; first frame of each video is a cut into scene 0."""
    from knowledge_graph_etl_spark.extensions.multimodal import scene_cuts

    A, B = 0x0F0F0F0F0F0F0F0F, 0x70F0F0F0F0F0F0F0
    rows = [
        # video v1: scene A (drift 1 bit), hard cut to scene B at t=300
        ("v1", 0, A), ("v1", 100, A ^ 1), ("v1", 200, A ^ 3),
        ("v1", 300, B), ("v1", 400, B ^ 2),
        # video v2: one scene only
        ("v2", 0, A), ("v2", 100, A),
    ]
    df = spark.createDataFrame(rows, "media_id string, frame_ts_ms long, sig long")
    out = {
        (r["media_id"], r["frame_ts_ms"]): (r["is_cut"], r["scene_id"])
        for r in scene_cuts(df, threshold=8).collect()
    }
    assert out[("v1", 0)] == (True, 0)
    assert out[("v1", 100)] == (False, 0) and out[("v1", 200)] == (False, 0)
    assert out[("v1", 300)] == (True, 1)  # hard cut
    assert out[("v1", 400)] == (False, 1)
    assert out[("v2", 0)] == (True, 0) and out[("v2", 100)] == (False, 0)


def test_join_card_estimate_accuracy_and_exact_key_products(spark):
    """Coordinated sampling: a sampled key contributes its EXACT
    n_a*n_b product; the estimate lands within sampling error of truth
    on a 1000-key join (~sqrt(1/ (1000/16)) ≈ 13% relative error)."""
    from knowledge_graph_etl_spark.extensions.stats import (
        join_cardinality_estimate,
    )

    a = spark.createDataFrame(
        [(k,) for k in range(1000) for _ in range(3)], "k bigint"
    )
    b = spark.createDataFrame(
        [(k,) for k in range(1000) for _ in range(2)], "k bigint"
    )
    r = join_cardinality_estimate(a, b, "k", "k", sample_mod=16).collect()[0]
    truth = 1000 * 3 * 2
    assert 0 < r["n_keys_sampled"] < 200
    # every sampled key contributes exactly 6 pairs -> estimate is
    # n_keys_sampled * 6 * 16, within population-sampling error of truth
    assert r["est_pairs"] == r["n_keys_sampled"] * 6 * 16
    assert abs(r["est_pairs"] - truth) / truth < 0.45


def test_join_card_estimate_disjoint_keys_zero(spark):
    from knowledge_graph_etl_spark.extensions.stats import (
        join_cardinality_estimate,
    )

    a = spark.createDataFrame([(k,) for k in range(100)], "k bigint")
    b = spark.createDataFrame([(k,) for k in range(1000, 1100)], "k bigint")
    r = join_cardinality_estimate(a, b, "k", "k", sample_mod=4).collect()[0]
    assert r["n_keys_sampled"] == 0 and r["est_pairs"] == 0


def test_seasonal_naive_backtest_perfect_and_offset(spark):
    """A perfectly periodic series scores MAE 0 / sMAPE 0; a series that
    is last-season + 1 everywhere scores MAE exactly 1000 milli."""
    from knowledge_graph_etl_spark.extensions.events import (
        seasonal_naive_backtest,
    )
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    # group "flat": count = 2 events every hour for 8 hours (season 4)
    for h in range(8):
        for _ in range(2):
            rows.append(("flat", t0 + datetime.timedelta(hours=h)))
    # group "grow": hour h has (h // 4) + 1 events -> second season = first + 1
    for h in range(8):
        for _ in range(h // 4 + 1):
            rows.append(("grow", t0 + datetime.timedelta(hours=h)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        r["event_type"]: r
        for r in seasonal_naive_backtest(
            df, season=4, holdout=4
        ).collect()
    }
    assert out["flat"]["n_eval"] == 4
    assert out["flat"]["mae_milli"] == 0 and out["flat"]["smape_ppm"] == 0
    assert out["grow"]["mae_milli"] == 1000  # |forecast-actual| = 1 each hour
    # sMAPE per hour: 2e6*1 // (1+2) = 666666
    assert out["grow"]["smape_ppm"] == 666666


def test_seasonal_naive_backtest_zero_fills_gaps(spark):
    """An hour with no events is a real 0 in the grid — the lag stays
    calendar-aligned instead of skipping to the previous nonempty hour."""
    from knowledge_graph_etl_spark.extensions.events import (
        seasonal_naive_backtest,
    )
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    # events only at hours 0 and 4 (season 2): dense grid 0..4, forecasts
    # for hours 3 (lag->h1=0) and 4 (lag->h2=0, actual 1)
    rows = [("a", t0), ("a", t0 + datetime.timedelta(hours=4))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = seasonal_naive_backtest(df, season=2, holdout=2).collect()[0]
    assert r["n_eval"] == 2
    assert r["mae_milli"] == 500  # errors 0 and 1 over 2 evals


def test_dq_rules_report_counts(spark):
    from knowledge_graph_etl_spark.extensions.stats import dq_rules_report

    df = spark.createDataFrame(
        [
            (1, 10.0, 100),
            (2, -5.0, 200),   # range violation
            (2, 20.0, None),  # duplicate key + NULL fk
            (None, 30.0, 999),  # NULL key + FK violation
        ],
        "k bigint, v double, fk bigint",
    )
    dim = spark.createDataFrame([(100,), (200,)], "d bigint")
    out = {
        r["rule"]: (r["n_checked"], r["n_violations"])
        for r in dq_rules_report(
            df,
            not_null=["k", "fk"],
            unique=["k"],
            ranges={"v": (0.0, 100.0)},
            references={"fk": dim},
        ).collect()
    }
    assert out["not_null(k)"] == (4, 1)
    assert out["not_null(fk)"] == (4, 1)
    assert out["unique(k)"] == (3, 2)  # two rows share k=2; NULL k excluded
    assert out["range(v,0.0,100.0)"] == (4, 1)
    assert out["references(fk)"] == (3, 1)  # fk=999 absent from dim


def test_dq_rules_report_clean_table_and_no_rules(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.stats import dq_rules_report

    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    out = dq_rules_report(df, not_null=["k"], unique=["k"]).collect()
    assert all(r["n_violations"] == 0 for r in out)
    with _pytest.raises(ValueError):
        dq_rules_report(df)


def test_vad_segments_islands_and_min_frames(spark):
    """Contiguous high-energy runs become one segment each; a 2-frame
    blip is dropped by min_frames=3; silence never appears."""
    from knowledge_graph_etl_spark.extensions.multimodal import vad_segments

    rows = []
    # media m1: speech frames 0-4, silence 5-9, speech 10-12, blip 20-21
    for i in range(5):
        rows.append(("m1", i, 900))
    for i in range(5, 10):
        rows.append(("m1", i, 100))
    for i in range(10, 13):
        rows.append(("m1", i, 800 + i))
    rows += [("m1", 20, 700), ("m1", 21, 700)]
    df = spark.createDataFrame(rows, "media_id string, frame_idx long, energy_milli long")
    out = {
        (r["media_id"], r["seg_start"]): (r["seg_end"], r["n_frames"], r["mean_energy_milli"])
        for r in vad_segments(df, threshold=500, min_frames=3).collect()
    }
    assert out[("m1", 0)] == (4, 5, 900)
    assert out[("m1", 10)] == (12, 3, 811)  # (810+811+812) div 3
    assert ("m1", 20) not in out  # blip below min_frames
    assert len(out) == 2


def test_rank_normalize_ties_and_nulls(spark):
    from knowledge_graph_etl_spark.extensions.stats import rank_normalize

    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "a", 20.0), (4, "a", 30.0),
        (5, "a", None),
        (6, "b", 7.0),                      # singleton group -> 0
    ]
    df = spark.createDataFrame(rows, "event_id bigint, g string, v double")
    out = {
        r["event_id"]: r["rank_ppm"]
        for r in rank_normalize(df, "v", group_col="g", id_cols=["event_id"]).collect()
    }
    assert out[1] == 0
    assert out[2] == out[3] == 333333      # ties share (rank-1)=1 of n-1=3
    assert out[4] == 1000000
    assert out[5] is None                  # NULL passes through
    assert out[6] == 0


def test_rolling_distinct_window_semantics(spark):
    """Hand-built 3-day window over 5 days: multiplicity within a day is
    ignored, a user spanning days counts once per window, trailing
    phantom windows past the last observed day are not emitted."""
    import datetime

    from knowledge_graph_etl_spark.extensions.events import rolling_distinct

    t0 = datetime.datetime(2026, 1, 1)

    def e(u, day):
        return (u, t0 + datetime.timedelta(days=day))

    rows = [
        e(1, 0), e(1, 0),       # duplicate same-day events: once
        e(2, 0),
        e(1, 2),
        e(3, 4),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {
        r["period"] - 20454: r["n_distinct"]  # 2026-01-01 = epoch day 20454
        for r in rolling_distinct(df, window_periods=3, ts_col="ts").collect()
    }
    assert out[0] == 2          # day 0: users {1,2}
    assert out[1] == 2          # window [-1..1] -> day-0 users
    assert out[2] == 2          # window [0..2]: {1,2} (1 counted once)
    assert out[3] == 1          # window [1..3]: {1}
    assert out[4] == 2          # window [2..4]: {1,3}
    assert max(out) == 4        # no window end past the last observed day


def test_hll_rolling_merge_equals_union_sketch(spark):
    """Mergeability contract: the rolling merge of per-day registers for
    a window equals the HLL computed directly on that window's union of
    events — same registers, same estimate."""
    import datetime

    from knowledge_graph_etl_spark.extensions.stats import (
        hll_distinct,
        hll_rolling_distinct,
    )

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    for day in range(6):
        for u in range(day * 40, day * 40 + 120):  # overlapping user ranges
            rows.append((u, t0 + datetime.timedelta(days=day)))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    w = 3
    rolled = {
        r["period"]: (r["n_registers_set"], r["est_micro"])
        for r in hll_rolling_distinct(df, window_periods=w, p=6).collect()
    }
    # direct sketch over the union of days 2..4 (window end = day 4)
    day0 = 20454  # 2026-01-01
    window_df = df.where(
        (F.col("ts") >= datetime.datetime(2026, 1, 3))
        & (F.col("ts") < datetime.datetime(2026, 1, 6))
    ).withColumn("g", F.lit("w"))
    direct = hll_distinct(window_df, "g", "user_id", p=6).collect()[0]
    assert rolled[day0 + 4] == (
        direct["n_registers_set"],
        direct["est_micro"],
    )


def test_kanonymity_report_flags(spark):
    from knowledge_graph_etl_spark.extensions.stats import kanonymity_report

    rows = (
        [("us", "A", s) for s in [1, 2, 3]]          # n=3 < k, l ok
        + [("us", "B", 1)] * 6                        # n=6, one value -> l viol
        + [("de", "A", s) for s in [1, 1, 2, 3, 4]]   # n=5, 4 values -> clean
    )
    df = spark.createDataFrame(rows, "nat string, seg string, s bigint")
    out = {
        (r["nat"], r["seg"]): (r["group_n"], r["n_sensitive"], r["k_violation"], r["l_violation"])
        for r in kanonymity_report(df, ["nat", "seg"], "s", k=5, l=2).collect()
    }
    assert out[("us", "A")] == (3, 3, True, False)
    assert out[("us", "B")] == (6, 1, False, True)
    assert out[("de", "A")] == (5, 4, False, False)


def test_selectivity_estimate_uniform_data(spark):
    """On uniform data the histogram estimate is near-exact; the
    interpolation handles predicates cutting through bin interiors."""
    from knowledge_graph_etl_spark.extensions.stats import selectivity_estimate

    df = spark.createDataFrame([(v,) for v in range(10_000)], "x bigint")
    out = {
        (r["lo"], r["hi"]): (r["est_rows"], r["actual_rows"], r["err_ppm"])
        for r in selectivity_estimate(
            df, "x", predicates=[(0, 4999), (2500, 7499), (9990, 9999)], bins=64
        ).collect()
    }
    est, actual, err = out[(0, 4999)]
    assert actual == 5000 and abs(est - 5000) <= 5
    est, actual, err = out[(2500, 7499)]
    assert actual == 5000 and abs(est - 5000) <= 5
    est, actual, err = out[(9990, 9999)]
    assert actual == 10 and abs(est - 10) <= 5  # sub-bin predicate interpolates


def test_selectivity_estimate_skew_shows_error(spark):
    """A point-mass distribution defeats equi-width histograms inside a
    bin — the eval reports the error instead of hiding it."""
    from knowledge_graph_etl_spark.extensions.stats import selectivity_estimate

    rows = [(0,)] * 900 + [(v,) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "x bigint")
    r = selectivity_estimate(df, "x", predicates=[(0, 0)], bins=4).collect()[0]
    assert r["actual_rows"] == 900
    assert r["est_rows"] < 900  # uniform-in-bin assumption under-reads
    assert r["err_ppm"] > 0


def test_trend_by_group_exact_line_and_degenerate(spark):
    """A perfect line recovers its slope/intercept exactly in milli
    units; a single-period group reports NULL slope."""
    import datetime

    from knowledge_graph_etl_spark.extensions.events import trend_by_group

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    for h in range(10):
        rows.append(("lin", t0 + datetime.timedelta(hours=h), 5.0 + 2.5 * h))
    rows.append(("flat", t0, 7.0))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["event_type"]: (r["n"], r["slope_milli_per_period"], r["intercept_milli"])
        for r in trend_by_group(df).collect()
    }
    assert out["lin"] == (10, 2500, 5000)
    assert out["flat"][1] is None and out["flat"][2] is None


def test_cusum_changepoints_detects_shift_with_reset(spark):
    """A 10/h -> 2/h drop after hour 30 raises 'down' alarms only after
    the shift; the statistic resets after each alarm (restart-after-
    detection), and the stable baseline raises nothing."""
    import datetime

    from knowledge_graph_etl_spark.extensions.events import cusum_changepoints

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    for h in range(30):
        rows += [("A", t0 + datetime.timedelta(hours=h, minutes=m)) for m in range(0, 60, 6)]
    for h in range(30, 50):
        rows += [("A", t0 + datetime.timedelta(hours=h, minutes=m)) for m in range(0, 60, 30)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = cusum_changepoints(
        df, baseline_periods=24, threshold_x1000=5000, slack_x1000=500
    ).collect()
    assert out, "shift must alarm"
    h0 = 490896  # 2026-01-01T00 epoch hour (20454 days * 24)
    assert all(r["direction"] == "down" for r in out)
    assert all(r["period"] >= h0 + 30 for r in out)  # nothing pre-shift
    # reset: consecutive alarms imply re-accumulation, so each alarming
    # statistic must exceed the threshold on its own
    assert all(r["stat_lo_x1000"] > 5000 for r in out)


def test_conversion_paths_depth_and_cold_start(spark):
    import datetime

    from knowledge_graph_etl_spark.extensions.events import conversion_paths

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        # u1: view > click > purchase
        (1, 1, "view", t0), (2, 1, "click", t0 + datetime.timedelta(minutes=1)),
        (3, 1, "purchase", t0 + datetime.timedelta(minutes=2)),
        # u2: cold-start purchase as second event: ^ marker
        (4, 2, "view", t0), (5, 2, "purchase", t0 + datetime.timedelta(minutes=1)),
        # u3: purchase as very first event
        (6, 3, "purchase", t0),
        # u4: same path as u1
        (7, 4, "view", t0), (8, 4, "click", t0 + datetime.timedelta(minutes=1)),
        (9, 4, "purchase", t0 + datetime.timedelta(minutes=2)),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = {r["path"]: r["n"] for r in conversion_paths(df).collect()}
    assert out == {
        "view>click>purchase": 2,
        "^>view>purchase": 1,
        "^>^>purchase": 1,
    }


# ---------------------------------------------------------------------------
# ks_2sample (extensions/stats.ks_2sample)
# ---------------------------------------------------------------------------


def test_ks_2sample_hand_checked(spark):
    from knowledge_graph_etl_spark.extensions.stats import ks_2sample

    # a: {1,2,3}; b: {3,4,5,6} -> ECDFs diverge most at v=2 (3/3 vs 0/4)
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0)] + [
        ("b", float(x)) for x in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_2sample(df, "g", "v", quant_scale=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 3, 4)
    # max |ca*nb - cb*na|: at v=2 -> |2*4 - 0*3| = 8; v=3 -> |12-3|=9
    assert r.d_num == 9
    assert r.d_ppm == 9 * 1_000_000 // 12


def test_ks_2sample_identical_distributions_zero(spark):
    from knowledge_graph_etl_spark.extensions.stats import ks_2sample

    rows = [("a", float(x)) for x in range(10)] + [
        ("b", float(x)) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_2sample(df, "g", "v").collect()[0]
    assert r.d_num == 0 and r.d_ppm == 0


def test_ks_2sample_null_values_excluded_and_pairs_ordered(spark):
    from knowledge_graph_etl_spark.extensions.stats import ks_2sample

    rows = [("b", 1.0), ("b", None), ("a", 1.0), ("c", 2.0), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r.group_a, r.group_b): r for r in ks_2sample(df, "g", "v").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")].n_b == 1  # NULL excluded from the total
    assert out[("a", "b")].d_num == 0  # identical single-point ECDFs
    assert out[("a", "c")].d_ppm == 1_000_000  # disjoint supports

    with pytest.raises(ValueError):
        ks_2sample(df, "g", "v", quant_scale=0)


# ---------------------------------------------------------------------------
# int8_topk (extensions/similarity.int8_topk)
# ---------------------------------------------------------------------------


def test_int8_topk_matches_float_on_wellseparated_vectors(spark):
    from knowledge_graph_etl_spark.extensions.similarity import (
        cosine_topk,
        int8_topk,
    )

    # axis-aligned unit-ish vectors: quantization is exact up to scale,
    # so int8 ranking must equal float ranking
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.1])], "query_id int, embedding array<double>"
    )
    got = [
        (r.neighbor_id, r.rank)
        for r in int8_topk(corpus, q, k=4).orderBy("rank").collect()
    ]
    want = [
        (r.neighbor_id, r.rank)
        for r in cosine_topk(corpus, q, k=4).orderBy("rank").collect()
    ]
    assert got == want


def test_int8_topk_integer_dot_is_exact(spark):
    from knowledge_graph_etl_spark.extensions.similarity import int8_topk

    # [3,4] quantizes to [95,127] (scale 127/4); [6,8] identically ->
    # qcos must be exactly 1.0 (integer dot == product of norms)
    corpus = spark.createDataFrame(
        [(1, [6.0, 8.0])], "vec_id int, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(9, [3.0, 4.0])], "query_id int, embedding array<double>"
    )
    r = int8_topk(corpus, q, k=1).collect()[0]
    assert r.qcos_sim == 1.0


def test_int8_topk_zero_vector_scores_zero(spark):
    from knowledge_graph_etl_spark.extensions.similarity import int8_topk

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(9, [1.0, 1.0])], "query_id int, embedding array<double>"
    )
    rows = {r.neighbor_id: r.qcos_sim for r in int8_topk(corpus, q, k=2).collect()}
    assert rows[1] == 0.0 and rows[2] > 0.0

    with pytest.raises(ValueError):
        int8_topk(corpus, q, k=0)


# ---------------------------------------------------------------------------
# mad_outlier_report (extensions/stats.mad_outlier_report)
# ---------------------------------------------------------------------------


def test_mad_outliers_hand_checked(spark):
    from knowledge_graph_etl_spark.extensions.stats import mad_outlier_report

    # group a: values 1..7 plus a wild 100 -> n=8, lower median of
    # {1..7,100} = 4, deviations {3,2,1,0,1,2,3,96} sorted
    # {0,1,1,2,2,3,3,96} -> lower median (rank (8+1)//2=4) = 2;
    # outliers: |x-4| > 3*2=6 -> only 100.
    rows = [("a", float(x)) for x in range(1, 8)] + [("a", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mad_outlier_report(df, "g", "v", k=3, quant_scale=1).collect()[0]
    assert (r.n, r.med_milli, r.mad_milli, r.n_outliers) == (8, 4, 2, 1)


def test_mad_outliers_constant_group_and_nulls(spark):
    from knowledge_graph_etl_spark.extensions.stats import mad_outlier_report

    # constant group: MAD = 0, any deviation is an outlier when k*0 < |d|
    rows = [("c", 5.0)] * 4 + [("c", 6.0), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mad_outlier_report(df, "g", "v", k=3, quant_scale=1).collect()[0]
    assert (r.n, r.med_milli, r.mad_milli) == (5, 5, 0)
    assert r.n_outliers == 1  # the lone 6.0; NULL excluded from n

    with pytest.raises(ValueError):
        mad_outlier_report(df, "g", "v", k=-1)
    with pytest.raises(ValueError):
        mad_outlier_report(df, "g", "v", quant_scale=0)


def test_mad_outliers_no_outliers_reports_zero(spark):
    from knowledge_graph_etl_spark.extensions.stats import mad_outlier_report

    rows = [("g", float(x)) for x in (10, 11, 12, 13, 14)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mad_outlier_report(df, "g", "v", k=3, quant_scale=1).collect()[0]
    assert (r.med_milli, r.mad_milli, r.n_outliers) == (12, 1, 0)


# ---------------------------------------------------------------------------
# time_weighted_avg (extensions/events.time_weighted_avg)
# ---------------------------------------------------------------------------


def test_twap_hand_checked_hold_semantics(spark):
    from knowledge_graph_etl_spark.extensions.events import time_weighted_avg

    # value 100 held for 9 us, then 0 held for 1 us, then 50 (no hold):
    # twap = (9*100 + 1*0) / 10 = 90
    rows = [("s", 0, 1, 100.0), ("s", 9, 2, 0.0), ("s", 10, 3, 50.0)]
    df = spark.createDataFrame(rows, "g string, ts long, id int, v double")
    r = time_weighted_avg(
        df, "g", "ts", "v", tiebreak_col="id", quant_scale=1
    ).collect()[0]
    assert (r.n_samples, r.held_us, r.twap_milli) == (3, 10, 90)


def test_twap_single_sample_and_nulls(spark):
    from knowledge_graph_etl_spark.extensions.events import time_weighted_avg

    rows = [("a", 0, 1, 7.0), ("b", 0, 1, 1.0), ("b", 5, 2, None), ("b", 10, 3, 3.0)]
    df = spark.createDataFrame(rows, "g string, ts long, id int, v double")
    out = {r.g: r for r in time_weighted_avg(df, "g", "ts", "v", tiebreak_col="id", quant_scale=1).collect()}
    # single sample: nothing held -> NULL twap
    assert out["a"].n_samples == 1 and out["a"].twap_milli is None
    # NULL sample removed BEFORE pairing: 1.0 held 0..10 (10us), twap=1
    assert (out["b"].n_samples, out["b"].held_us, out["b"].twap_milli) == (2, 10, 1)

    with pytest.raises(ValueError):
        time_weighted_avg(df, "g", "ts", "v", quant_scale=0)


def test_twap_weights_not_simple_average(spark):
    from knowledge_graph_etl_spark.extensions.events import time_weighted_avg

    # 100 held 99us, 0 held 1us -> twap 99000/100us = 99.0 (avg would be 50)
    rows = [("s", 0, 100.0), ("s", 99, 0.0), ("s", 100, 0.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    r = time_weighted_avg(df, "g", "ts", "v", quant_scale=1).collect()[0]
    assert r.twap_milli == 99


# ---------------------------------------------------------------------------
# benford_report (extensions/stats.benford_report)
# ---------------------------------------------------------------------------


def test_benford_digit_extraction_and_spine(spark):
    from knowledge_graph_etl_spark.extensions.stats import benford_report

    # first digits at quant_scale=1: 1, 1, 9, 3 (0.5 -> floor(0.5*1+0.5)=1);
    # zero/negative/NULL excluded
    rows = [(1.0,), (19.0,), (900.4,), (3.0,), (0.5,), (0.0,), (-7.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_report(df, "v", quant_scale=1).collect()}
    assert set(out) == set(range(1, 10))  # spine always complete
    assert out[1].n == 3 and out[3].n == 1 and out[9].n == 1
    assert out[2].n == 0 and out[2].pct_ppm == 0
    assert out[1].pct_ppm == 3 * 1_000_000 // 5
    assert out[1].benford_ppm == 301030
    assert out[1].delta_ppm == abs(out[1].pct_ppm - 301030)

    with pytest.raises(ValueError):
        benford_report(df, "v", quant_scale=0)


def test_benford_uniform_magnitudes_follow_law_roughly(spark):
    import math

    from knowledge_graph_etl_spark.extensions.stats import benford_report

    # 1000 log-uniform-ish values via exp of a dense grid: digit-1 share
    # should land near 301030 ppm, far from uniform 111111
    vals = [(math.exp(i * 13.815 / 1000),) for i in range(1000)]
    df = spark.createDataFrame(vals, "v double")
    r = {x.digit: x for x in benford_report(df, "v", quant_scale=1000).collect()}
    assert abs(r[1].pct_ppm - 301030) < 25_000, r[1]


# ---------------------------------------------------------------------------
# pareto_frontier (extensions/stats.pareto_frontier)
# ---------------------------------------------------------------------------


def test_pareto_frontier_dominance_and_ties(spark):
    from knowledge_graph_etl_spark.extensions.stats import pareto_frontier

    rows = [
        (10.0, 5.0),   # frontier
        (10.0, 5.0),   # duplicate point -> one output row
        (10.0, 7.0),   # dominated within same benefit (higher cost)
        (8.0, 5.0),    # dominated by (10,5): lower benefit, equal cost
        (8.0, 3.0),    # frontier (cheaper than every higher-benefit row)
        (12.0, 9.0),   # frontier (highest benefit)
        (11.0, 9.0),   # dominated by (12,9): equal cost, lower benefit
    ]
    df = spark.createDataFrame(rows, "b double, c double")
    got = [(r.benefit, r.cost) for r in
           pareto_frontier(df, "b", "c", quant_scale=1).collect()]
    assert got == [(8, 3), (10, 5), (12, 9)]


def test_pareto_frontier_equals_not_exists(spark):
    from knowledge_graph_etl_spark.extensions.stats import pareto_frontier

    import itertools
    pts = [(float(b), float((b * 7 + c * 13) % 20)) for b, c in
           itertools.product(range(12), range(5))]
    df = spark.createDataFrame(pts, "b double, c double")
    got = {(r.benefit, r.cost) for r in
           pareto_frontier(df, "b", "c", quant_scale=1).collect()}
    grid = set((int(b), int(c)) for b, c in pts)
    want = {
        (b, c) for (b, c) in grid
        if not any(
            ob >= b and oc <= c and (ob > b or oc < c) for (ob, oc) in grid
        )
    }
    assert got == want and got

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pareto_frontier(df, "b", "c", quant_scale=0)


# ---------------------------------------------------------------------------
# class_separation (extensions/similarity.class_separation)
# ---------------------------------------------------------------------------


def test_class_separation_tight_vs_confusable(spark):
    from knowledge_graph_etl_spark.extensions.similarity import (
        class_separation,
    )

    rows = [
        # label 0: tight cluster on +x
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.01, 0.0]),
        # label 1: near label 0 (the confuser)
        (3, 1, [0.9, 0.1, 0.0]),
        (4, 1, [0.9, 0.12, 0.0]),
        # label 2: orthogonal
        (5, 2, [0.0, 0.0, 1.0]),
        (6, 2, [0.0, 0.01, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r.label: r for r in class_separation(df).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r.n_vecs == 2 and r.intra_ppm > 990_000
    # 0 and 1 confuse each other; 2's nearest is far lower
    assert out[0].nearest_label == 1 and out[1].nearest_label == 0
    assert out[0].nearest_cos_ppm > 980_000
    assert out[2].nearest_cos_ppm < 200_000


def test_class_separation_single_label_self_sentinel(spark):
    from knowledge_graph_etl_spark.extensions.similarity import (
        class_separation,
    )

    df = spark.createDataFrame(
        [(1, 7, [1.0, 0.0]), (2, 7, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>",
    )
    r = class_separation(df).collect()[0]
    # no other class: nearest falls back to self with cos 1.0
    assert (r.label, r.nearest_label, r.nearest_cos_ppm) == (7, 7, 1_000_000)
    # orthogonal members at 45 degrees from centroid: intra ~ 707107
    assert abs(r.intra_ppm - 707107) <= 1


# ---------------------------------------------------------------------------
# psi_report (extensions/stats.psi_report)
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from knowledge_graph_etl_spark.extensions.stats import psi_report

    rows = [(float(i % 100),) for i in range(1000)]
    ref = spark.createDataFrame(rows, "v double")
    out = psi_report(ref, ref, "v", bins=10, quant_scale=1).collect()
    assert len(out) == 10
    assert sum(r.psi_micro for r in out) == 0
    # each decile bin holds ~10% of the reference
    for r in out:
        assert abs(r.ref_ppm - 100_000) < 15_000
        assert r.ref_cnt == r.cur_cnt


def test_psi_shifted_distribution_scores_high(spark):
    import math

    from knowledge_graph_etl_spark.extensions.stats import psi_report

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    cur = spark.createDataFrame(
        [(float(50 + i % 50),) for i in range(1000)], "v double"
    )
    out = psi_report(ref, cur, "v", bins=10, quant_scale=1).collect()
    total = sum(r.psi_micro for r in out) / 1e6
    assert total > 0.25  # the "action" threshold
    # hand value for the emptied first bin: p=~0.1, q=eps=1ppm
    first = [r for r in out if r.bin_id == 0][0]
    assert first.cur_cnt == 0 and first.cur_ppm == 1
    want = math.floor(
        (first.ref_ppm - 1) / 1e6 * math.log(first.ref_ppm / 1.0) * 1e6 + 0.5
    )
    assert first.psi_micro == want


def test_psi_validates(spark):
    from knowledge_graph_etl_spark.extensions.stats import psi_report

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_report(df, df, "v", bins=1)
    with pytest.raises(ValueError):
        psi_report(df, df, "v", quant_scale=0)


# ---------------------------------------------------------------------------
# knn_label_eval (extensions/similarity.knn_label_eval)
# ---------------------------------------------------------------------------


def test_knn_label_eval_separable_clusters_perfect(spark):
    from knowledge_graph_etl_spark.extensions.similarity import (
        knn_label_eval,
    )

    rows = [(i, 0, [1.0, float(i) / 100.0]) for i in range(1, 7)] + [
        (i, 1, [-1.0, float(i) / 100.0]) for i in range(10, 16)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r.label: r for r in knn_label_eval(df, k=3, n_queries=12).collect()}
    assert out[0].acc_ppm == 1_000_000 and out[1].acc_ppm == 1_000_000
    assert out[0].n_eval + out[1].n_eval == 12


def test_knn_label_eval_excludes_self_and_votes_majority(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.similarity import (
        knn_label_eval,
    )

    # one 'a'-labeled point surrounded by 'b' points: self-exclusion
    # forces its k=3 neighbors to all be b -> misclassified
    rows = [(1, 0, [1.0, 0.0])] + [
        (i, 1, [1.0, 0.001 * i]) for i in range(2, 6)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r.label: r for r in knn_label_eval(df, k=3, n_queries=5).collect()}
    assert out[0].n_correct == 0
    assert out[1].acc_ppm == 1_000_000
    with _pytest.raises(ValueError):
        knn_label_eval(df, k=0)
    with _pytest.raises(ValueError):
        knn_label_eval(df, n_queries=0)


# ---------------------------------------------------------------------------
# readability (extensions/text.readability) + fd_violations (stats)
# ---------------------------------------------------------------------------


def test_readability_hand_checked(spark):
    from knowledge_graph_etl_spark.extensions.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {r.id: r for r in readability(df).collect()}
    r = out[1]
    # 2 sentence runs, 6 words, syllable groups: e-a-a-e-o-a = 6
    assert (r.n_sents, r.n_words, r.n_syll) == (2, 6, 6)
    import math
    want = math.floor((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e6 + 0.5)
    assert r.flesch_micro == want
    # empty/NULL text: zero words -> NULL score, row kept, 1-sentence floor
    for i in (2, 3):
        assert out[i].n_words == 0 and out[i].flesch_micro is None
        assert out[i].n_sents == 1


def test_fd_violations_detects_and_respects_nulls(spark):
    from knowledge_graph_etl_spark.extensions.stats import fd_violations

    rows = [
        (1, "a"), (1, "a"),          # clean key
        (2, "a"), (2, "b"),          # violation: 2 rhs
        (3, "a"), (3, None),         # NULL is a DISTINCT rhs -> violation
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    out = {r.k: r for r in fd_violations(df, ["k"], ["v"]).collect()}
    assert set(out) == {2, 3}
    assert out[2].n_rhs == 2 and out[2].n_rows == 2
    assert out[3].n_rhs == 2

    with pytest.raises(ValueError):
        fd_violations(df, [], ["v"])
    with pytest.raises(ValueError):
        fd_violations(df, ["k"], ["k"])


def test_ngram_novelty_order_and_short_docs(spark):
    from knowledge_graph_etl_spark.extensions.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c","b c d" -> both novel
            (2, "a b c x"),        # "a b c" seen in 1, "b c x" novel
            (3, "a b c d"),        # both grams first seen in 1 -> 0 novel
            (4, "hi"),             # < n tokens -> 0 grams, NULL ppm
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in ngram_novelty(df, n=3).collect()}
    assert (out[1].n_grams, out[1].n_novel, out[1].novelty_ppm) == (2, 2, 1_000_000)
    assert (out[2].n_grams, out[2].n_novel, out[2].novelty_ppm) == (2, 1, 500_000)
    assert (out[3].n_grams, out[3].n_novel, out[3].novelty_ppm) == (2, 0, 0)
    assert out[4].n_grams == 0 and out[4].novelty_ppm is None

    import pytest as _pytest
    with _pytest.raises(ValueError):
        ngram_novelty(df, n=0)


def test_cramers_v_perfect_and_independent(spark):
    from knowledge_graph_etl_spark.extensions.stats import cramers_v

    # perfect association: b is a function of a -> V = 1
    rows = [("x", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert (r.n, r.n_a, r.n_b, r.dof) == (10, 2, 2, 1)
    assert r.cramers_v_ppm == 1_000_000

    # perfect independence: uniform 2x2 -> chi2 = 0, V = 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.chi2_micro == 0 and r.cramers_v_ppm == 0


def test_cramers_v_null_category_and_degenerate(spark):
    from knowledge_graph_etl_spark.extensions.stats import cramers_v

    # NULL is a real category: NULL-a rows all map to 'q' -> association
    rows = [("x", "p"), ("x", "p"), (None, "q"), (None, "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.n_a == 2 and r.cramers_v_ppm == 1_000_000

    # single-category side: dof 0, V reported as 0 (not NaN)
    rows = [("x", "p"), ("x", "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert (r.dof, r.chi2_micro, r.cramers_v_ppm) == (0, 0, 0)


def test_ks_2sample_ppm_no_bigint_wrap_at_large_n(spark):
    """ADVICE r09 (medium): d_num·10⁶ wrapped bigint once n_a·n_b
    exceeded ~9.2e12 (~3e6 rows/side) — the ppm division is now widened
    through decimal(38,0), so the op holds to the dev term's documented
    n_a·n_b < 2^63 bound. Two fully-separated 3.1M-row groups reduce to
    a 2-row histogram, so the test is cheap despite the row counts."""
    from knowledge_graph_etl_spark.extensions.stats import ks_2sample

    n = 3_100_000  # n*n ≈ 9.61e12 → d_num·1e6 ≈ 9.61e18 > 2^63 pre-fix
    a = spark.range(n).select(F.lit("a").alias("g"), F.lit(0.0).alias("v"))
    b = spark.range(n).select(F.lit("b").alias("g"), F.lit(1.0).alias("v"))
    r = ks_2sample(a.unionAll(b), "g", "v").collect()[0]
    assert r.d_num == n * n
    assert r.d_ppm == 1_000_000


def test_cramers_v_literal_null_string_distinct_from_null(spark):
    """ADVICE r09 (low): the old ' NULL' string sentinel merged a
    legitimate ' NULL' category with real NULLs; the injective tag
    encoding ('N' vs 'V'||value) cannot collide."""
    from knowledge_graph_etl_spark.extensions.stats import cramers_v

    rows = [
        (" NULL", "p"),
        (" NULL", "p"),
        (None, "q"),
        (None, "q"),
        ("x", "p"),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.n_a == 3  # ' NULL', real NULL and 'x' are three categories
    assert r.n == 5


def test_mutual_information_independent_and_determined(spark):
    from knowledge_graph_etl_spark.extensions.stats import mutual_information

    # perfect independence: uniform 2x2 -> MI = 0, NMI = 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert (r.n, r.n_a, r.n_b) == (12, 2, 2)
    assert r.mi_micro_bits == 0 and r.nmi_ppm == 0
    # uniform binary marginals: H = 1 bit exactly
    assert r.h_a_micro_bits == 1_000_000
    assert r.h_b_micro_bits == 1_000_000

    # b determined by a (balanced): MI = H(a) = H(b) = 1 bit, NMI = 1
    rows = [("x", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.mi_micro_bits == 1_000_000
    assert r.nmi_ppm == 1_000_000


def test_mutual_information_null_category(spark):
    from knowledge_graph_etl_spark.extensions.stats import mutual_information

    # NULL forms a real category that carries information about b
    rows = [("x", "p"), ("x", "p"), (None, "q"), (None, "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.n_a == 2 and r.mi_micro_bits == 1_000_000
    assert r.nmi_ppm == 1_000_000

    # single-category side: H(a) = 0 -> guard reports NMI 0, MI 0
    rows = [("x", "p"), ("x", "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert (r.mi_micro_bits, r.h_a_micro_bits, r.nmi_ppm) == (0, 0, 0)


def test_zipf_fit_exact_power_law_slope(spark):
    from knowledge_graph_etl_spark.extensions.text import zipf_fit

    # two ranks lying EXACTLY on the log-log line y = 12 - x: counts
    # 4096 (rank 1, x=0, y=12) and 2048 (rank 2, x=1, y=11) -> the OLS
    # fit through two points is exact: slope -1, intercept 12
    docs = [
        (0, " ".join(["alpha"] * 4096)),
        (1, " ".join(["beta"] * 2048)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = zipf_fit(df, group_col=None, top_ranks=100).collect()[0]
    assert r.n_ranks == 2
    assert abs(r.slope - (-1.0)) < 1e-5, r
    assert abs(r.intercept - 12.0) < 1e-5, r


def test_zipf_fit_matches_pure_python_quantized_ols(spark):
    """The engine result equals a pure-Python replication of the same
    quantized-OLS pipeline on an arbitrary (non-power-law) corpus —
    pins the quantization/formula determinism end to end."""
    import math

    from knowledge_graph_etl_spark.extensions.text import zipf_fit

    counts = {"t1": 37, "t2": 19, "t3": 19, "t4": 7, "t5": 3}
    text = " ".join(tok for tok, c in counts.items() for tok in [tok] * c)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = zipf_fit(df, group_col=None, top_ranks=4).collect()[0]

    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    pts = [
        (
            math.floor(math.log2(i + 1) * 1e6 + 0.5),
            math.floor(math.log2(c) * 1e6 + 0.5),
        )
        for i, (_, c) in enumerate(ranked)
    ]
    n = float(len(pts))
    sx = float(sum(p[0] for p in pts))
    sy = float(sum(p[1] for p in pts))
    sxy = float(sum(p[0] * p[1] for p in pts))
    sxx = float(sum(p[0] * p[0] for p in pts))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    assert r.n_ranks == 4
    assert abs(r.slope - round(slope, 6)) < 1e-9, (r, slope)
    assert abs(r.intercept - round(intercept, 6)) < 1e-9, (r, intercept)


def test_zipf_fit_rank_cutoff_and_groups(spark):
    from knowledge_graph_etl_spark.extensions.text import zipf_fit

    rows = [
        (1, "a a a b b c", "s1"),
        (2, "d d d d e", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in zipf_fit(df, top_ranks=2).collect()}
    assert out["s1"].n_ranks == 2  # c cut by top_ranks
    assert out["s2"].n_ranks == 2


def test_ab_ztest_degenerate_pool_guard(spark):
    """The two-proportion z expression guards zero-variance pools: all
    converted (or none) reports z = 0 / not-significant instead of an
    ANSI divide-by-zero — exactly the fixture shape that motivated the
    >=14-purchases conversion definition in events_ab_ztest."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 2 == 0, 1) for i in range(10)], "is_a boolean, conv bigint"
    )
    agg = df.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("is_a"), F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(~F.col("is_a"), F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    pool = (xa + xb) / (na + nb)
    z = F.when(
        (F.col("x_a") + F.col("x_b") > 0)
        & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b")),
        (xa / na - xb / nb)
        / F.sqrt(
            pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
        ),
    ).otherwise(F.lit(0.0))
    r = agg.select(F.round(z, 6).alias("z")).collect()[0]
    assert r.z == 0.0


def test_km_survival_hand_checked(spark):
    from knowledge_graph_etl_spark.extensions.events import km_survival

    # lifetimes: A,B churn at t=2; C churns at t=4; D censored (last
    # event == corpus max). KM: S(2) = 1 - 2/4 = 0.5;
    # S(4) = 0.5 * (1 - 1/2) = 0.25.
    rows = [
        ("A", "2024-01-01"), ("A", "2024-01-03"),
        ("B", "2024-01-01"), ("B", "2024-01-03"),
        ("C", "2024-01-01"), ("C", "2024-01-05"),
        ("D", "2024-01-05"), ("D", "2024-01-10"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r.t_days: r for r in km_survival(df).collect()}
    assert set(out) == {2, 4}
    assert (out[2].n_risk, out[2].n_churn, out[2].surv_ppm) == (4, 2, 500000)
    assert (out[4].n_risk, out[4].n_churn, out[4].surv_ppm) == (2, 1, 250000)
    assert out[4].n_censored_at_t == 0


def test_km_survival_risk_set_exhausted(spark):
    from knowledge_graph_etl_spark.extensions.events import km_survival

    # E censored with lifetime 0 (leaves the risk set before t=1);
    # F churns at t=1 as the LAST at-risk user -> d == n, survival hits
    # exact 0: surv_log2_micro NULL, surv_ppm 0.
    rows = [
        ("E", "2024-01-10"),
        ("F", "2024-01-01"), ("F", "2024-01-02"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = km_survival(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.t_days, r.n_risk, r.n_churn) == (1, 1, 1)
    assert r.surv_log2_micro is None and r.surv_ppm == 0


def test_sample_quantile_sketch_exact_at_rate_one_and_mergeable(spark):
    """rate_denom=1 keeps every row, so the 'sketch' quantiles are the
    exact order statistics; the shard-union merge property holds by
    construction (hash sample of a union == union of hash samples); the
    DKW bound shrinks with n."""
    from knowledge_graph_etl_spark.extensions.stats import (
        sample_quantile_sketch,
    )

    rows = [(i, "g" if i % 2 == 0 else "h", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {
        r["grp"]: r
        for r in sample_quantile_sketch(
            df, "v", "id", rate_denom=1, fracs=(0.5, 0.9), group_col="grp"
        ).collect()
    }
    # group g = evens 2..100 (n=50): p0_5 = 25th value = 50.0, p0_9 = 45th = 90.0
    assert out["g"]["n_sample"] == 50
    assert out["g"]["p0_5"] == 50.0 and out["g"]["p0_9"] == 90.0
    # group h = odds 1..99: p0_5 = 25th odd = 49.0
    assert out["h"]["p0_5"] == 49.0
    # merge property: sketch(union of shards) == union of shard sketches
    shard_a, shard_b = df.where("id <= 60"), df.where("id > 60")
    whole = sample_quantile_sketch(df, "v", "id", rate_denom=4, group_col="grp")
    merged = sample_quantile_sketch(
        shard_a.unionByName(shard_b), "v", "id", rate_denom=4, group_col="grp"
    )
    key = lambda r: r["grp"]  # noqa: E731
    assert sorted(whole.collect(), key=key) == sorted(merged.collect(), key=key)
    # DKW bound monotone in n: bigger sample -> smaller eps
    small = sample_quantile_sketch(
        df.where("id <= 20"), "v", "id", rate_denom=1, group_col=None
    ).collect()[0]
    big = sample_quantile_sketch(df, "v", "id", rate_denom=1).collect()[0]
    assert big["dkw_eps_ppm"] < small["dkw_eps_ppm"]


def test_url_features_structural_signals(spark):
    from knowledge_graph_etl_spark.extensions.text import url_features

    rows = [
        (1, "https://news.example.org/"),
        (2, "https://a.b.co.uk/sec1/item-42?utm_source=x&id=42"),
        (3, "http://plain.net/a/b/c/d"),
        (4, "https://digits.io/123/456"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_features(df).collect()}
    assert out[1]["is_root"] and out[1]["path_depth"] == 0
    assert out[1]["host"] == "news.example.org" and out[1]["tld"] == "org"
    assert out[2]["n_query_params"] == 2 and out[2]["has_tracking"]
    assert out[2]["tld"] == "uk" and out[2]["path_depth"] == 2
    assert out[3]["path_depth"] == 4 and not out[3]["has_tracking"]
    # '/123/456' -> 6 digits over 8 chars = 750000 ppm
    assert out[4]["path_digit_ppm"] == 750000
    assert not out[4]["is_root"]


def test_url_features_scheme_case_and_empty_params(spark):
    """ADVICE r12 pins: an uppercase-scheme URL must parse like its
    lowercase twin (not degrade to empty host + is_root=true), and
    empty '&'-segments are separators, not parameters."""
    from knowledge_graph_etl_spark.extensions.text import url_features

    rows = [
        (1, "HTTPS://News.example.ORG/a/b?x=1"),
        (2, "git+ssh://host.net/repo"),
        (3, "https://q.example.com/p?a=1&&b=2"),
        (4, "https://q.example.com/p?&&"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_features(df).collect()}
    assert out[1]["host"] == "News.example.ORG"
    assert out[1]["path_depth"] == 2 and not out[1]["is_root"]
    assert out[1]["n_query_params"] == 1
    assert out[2]["host"] == "host.net" and out[2]["path_depth"] == 1
    assert out[3]["n_query_params"] == 2
    assert out[4]["n_query_params"] == 0


def test_subword_fertility_counts(spark):
    from knowledge_graph_etl_spark.extensions.text import subword_fertility

    rows = [
        (1, "a", "plain words here"),          # 3 words, 3 pieces
        (2, "a", "hy-phen and dots..."),       # 3 words, 6 pieces: hy - phen and dots ...
        (3, "b", ""),                          # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in subword_fertility(df).collect()}
    assert out["a"]["n_words"] == 6 and out["a"]["n_pieces"] == 9
    assert out["a"]["fertility_ppm"] == 9 * 1000000 // 6
    assert out["b"]["n_words"] == 0 and out["b"]["fertility_ppm"] == 0


def test_anchor_text_features_signals(spark):
    from knowledge_graph_etl_spark.extensions.text import anchor_text_features

    rows = [
        (1, 9, "click here"),
        (2, 9, "click here"),       # duplicate phrasing
        (3, 9, "great spark guide"),
        (4, 8, ""),                 # empty anchor
    ]
    links = spark.createDataFrame(rows, "src long, dst long, anchor string")
    out = {r["dst"]: r for r in anchor_text_features(links).collect()}
    t9 = out[9]
    assert t9["n_inlinks"] == 3 and t9["n_unique_anchors"] == 2
    # terms: click here click here great spark guide -> 7 total, 5 distinct
    assert t9["n_anchor_terms"] == 7 and t9["n_distinct_terms"] == 5
    assert t9["diversity_ppm"] == 5 * 1000000 // 7
    assert t9["avg_anchor_len_milli"] == (10 + 10 + 17) * 1000 // 3
    t8 = out[8]
    assert t8["n_inlinks"] == 1 and t8["n_anchor_terms"] == 0
    assert t8["diversity_ppm"] == 0


def test_roc_auc_perfect_random_and_degenerate(spark):
    from knowledge_graph_etl_spark.extensions.stats import roc_auc_report

    rows = (
        # slice p: perfect separation -> AUC = 1
        [("p", 1, 100 + i) for i in range(3)]
        + [("p", 0, i) for i in range(3)]
        # slice t: all scores tied -> AUC = 0.5 exactly (midranks)
        + [("t", 1, 7), ("t", 1, 7), ("t", 0, 7), ("t", 0, 7)]
        # slice d: no negatives -> AUC undefined
        + [("d", 1, 1), ("d", 1, 2)]
    )
    df = spark.createDataFrame(rows, "s string, y int, sc long")
    out = {r["slice"]: r for r in roc_auc_report(df, "s", "y", "sc").collect()}
    assert out["p"]["auc_ppm"] == 1_000_000
    assert (out["p"]["n_pos"], out["p"]["n_neg"]) == (3, 3)
    assert out["t"]["auc_ppm"] == 500_000
    assert out["d"]["auc_ppm"] is None


def test_roc_auc_hand_checked_ties(spark):
    from knowledge_graph_etl_spark.extensions.stats import roc_auc_report

    # y:  1    0    1    0   with scores 3, 3, 1, 2
    # pairs (pos, neg): (3,3) tie=0.5, (3,2) win, (1,3) loss, (1,2) loss
    # AUC = (1 + 0.5) / 4 = 0.375
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 0, 3), ("a", 1, 1), ("a", 0, 2)],
        "s string, y int, sc long",
    )
    row = roc_auc_report(df, "s", "y", "sc").collect()[0]
    assert row["auc_ppm"] == 375_000


def test_bpe_merge_candidates_counts_and_rank(spark):
    from knowledge_graph_etl_spark.extensions.text import (
        bpe_merge_candidates,
    )

    df = spark.createDataFrame(
        [("abab cd! AB-ab x",), ("cd cd",)], "t string"
    )
    # words: abab, cd, ab, ab, cd, cd ("x" too short)
    # pairs: ab:4 (abab->ab,ba,ab gives ab x2; ab x2) ba:1 cd:3
    out = {r["pair"]: r for r in bpe_merge_candidates(df, "t").collect()}
    assert out["ab"]["n"] == 4 and out["ab"]["merge_rank"] == 1
    assert out["cd"]["n"] == 3 and out["cd"]["merge_rank"] == 2
    assert out["ba"]["n"] == 1 and out["ba"]["merge_rank"] == 3


def test_bpe_merge_candidates_bounds(spark):
    from knowledge_graph_etl_spark.extensions.text import (
        bpe_merge_candidates,
    )

    long_word = "a" * 40
    df = spark.createDataFrame([(f"{long_word} hi hi",)], "t string")
    out = bpe_merge_candidates(df, "t", top_n=1).collect()
    # the 40-char blob is dropped by max_word_len; top_n caps output
    assert len(out) == 1 and out[0]["pair"] == "hi" and out[0]["n"] == 2


def test_shrunken_domain_quality_shrinks_small_domains(spark):
    from knowledge_graph_etl_spark.extensions.curation import (
        shrunken_domain_quality,
    )

    rows = [("big", 1)] * 50 + [("big", 0)] * 50 + [("tiny", 1)] * 2
    df = spark.createDataFrame(rows, "d string, ok int")
    out = {
        r["domain"]: r
        for r in shrunken_domain_quality(df, "d", "ok", 10).collect()
    }
    # global = 52/102 -> 509803 ppm
    g = 52 * 1_000_000 // 102
    assert out["big"]["raw_ppm"] == 500_000
    assert out["big"]["shrunk_ppm"] == (50 * 1_000_000 + 10 * g) // 110
    # tiny: raw 100% but shrunk far toward the global rate
    assert out["tiny"]["raw_ppm"] == 1_000_000
    assert out["tiny"]["shrunk_ppm"] == (2 * 1_000_000 + 10 * g) // 12
    assert out["tiny"]["shrunk_ppm"] < 700_000


def test_shrunken_domain_quality_validates(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.curation import (
        shrunken_domain_quality,
    )

    df = spark.createDataFrame([("a", 1)], "d string, ok int")
    with _pytest.raises(ValueError, match="prior_strength"):
        shrunken_domain_quality(df, "d", "ok", -1)
    # m=0 degenerates to the raw rate
    row = shrunken_domain_quality(df, "d", "ok", 0).collect()[0]
    assert row["shrunk_ppm"] == row["raw_ppm"] == 1_000_000


def test_template_dedup_groups_by_normalized_form(spark):
    from knowledge_graph_etl_spark.extensions.text import (
        template_dedup_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "Order #123 shipped"),
            (2, "order  #456   SHIPPED"),
            (3, "order #9 shipped"),
            (4, "totally different"),
            (5, "another singleton 77"),
        ],
        "id long, t string",
    )
    out = template_dedup_stats(df, "id", "t").collect()
    # one surviving template: the three order lines; singletons dropped
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["exemplar_id"] == 1
    assert r["share_ppm"] == 3 * 1_000_000 // 5


def test_bleu_corpus_stats_hand_checked(spark):
    from knowledge_graph_etl_spark.extensions.text import bleu_corpus_stats

    # ref: "the cat sat on the mat", cand: "the the cat sat" —
    # unigram clip: the->min(2,2)=2, cat 1, sat 1 => 4/4
    # bigram: "the the"(0) "the cat"(1) "cat sat"(1) => 2/3
    # trigram: "the the cat"(0) "the cat sat"(1) => 1/2; 4-gram 0/1
    df = spark.createDataFrame(
        [(1, ["the", "the", "cat", "sat"], ["the", "cat", "sat", "on", "the", "mat"])],
        "id long, cand array<string>, ref array<string>",
    )
    out = {r["n"]: r for r in bleu_corpus_stats(df, "id", "cand", "ref").collect()}
    assert (out[1]["clipped_matches"], out[1]["cand_ngrams"]) == (4, 4)
    assert out[1]["precision_ppm"] == 1_000_000
    assert (out[2]["clipped_matches"], out[2]["cand_ngrams"]) == (2, 3)
    assert out[2]["precision_ppm"] == 2_000_000 // 3
    assert (out[3]["clipped_matches"], out[3]["cand_ngrams"]) == (1, 2)
    assert (out[4]["clipped_matches"], out[4]["cand_ngrams"]) == (0, 1)
    assert out[1]["cand_len"] == 4 and out[1]["ref_len"] == 6
    assert out[1]["length_ratio_ppm"] == 4_000_000 // 6


def test_bleu_corpus_stats_short_docs_and_spine(spark):
    from knowledge_graph_etl_spark.extensions.text import bleu_corpus_stats

    # every doc shorter than 3 tokens: orders 3,4 must still report 0s
    df = spark.createDataFrame(
        [(1, ["a", "b"], ["a", "b"]), (2, [], ["x"])],
        "id long, cand array<string>, ref array<string>",
    )
    out = {r["n"]: r for r in bleu_corpus_stats(df, "id", "cand", "ref").collect()}
    assert len(out) == 4
    assert out[3]["cand_ngrams"] == 0 and out[3]["clipped_matches"] == 0
    assert out[3]["precision_ppm"] is None
    assert out[1]["clipped_matches"] == 2


def test_fleiss_kappa_perfect_and_chance(spark):
    from knowledge_graph_etl_spark.extensions.stats import fleiss_kappa

    # perfect agreement, 2 raters, 2 items, 2 categories
    rows = [(1, "a"), (1, "a"), (2, "b"), (2, "b")]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r["n_items"], r["n_raters"], r["n_dropped_items"]) == (2, 2, 0)
    assert r["po_ppm"] == 1_000_000
    # pe = (2^2 + 2^2)/16 = 0.5 -> kappa = 1
    assert r["pe_ppm"] == 500_000
    assert r["kappa_micro"] == 1_000_000

    # single category everywhere: pe = 1 -> kappa = 0 (cohen convention)
    df2 = spark.createDataFrame([(1, "a"), (1, "a"), (2, "a"), (2, "a")], "item long, cat string")
    r2 = fleiss_kappa(df2, "item", "cat").collect()[0]
    assert r2["pe_ppm"] == 1_000_000 and r2["kappa_micro"] == 0


def test_fleiss_kappa_drop_and_hand_value(spark):
    from knowledge_graph_etl_spark.extensions.stats import fleiss_kappa

    # 3 raters on items 1,2; item 3 has only 2 ratings -> dropped
    rows = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "b"), (2, "b"), (2, "b"),
        (3, "a"), (3, "a"),
    ]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r["n_items"], r["n_raters"], r["n_dropped_items"]) == (2, 3, 1)
    # A = (2*1 + 0) + (3*2) = 8; po = 8/(2*3*2) = 2/3
    assert r["po_ppm"] == 8 * 1_000_000 // 12
    # t_a=2, t_b=4 over kept; pe = (4+16)/36
    assert r["pe_ppm"] == 20 * 1_000_000 // 36
    # kappa = (po-pe)/(1-pe) with quantized ppm inputs
    import math
    assert r["kappa_micro"] == math.floor(
        (r["po_ppm"] - r["pe_ppm"]) * 1_000_000 / (1_000_000 - r["pe_ppm"])
    )


def test_fleiss_kappa_single_rater_vacuous(spark):
    from knowledge_graph_etl_spark.extensions.stats import fleiss_kappa

    df = spark.createDataFrame([(1, "a"), (2, "b")], "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert r["n_raters"] == 1
    assert r["po_ppm"] is None and r["kappa_micro"] is None


def test_compaction_plan_bands_and_oversized(spark):
    from knowledge_graph_etl_spark.extensions.curation import compaction_plan

    rows = [
        ("d1", 1, 40), ("d1", 2, 40), ("d1", 3, 40),  # 40+40 | 40
        ("d1", 4, 250),  # oversized, lands alone in its band
        ("d2", 1, 10),
    ]
    df = spark.createDataFrame(rows, "dir string, f long, sz long")
    out = {
        (r["group"], r["out_group"]): r
        for r in compaction_plan(df, "dir", "f", "sz", 100).collect()
    }
    # d1: before-sums 0,40,80,120 -> groups 0,0,0,1
    g0 = out[("d1", 0)]
    assert g0["n_files"] == 3 and g0["total_bytes"] == 120
    g1 = out[("d1", 1)]
    assert g1["n_files"] == 1 and g1["total_bytes"] == 250
    assert g1["n_oversized"] == 1 and g0["n_oversized"] == 0
    assert out[("d2", 0)]["n_files"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, "dir", "f", "sz", 0)


def test_rp_project_matches_hashlib_reference(spark):
    import hashlib

    from knowledge_graph_etl_spark.extensions.similarity import rp_project

    vecs = [(7, [0.5, -1.25, 2.0]), (8, [0.0004, 0.0006, -0.0004])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {(r["id"], r["dim"]): r["proj"] for r in rp_project(df, k=2).collect()}

    def sign(i, j):
        return 1 if int(hashlib.md5(f"rp-{i}-{j}".encode()).hexdigest()[0], 16) < 8 else -1

    import math

    import numpy as np

    for vid, v in vecs:
        # the stored column is float32: widen through np.float32 exactly
        q = [math.floor(float(np.float32(x)) * 1000 + 0.5) for x in v]
        for j in range(2):
            exp = sum(q[i] * sign(i, j) for i in range(3))
            assert out[(vid, j)] == exp
    # quantization: 0.0004*1000+0.5 floors to 0 vs 0.0006 -> 1 (float32 widened)
    assert len(out) == 4

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k and scale"):
        rp_project(df, k=0)


def test_vocab_growth_curve_hand_corpus(spark):
    from knowledge_graph_etl_spark.extensions.text import vocab_growth_curve

    # md5-shuffle order of ids 1..4 is fixed; compute expectation from
    # the operator's own contract: cumulative distinct types per cut
    import hashlib

    docs = {1: "aa bb", 2: "bb cc", 3: "aa", 4: "dd ee ff"}
    order = sorted(docs, key=lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {r["fraction_ppm"]: r for r in vocab_growth_curve(
        df, "doc_id", "text", fractions_ppm=(250_000, 500_000, 1_000_000)
    ).collect()}
    seen, toks, expect = set(), 0, {}
    for pos, i in enumerate(order, start=1):
        ws = docs[i].split()
        seen.update(ws)
        toks += len(ws)
        expect[pos] = (len(seen), toks)
    assert (out[250_000]["vocab_size"], out[250_000]["n_tokens"]) == expect[1]
    assert (out[500_000]["vocab_size"], out[500_000]["n_tokens"]) == expect[2]
    assert (out[1_000_000]["vocab_size"], out[1_000_000]["n_tokens"]) == expect[4]
    assert out[1_000_000]["vocab_size"] == 6
    assert out[1_000_000]["ttr_ppm"] == 6 * 1_000_000 // 8
    # nesting: vocab and tokens never decrease with the fraction
    assert out[250_000]["vocab_size"] <= out[500_000]["vocab_size"] <= out[1_000_000]["vocab_size"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="fractions_ppm"):
        vocab_growth_curve(df, "doc_id", "text", fractions_ppm=(0,))


def test_collocation_lift_ordering_and_floor(spark):
    from knowledge_graph_etl_spark.extensions.text import collocation_lift

    # "new york" always adjacent (lift high); "of the" frequent but both
    # words everywhere (lift low); hapax pair filtered by min_count
    rows = [("new york is big",)] * 5 + [("of the of the of x7q",)] * 5 + [
        ("rare pairx",)
    ]
    df = spark.createDataFrame(rows, "t string")
    out = collocation_lift(df, "t", top_n=10, min_count=5).collect()
    pairs = {r["pair"]: r for r in out}
    assert "rare pairx" not in pairs
    assert pairs["new york"]["n_pair"] == 5
    # ranks are 1..n, dense and unique
    ranks = sorted(r["lift_rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    # "new york" outranks "of the"
    assert pairs["new york"]["lift_rank"] < pairs["of the"]["lift_rank"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_n"):
        collocation_lift(df, "t", top_n=0)


def test_script_profile_dominance_and_shares(spark):
    from knowledge_graph_etl_spark.extensions.text import script_profile

    rows = [
        (1, "hello"),               # latin-dominant
        (2, "Привет мир хорошо"),   # cyrillic-dominant
        (3, "12345"),               # digit-dominant
        (4, ""),                    # empty -> other
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r["script"]: r for r in script_profile(df, "id", "t").collect()}
    assert out["latin"]["n_docs_dominant"] == 1
    assert out["cyrillic"]["n_docs_dominant"] == 1
    assert out["digit"]["n_docs_dominant"] == 1
    assert out["other"]["n_docs_dominant"] == 1
    assert out["latin"]["n_chars"] == 5
    assert out["digit"]["n_chars"] == 5
    # cyrillic text: 17 chars total, 2 spaces are 'other'
    assert out["cyrillic"]["n_chars"] == 15
    total = 5 + 17 + 5 + 0
    assert out["latin"]["char_share_ppm"] == 5 * 1_000_000 // total


def test_centroid_drift_hand_and_edges(spark):
    from knowledge_graph_etl_spark.extensions.similarity import centroid_drift

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [3.0, 0.0]), (9, [1.0, 1.0])],
        "label int, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(0, [2.0, 1.0])], "label int, embedding array<float>"
    )
    out = {r["label"]: r for r in centroid_drift(a, b).collect()}
    # label 0: sums A=(4000,0) nA=2; B=(2000,1000) nB=1
    # t = |4000*1-2000*2| + |0*1-1000*2| = 0 + 2000
    r0 = out[0]
    assert (r0["n_a"], r0["n_b"]) == (2, 1)
    assert r0["l1_num"] == 2000
    assert r0["l1_milli"] == 2000 * 1000 // (2 * 1 * 1000)
    # label 9 only in A: NULL distances, counts reported
    r9 = out[9]
    assert (r9["n_a"], r9["n_b"]) == (1, 0)
    assert r9["l1_num"] is None and r9["l1_milli"] is None
    # identical snapshots drift to exactly zero
    same = {r["label"]: r for r in centroid_drift(a, a).collect()}
    assert same[0]["l1_num"] == 0 and same[0]["l1_milli"] == 0


def test_countmin_est_dominates_truth_and_exact_cells(spark):
    from knowledge_graph_etl_spark.extensions.stats import (
        countmin_heavy_hitters,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5 + [("d",)] * 2
    df = spark.createDataFrame(rows, "item string")
    out = {
        r["item"]: r
        for r in countmin_heavy_hitters(
            df, "item", depth=4, width=64, top_n=3
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}  # top_n=3 by true count
    assert out["a"]["true_count"] == 50 and out["a"]["hh_rank"] == 1
    for r in out.values():
        # count-min is one-sided: estimate never undercounts
        assert r["est_count"] >= r["true_count"]
        assert r["overestimate"] == r["est_count"] - r["true_count"]
    # with width >> items, collisions are unlikely but not impossible;
    # a singleton corpus gives exact cells
    one = countmin_heavy_hitters(
        spark.createDataFrame([("x",)] * 7, "item string"), "item",
        depth=2, width=8, top_n=1,
    ).collect()[0]
    assert one["est_count"] == 7 and one["overestimate"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth"):
        countmin_heavy_hitters(df, "item", depth=0)


def test_gram_uniqueness_shared_vs_unique(spark):
    from knowledge_graph_etl_spark.extensions.text import gram_uniqueness

    # docs 1,2 share "aa bb cc"; doc 3 is all-unique; doc 4 too short
    df = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "aa bb cc"),
            (3, "xx yy zz qq"),
            (4, "aa bb"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in gram_uniqueness(df, "doc_id", "text", n=3).collect()}
    assert 4 not in out  # < n words -> no row
    # doc 1 grams: "aa bb cc" (shared with doc 2), "bb cc dd" (unique)
    assert out[1]["n_grams"] == 2 and out[1]["n_unique"] == 1
    assert out[1]["novelty_ppm"] == 500_000
    assert out[2]["n_grams"] == 1 and out[2]["n_unique"] == 0
    assert out[3]["novelty_ppm"] == 1_000_000


def test_sequence_pack_plan_bands_and_overflow(spark):
    from knowledge_graph_etl_spark.extensions.curation import (
        sequence_pack_plan,
    )

    # tokens chosen so bins are deterministic regardless of md5 order:
    # every doc has 60 tokens, context 100 -> before-sums 0,60,120,...
    rows = [(i, 60) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    out = {r["fill_decile"]: r for r in sequence_pack_plan(df, "doc_id", "tok", 100).collect()}
    # before-sums 0,60,120,180 -> bins 0,0,1,1: two 120-token bins,
    # each 120*10//100 = 12 capped to decile 10
    assert out[10]["n_bins"] == 2 and out[10]["n_docs"] == 4
    assert out[10]["n_tokens"] == 240
    # overflow doc counted
    df2 = spark.createDataFrame([(1, 250)], "doc_id long, tok long")
    r2 = sequence_pack_plan(df2, "doc_id", "tok", 100).collect()[0]
    assert r2["n_overflow_docs"] == 1 and r2["fill_decile"] == 10

    import pytest as _pytest

    with _pytest.raises(ValueError, match="context_len"):
        sequence_pack_plan(df, "doc_id", "tok", 0)


def test_rfm_segments_hand_tiled(spark):
    import datetime

    from knowledge_graph_etl_spark.extensions.stats import rfm_segments

    def ts(d):
        return datetime.datetime(2024, 1, d)

    # 4 customers, q=2: c1 two big recent orders, c4 one old tiny order
    rows = [
        (1, ts(20), 100.0), (1, ts(21), 100.0),
        (2, ts(10), 50.0), (2, ts(11), 50.0),
        (3, ts(5), 20.0),
        (4, ts(1), 1.004),
    ]
    df = spark.createDataFrame(rows, "c long, d timestamp, amt double")
    out = {r["segment"]: r for r in rfm_segments(df, "c", "d", "amt", q=2).collect()}
    # ascending ntile(2) over 4 customers: c1/c2 tile 2 on all three
    # metrics -> 222; c3/c4 tile 1 -> 111
    assert out[222]["n_customers"] == 2
    assert out[111]["n_customers"] == 2
    # exact cents: 1.004 quantizes to 100 cents BEFORE summing
    assert out[111]["spend_cents"] == 100 + 2000
    assert out[222]["spend_cents"] == 20000 + 10000
    total = sum(r["n_customers"] for r in out.values())
    assert total == 4

    import pytest as _pytest

    with _pytest.raises(ValueError, match="q must"):
        rfm_segments(df, "c", "d", "amt", q=1)


def test_robots_policy_longest_match_and_ties(spark):
    from knowledge_graph_etl_spark.extensions.html import (
        robots_policy_filter,
    )

    urls = spark.createDataFrame(
        [
            (1, "h1", "/a/b/c"),   # /a disallow, /a/b allow -> allowed
            (2, "h1", "/a/x"),     # /a disallow wins
            (3, "h1", "/zzz"),     # only '/' allow
            (4, "h2", "/a/b"),     # no rules for h2 -> default allow
            (5, "h1", "/t"),       # equal-length tie: allow beats disallow
        ],
        "id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("h1", "/", True),
            ("h1", "/a", False),
            ("h1", "/a/b", True),
            ("h1", "/t", False),
            ("h1", "/t", True),
        ],
        "host string, path_prefix string, allow boolean",
    )
    out = {r["id"]: r for r in robots_policy_filter(urls, rules).collect()}
    assert out[1]["allowed"] is True and out[1]["rule_prefix"] == "/a/b"
    assert out[2]["allowed"] is False and out[2]["rule_prefix"] == "/a"
    assert out[3]["allowed"] is True and out[3]["rule_prefix"] == "/"
    assert out[4]["allowed"] is True and out[4]["rule_prefix"] is None
    assert out[4]["rule_len"] is None
    assert out[5]["allowed"] is True  # tie -> Allow wins
    # passthrough columns intact
    assert set(out[1].asDict()) == {
        "id", "host", "path", "allowed", "rule_prefix", "rule_len"
    }


def test_rake_keywords_hand_scored(spark):
    from knowledge_graph_etl_spark.extensions.text import rake_keywords

    # stopword 'x' bounds phrases; "deep learning" appears 3x,
    # "deep" once alone
    rows = [("deep learning x deep learning",), ("deep learning x deep",)]
    df = spark.createDataFrame(rows, "t string")
    out = {
        r["phrase"]: r
        for r in rake_keywords(
            df, "t", stopwords=["x"], top_n=10, min_occurrences=1
        ).collect()
    }
    # freq(deep)=4, deg(deep)=2+2+2+1=7; freq(learning)=3, deg=6
    # score(deep)=7e6//4=1750000; score(learning)=2000000
    dl = out["deep learning"]
    assert dl["n_occurrences"] == 3 and dl["n_words"] == 2
    assert dl["score_ppm"] == 1_750_000 + 2_000_000
    d = out["deep"]
    assert d["n_occurrences"] == 1 and d["score_ppm"] == 1_750_000
    assert dl["kw_rank"] == 1 and d["kw_rank"] == 2
    # occurrence floor prunes
    pruned = rake_keywords(
        df, "t", stopwords=["x"], top_n=10, min_occurrences=2
    ).collect()
    assert [r["phrase"] for r in pruned] == ["deep learning"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_n"):
        rake_keywords(df, "t", top_n=0)
