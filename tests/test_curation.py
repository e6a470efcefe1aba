"""Unit tests for the corpus-curation / temporal / quantization operators
(extensions/curation.py, extensions/temporal.py, similarity.quantize_int8).

The oracle gate (tools/check_oracle.py) cross-checks these against DuckDB
on the driver tables; these tests pin the SEMANTICS on hand-built corner
cases the synthetic tables don't exercise.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.curation import (
    assign_shards,
    assign_split,
    chunk_into_lines,
    decontaminate,
    dedup_lines,
    pii_redact,
    repetition_signals,
)
from knowledge_graph_etl_spark.extensions.similarity import quantize_int8
from knowledge_graph_etl_spark.extensions.temporal import asof_join, range_join_events


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# -- repetition --------------------------------------------------------------


def test_repetition_signals_values(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_signals(
            _docs(
                spark,
                [
                    ("rep", "a b a b a b"),   # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
                    ("uniq", "p q r s"),      # all bigrams distinct
                    ("short", "one"),          # no bigrams at all
                    ("empty", ""),
                ],
            )
        ).collect()
    }
    rep = out["rep"]
    assert rep["dup_2gram_frac"] == pytest.approx(3 / 5)
    assert rep["top_2gram_frac"] == pytest.approx(3 / 5)  # 'a b' occurs 3/5
    assert out["uniq"]["dup_2gram_frac"] == 0.0
    # short/empty docs survive with zeros, not dropped rows
    assert out["short"]["dup_2gram_frac"] == 0.0
    assert out["empty"]["top_2gram_frac"] == 0.0


# -- line dedup --------------------------------------------------------------


def test_dedup_lines_first_occurrence_wins(spark):
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            _docs(
                spark,
                [
                    ("a", "common line\nunique to a"),
                    ("b", "common line\nunique to b\ncommon line"),
                    ("c", "common line"),  # loses everything
                ],
            )
        ).collect()
    }
    assert out["a"]["text"] == "common line\nunique to a"  # first occurrence kept
    assert out["b"]["text"] == "unique to b"  # both copies removed (one was dup-in-doc)
    assert out["b"]["n_lines"] == 3 and out["b"]["n_kept"] == 1
    assert out["c"]["text"] == "" and out["c"]["n_kept"] == 0  # doc survives empty


def test_chunk_into_lines_width(spark):
    df = spark.range(1).select(
        chunk_into_lines(F.lit("t1 t2 t3 t4 t5"), tokens_per_line=2).alias("t")
    )
    assert df.collect()[0]["t"] == "t1 t2\nt3 t4\nt5"


# -- decontamination ---------------------------------------------------------


def test_decontaminate_flags_overlap(spark):
    docs = _docs(
        spark,
        [
            ("clean", "totally different words here now"),
            ("dirty", "the quick brown fox jumps high"),
            ("partial", "lazy dog quick brown fox runs"),
        ],
    )
    bench = _docs(spark, [("bench", "the quick brown fox sleeps")])
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert not out["clean"]["contaminated"] and out["clean"]["n_hits"] == 0
    # 'the quick brown' + 'quick brown fox' shared
    assert out["dirty"]["contaminated"] and out["dirty"]["n_hits"] == 2
    assert out["partial"]["n_hits"] == 1  # 'quick brown fox'


# -- PII redaction -----------------------------------------------------------


def test_pii_redact_patterns_and_order(spark):
    out = pii_redact(
        _docs(
            spark,
            [("d", "mail a.b+c@ex-ample.org ip 192.168.0.1 card 4111111111111 end")],
        )
    ).collect()[0]
    assert out["redacted"] == "mail <EMAIL> ip <IP> card <NUM> end"
    assert (out["n_emails"], out["n_ipv4"], out["n_longnums"]) == (1, 1, 1)
    # an IP's digits never double-count as a long number (sequential stages)
    out2 = pii_redact(_docs(spark, [("e", "just 10.200.30.40 here")])).collect()[0]
    assert out2["n_ipv4"] == 1 and out2["n_longnums"] == 0


# -- splits and shards -------------------------------------------------------


def test_assign_split_deterministic_and_proportional(spark):
    d = spark.range(2000).select(F.col("id").cast("string").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = assign_split(d, weights=w).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # stable across invocations (hash, not rand)
    b = assign_split(d, weights=w)
    joined = assign_split(d, weights=w).alias("x").join(
        b.alias("y"), "doc_id"
    ).where(F.col("x.split") != F.col("y.split"))
    assert joined.count() == 0


def test_assign_split_rejects_bad_weights(spark):
    d = spark.range(1).select(F.col("id").cast("string").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(d, weights={"a": 0.5, "b": 0.1})


def test_assign_shards_range(spark):
    d = spark.range(500).select(F.col("id").cast("string").alias("doc_id"))
    shards = assign_shards(d, num_shards=7).select("shard").distinct().collect()
    vals = {r["shard"] for r in shards}
    assert vals == set(range(7))  # 500 ids cover all 7 shards
    with pytest.raises(ValueError, match="num_shards"):
        assign_shards(d, num_shards=0)


# -- as-of join --------------------------------------------------------------


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "l1"), ("u1", 20, "l2"), ("u1", 5, "l0"), ("u2", 50, "l3")],
        "k string, ts long, lbl string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 15, 2.0), ("u3", 1, 9.0)],
        "k string, ts long, v double",
    )
    out = {
        r["lbl"]: r
        for r in asof_join(left, right, by="k", ts_col="ts").collect()
    }
    assert out["l1"]["asof_v"] == 1.0  # equal ts matches (inclusive)
    assert out["l1"]["asof_ts"] == 10
    assert out["l2"]["asof_v"] == 2.0  # latest prior, not first
    assert out["l0"]["asof_v"] is None  # nothing at or before ts=5
    assert out["l3"]["asof_v"] is None  # no right rows for u2 at all
    assert len(out) == 4  # left join: every left row survives


# -- range join --------------------------------------------------------------


def test_range_join_events_boundaries(spark):
    events = spark.createDataFrame(
        [(1, 100), (2, 199), (3, 200), (4, 350), (5, 99)],
        "event_id long, ts long",
    )
    intervals = spark.createDataFrame(
        [("w1", 100, 200), ("w2", 200, 300)],
        "win string, start long, stop long",
    )
    out = range_join_events(
        events, intervals, "ts", "start", "stop", bucket_width=50
    ).select("event_id", "win").collect()
    got = {(r["event_id"], r["win"]) for r in out}
    # start inclusive, end exclusive; 350 and 99 match nothing
    assert got == {(1, "w1"), (2, "w1"), (3, "w2")}


# -- quantization ------------------------------------------------------------


def test_quantize_int8_bounds(spark):
    df = spark.createDataFrame(
        [("v1", [1.0, -0.5, 0.25, 0.0]), ("zero", [0.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    full = quantize_int8(df).collect()
    out = {r["vec_id"]: r for r in full}
    v = out["v1"]
    assert v["qvec"] == [127, -63, 32, 0]  # max|x| -> ±127, half-up rounding
    assert v["scale"] == pytest.approx(127.0)
    assert v["max_abs_err"] <= 0.5 / 127.0 + 1e-9  # error bound of the scheme
    z = out["zero"]
    assert z["scale"] == 0.0 and z["qvec"] == [0, 0] and z["max_abs_err"] == 0.0


# -- stratified sampling -----------------------------------------------------


def test_sample_per_group_quota_and_determinism(spark):
    from knowledge_graph_etl_spark.extensions.curation import sample_per_group

    rows = [(f"d{i}", "en" if i % 3 else "nl") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = sample_per_group(df, "lang", n=10)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 10, "nl": 10}
    # deterministic: same draw on re-run
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in sample_per_group(df, "lang", n=10).collect()}
    assert a == b
    # different salt -> (almost surely) different draw
    c = {tuple(r) for r in sample_per_group(df, "lang", n=10, salt="v2").collect()}
    assert {t[0] for t in a} != {t[0] for t in c}
    with pytest.raises(ValueError, match="n must be"):
        sample_per_group(df, "lang", n=0)


# -- pagerank ----------------------------------------------------------------


def test_pagerank_star_graph(spark):
    from knowledge_graph_etl_spark.extensions.graph import MICRO, pagerank

    # 3 leaves -> 1 center; center has no out-edges (dangling)
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], "src string, dst string"
    )
    out = {r["node"]: r["rank_micro"] for r in pagerank(edges, iters=2).collect()}
    assert set(out) == {"a", "b", "c", "x"}
    base = 150_000
    # leaves: no in-edges -> base rank after every round
    assert out["a"] == out["b"] == out["c"] == base
    # center after round 2: base + 0.85 * (3 * base) (leaves' round-1 rank)
    expect = base + (850_000 * (3 * base)) // MICRO
    assert out["x"] == expect


def test_pagerank_validates_iters(spark):
    from knowledge_graph_etl_spark.extensions.graph import pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iters"):
        pagerank(edges, iters=0)


# -- sharded corpus sink ------------------------------------------------------


def test_write_sharded_corpus_layout(spark, tmp_path):
    import os

    from knowledge_graph_etl_spark.extensions.curation import (
        assign_shards,
        write_sharded_corpus,
    )

    docs = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    out = str(tmp_path / "shards")
    write_sharded_corpus(docs, out, num_shards=4)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    # one data file per shard directory (co-located write, no fragmenting)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    back = spark.read.parquet(out)
    assert back.count() == 300
    # round-trip preserves the deterministic assignment
    expect = assign_shards(docs, num_shards=4)
    mism = back.alias("a").join(expect.alias("b"), "doc_id").where(
        F.col("a.shard") != F.col("b.shard")
    )
    assert mism.count() == 0


# -- review-fix regressions ---------------------------------------------------


def test_asof_join_carries_whole_row_with_null_fields(spark):
    """A legitimately-NULL value on the LATEST right row must be carried
    as NULL — not replaced by a stale older value (whole-row semantics)."""
    left = spark.createDataFrame([("k", 3)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, None)], "k string, ts long, price double"
    )
    out = asof_join(left, right, by="k", ts_col="ts").collect()[0]
    assert out["asof_ts"] == 2
    assert out["asof_price"] is None  # NOT 10.0 from the ts=1 row


def test_group_quantiles_ignore_nulls(spark):
    from knowledge_graph_etl_spark.extensions.stats import group_quantiles

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", None), ("b", 5.0)],
        "g string, v double",
    )
    out = {r["g"]: r for r in group_quantiles(df, "g", "v").collect()}
    assert out["a"]["n_rows"] == 3 and out["a"]["p0_5"] == 2.0
    assert out["b"]["p0_5"] == 5.0  # the NULL no longer occupies rank 1


def test_range_join_skips_degenerate_intervals(spark):
    events = spark.createDataFrame([(1, 100)], "event_id long, ts long")
    intervals = spark.createDataFrame(
        [("bad", 1_000_000, 0), ("ok", 50, 150)],
        "win string, start long, stop long",
    )
    out = range_join_events(
        events, intervals, "ts", "start", "stop", bucket_width=100
    ).collect()
    # the inverted interval neither explodes nor matches; the valid one does
    assert [(r["event_id"], r["win"]) for r in out] == [(1, "ok")]


def test_pagerank_hub_no_overflow(spark):
    """A hub with many in-neighbors must keep a positive rank (the naive
    d*contrib product would wrap bigint on large graphs; the split form
    is exact at any scale — verified here by value on a small star)."""
    from knowledge_graph_etl_spark.extensions.graph import pagerank

    edges = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(1000)], "src string, dst string"
    )
    out = {r["node"]: r["rank_micro"] for r in pagerank(edges, iters=1).collect()}
    # 1000 leaves at initial rank 1e6, out-degree 1 -> contrib = 1e9;
    # rank = base + d*(c//M) + (d*(c%M))//M = 150000 + 850000*1000 + 0
    assert out["hub"] == 150_000 + 850_000 * 1000
    assert all(v > 0 for v in out.values())


# -- overlapping chunking -----------------------------------------------------


def test_chunk_overlapping_windows(spark):
    from knowledge_graph_etl_spark.extensions.curation import chunk_overlapping

    docs = _docs(spark, [("d", "t1 t2 t3 t4 t5"), ("empty", "")])
    out = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_overlapping(docs, chunk_tokens=3, stride=2).collect()
    )
    assert out == [
        (0, "t1 t2 t3", 3),
        (1, "t3 t4 t5", 3),
        (2, "t5", 1),  # partial tail kept
    ]
    with pytest.raises(ValueError, match="stride"):
        chunk_overlapping(docs, chunk_tokens=2, stride=3)


# -- Gopher quality rules -----------------------------------------------------


def test_gopher_quality_flags(spark):
    from knowledge_graph_etl_spark.extensions.curation import gopher_quality_flags

    good = "the quick brown fox jumps over that lazy dog and runs away with joy"
    bullets = "- one\n- two\n- three"
    symbols = "the ### and #### that ## have ## with # ## # #"
    short = "too short"
    nonalpha = "the 111 222 333 444 555 666 777 888 999 000 101 and that"
    docs = spark.createDataFrame(
        [
            ("good", good),
            ("bullets", bullets),
            ("symbols", symbols),
            ("short", short),
            ("nonalpha", nonalpha),
            ("empty", ""),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(docs, min_words=5, min_stopword_hits=2).collect()
    }
    assert out["good"]["keep"] is True
    assert out["good"]["n_words"] == 14
    assert out["good"]["stop_hits"] >= 4
    # every line is a bullet -> bullet_frac 1.0 > 0.9
    assert out["bullets"]["bullet_frac"] == 1.0 and out["bullets"]["keep"] is False
    # symbol-to-word ratio way past 0.1
    assert out["symbols"]["symbol_ratio"] > 0.1
    assert out["symbols"]["keep"] is False
    assert out["short"]["keep"] is False  # n_words < min_words
    # alphabetic-word fraction: 2 of 13 words alphabetic
    assert out["nonalpha"]["alpha_frac"] < 0.8
    assert out["nonalpha"]["keep"] is False
    assert out["empty"]["n_words"] == 0 and out["empty"]["keep"] is False


def test_gopher_ellipsis_lines_and_mean_len(spark):
    from knowledge_graph_etl_spark.extensions.curation import gopher_quality_flags

    ell = "the start of it...\nand more of that...\nhave it end with..."
    tiny_words = "a b c d e f g h i j k l m n o p the of"
    docs = spark.createDataFrame(
        [("ell", ell), ("tiny", tiny_words)], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(docs, min_words=3, min_stopword_hits=1).collect()
    }
    assert out["ell"]["ellipsis_line_frac"] == 1.0 and out["ell"]["keep"] is False
    # mean word length ~1.2 < 3.0
    assert out["tiny"]["mean_word_len"] < 3.0 and out["tiny"]["keep"] is False


# -- mixture sampling ---------------------------------------------------------


def test_mixture_sample_weights(spark):
    from knowledge_graph_etl_spark.extensions.curation import mixture_sample

    docs = spark.createDataFrame(
        [(str(i), "a" if i < 200 else "b") for i in range(400)],
        "doc_id string, source string",
    )
    out = mixture_sample(docs, {"a": 2.0, "b": 0.5}).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    # integer weight: EVERY doc exactly doubled, copy_idx 0 and 1
    assert len(by_dom["a"]) == 400
    assert {r["copy_idx"] for r in by_dom["a"]} == {0, 1}
    # fractional weight: ~half kept (hash draw), single copies
    assert 60 <= len(by_dom["b"]) <= 140
    assert all(r["copy_idx"] == 0 for r in by_dom["b"])
    # deterministic: same output both runs
    again = mixture_sample(docs, {"a": 2.0, "b": 0.5}).collect()
    key = lambda rows: sorted((r["doc_id"], r["copy_idx"]) for r in rows)
    assert key(out) == key(again)


def test_mixture_sample_default_and_validation(spark):
    import pytest as _pytest

    from knowledge_graph_etl_spark.extensions.curation import mixture_sample

    docs = spark.createDataFrame(
        [("1", "x"), ("2", "y")], "doc_id string, source string"
    )
    # unlisted domain keeps default weight 1.0 (all docs, one copy)
    out = mixture_sample(docs, {"x": 1.0}).collect()
    assert sorted(r["doc_id"] for r in out) == ["1", "2"]
    with _pytest.raises(ValueError, match="negative"):
        mixture_sample(docs, {"x": -0.5})


# -- unigram LM quality proxy --------------------------------------------------


def test_unigram_logprob_score(spark):
    import math

    from knowledge_graph_etl_spark.extensions.curation import unigram_logprob_score

    # corpus: 'common' appears 6x, 'rare' 1x, 'mid' 2x -> total 9 tokens
    docs = _docs(
        spark,
        [
            ("a", "common common common mid"),
            ("b", "common common common mid rare"),
            ("empty", ""),
        ],
    )
    out = {r["doc_id"]: r for r in unigram_logprob_score(docs).collect()}
    assert "empty" not in out  # no tokens, no score
    q = lambda p: math.floor(-math.log2(p) * 1e6 + 0.5)
    exp_a = 3 * q(6 / 9) + q(2 / 9)
    exp_b = 3 * q(6 / 9) + q(2 / 9) + q(1 / 9)
    assert out["a"]["nll_q"] == exp_a and out["a"]["n_tokens"] == 4
    assert out["b"]["nll_q"] == exp_b and out["b"]["n_tokens"] == 5
    # the doc containing the rare token is more surprising on average
    assert out["b"]["avg_nll"] > out["a"]["avg_nll"]
    assert out["a"]["avg_nll"] == round(exp_a / 4 / 1e6, 6)


# -- training-order shuffle ----------------------------------------------------


def test_training_order_matches_global_sort(spark):
    import hashlib

    from knowledge_graph_etl_spark.extensions.curation import training_order

    docs = spark.createDataFrame(
        [(str(i),) for i in range(200)], "doc_id string"
    )
    out = {r["doc_id"]: r["shuffle_rank"] for r in
           training_order(docs, salt="e1", partitions=7).collect()}
    # oracle: the naive global permutation position
    key = lambda d: (hashlib.md5(f"{d}:e1".encode()).hexdigest(), d)
    expect = {d: i + 1 for i, d in enumerate(sorted(out, key=key))}
    assert out == expect
    assert sorted(out.values()) == list(range(1, 201))  # dense 1..N
    # different salt -> different permutation; same salt -> identical
    out2 = {r["doc_id"]: r["shuffle_rank"] for r in
            training_order(docs, salt="e2", partitions=7).collect()}
    assert out2 != out
    again = {r["doc_id"]: r["shuffle_rank"] for r in
             training_order(docs, salt="e1", partitions=7).collect()}
    assert again == out


def test_training_order_partition_count_invariant(spark):
    """The permutation must not depend on where the range partitioner cuts:
    any partition count (including 1 and more-partitions-than-rows skew)
    yields the identical dense 1..N ranking. Also exercises the pinned
    (localCheckpoint) two-pass path: counts collect and final select must
    see the SAME partitioning."""
    from knowledge_graph_etl_spark.extensions.curation import training_order

    docs = spark.createDataFrame(
        [(str(i),) for i in range(157)], "doc_id string"
    )
    base = {r["doc_id"]: r["shuffle_rank"] for r in
            training_order(docs, salt="e1", partitions=5).collect()}
    assert sorted(base.values()) == list(range(1, 158))
    for parts in (1, 3, 32, 200):
        got = {r["doc_id"]: r["shuffle_rank"] for r in
               training_order(docs, salt="e1", partitions=parts).collect()}
        assert got == base, parts


# -- substring-span dedup -----------------------------------------------------


def test_substring_span_dedup_semantics(spark):
    """k=3 hand corpus: a 5-token phrase shared by two docs is removed from
    BOTH (order-independent all-copies variant); unique text survives;
    within-doc repeats are caught; spans merge maximally."""
    from knowledge_graph_etl_spark.extensions.curation import substring_span_dedup

    shared = "alpha beta gamma delta epsilon"  # 5 tokens, every 3-gram dup'd
    out = {
        r["doc_id"]: r
        for r in substring_span_dedup(
            _docs(
                spark,
                [
                    ("a", f"{shared} unique1 unique2 unique3"),
                    ("b", f"intro1 intro2 {shared} tail1"),
                    ("c", "totally distinct words nothing repeats here"),
                    ("d", "loop one two loop one two loop one two"),  # self-repeat
                ],
            ),
            k=3,
        ).collect()
    }
    # the shared phrase vanishes from BOTH docs; surrounding text survives
    assert out["a"]["cleaned_text"] == "unique1 unique2 unique3"
    assert out["a"]["n_dup_tokens"] == 5 and out["a"]["n_spans"] == 1
    assert out["b"]["cleaned_text"] == "intro1 intro2 tail1"
    # untouched doc: zero spans, full text (lowercased tokens) kept
    assert out["c"]["n_dup_tokens"] == 0 and out["c"]["n_spans"] == 0
    assert out["c"]["cleaned_text"] == "totally distinct words nothing repeats here"
    assert out["c"]["dup_token_frac"] == 0.0
    # within-document repetition: "loop one two" 3-gram repeats, the whole
    # 9-token body is one merged span -> empty survivor
    assert out["d"]["n_dup_tokens"] == 9 and out["d"]["n_spans"] == 1
    assert out["d"]["cleaned_text"] == "" and out["d"]["dup_token_frac"] == 1.0


def test_substring_span_dedup_span_merge_and_threshold(spark):
    from knowledge_graph_etl_spark.extensions.curation import substring_span_dedup

    # two separate duplicated regions in one doc -> two spans, not one
    dup1, dup2 = "red green blue", "cyan magenta yellow"
    out = {
        r["doc_id"]: r
        for r in substring_span_dedup(
            _docs(
                spark,
                [
                    ("x", f"{dup1} gap1 gap2 gap3 {dup2}"),
                    ("y", f"{dup1} other words entirely {dup2}"),
                ],
            ),
            k=3,
        ).collect()
    }
    assert out["x"]["n_spans"] == 2 and out["x"]["n_dup_tokens"] == 6
    assert out["x"]["cleaned_text"] == "gap1 gap2 gap3"
    # min_occurrences above the actual count -> nothing removed
    full = substring_span_dedup(
        _docs(spark, [("x", f"{dup1} a b c"), ("y", f"{dup1} d e f")]),
        k=3,
        min_occurrences=3,
    ).collect()
    assert all(r["n_dup_tokens"] == 0 for r in full)


# -- bigram LM scoring --------------------------------------------------------


def test_bigram_logprob_score_matches_python_reference(spark):
    """Exact mirror of the interpolated bigram model in pure Python on a
    hand corpus — verifies counts, interpolation, first-token unigram
    fallback, and the 1e-6 quantization."""
    import math

    from knowledge_graph_etl_spark.extensions.curation import bigram_logprob_score

    corpus = {"a": "x y", "b": "x y", "c": "x z", "d": "q"}
    out = {
        r["doc_id"]: r
        for r in bigram_logprob_score(_docs(spark, list(corpus.items()))).collect()
    }

    toks = {d: t.split() for d, t in corpus.items()}
    uni: dict = {}
    big: dict = {}
    prevc: dict = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for p_, c_ in zip(t, t[1:]):
            big[(p_, c_)] = big.get((p_, c_), 0) + 1
            prevc[p_] = prevc.get(p_, 0) + 1
    tt = sum(uni.values())

    def q(p):
        return math.floor(-math.log2(p) * 1e6 + 0.5)

    for d, t in toks.items():
        expect = q(uni[t[0]] / tt)
        for p_, c_ in zip(t, t[1:]):
            expect += q(0.7 * big[(p_, c_)] / prevc[p_] + 0.3 * uni[c_] / tt)
        assert out[d]["nll_q"] == expect, d
        assert out[d]["n_tokens"] == len(t), d
        assert out[d]["avg_nll"] == round(expect / len(t) / 1e6, 6), d
    # identical docs score identically; the rarer continuation is more
    # surprising
    assert out["a"]["nll_q"] == out["b"]["nll_q"]
    assert out["c"]["avg_nll"] > out["a"]["avg_nll"]


# -- bloom decontamination ----------------------------------------------------


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom guarantee: NO false negatives — every exact hit is a bloom
    hit; with a generously sized bitmap on a tiny corpus the two agree
    exactly."""
    from knowledge_graph_etl_spark.extensions.curation import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = _docs(
        spark,
        [
            ("clean", "totally different words here now"),
            ("dirty", "the quick brown fox jumps high"),
            ("partial", "lazy dog quick brown fox runs"),
        ],
    )
    bench = _docs(spark, [("bench", "the quick brown fox sleeps")])
    exact = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    bloom = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench, n=3, num_bits=1 << 17).collect()
    }
    for d in exact:
        assert bloom[d]["n_maybe_hits"] >= exact[d]["n_hits"], d
        if exact[d]["contaminated"]:
            assert bloom[d]["contaminated"], d
    # ample bits, 10 bench grams: collisions essentially impossible
    assert {d: r["n_maybe_hits"] for d, r in bloom.items()} == {
        d: r["n_hits"] for d, r in exact.items()
    }
    # no-false-negative holds at ANY filter size, even a pathological one
    tiny = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench, n=3, num_bits=32).collect()
    }
    for d in exact:
        if exact[d]["contaminated"]:
            assert tiny[d]["contaminated"], d


# -- count-min sketch heavy hitters -------------------------------------------


def test_cms_ngram_topk_overestimates_never_under(spark):
    """CMS one-sided error: every estimate >= the exact count; with an
    ample sketch on a tiny corpus the top-k matches the exact top-k."""
    from knowledge_graph_etl_spark.extensions.curation import (
        cms_ngram_topk,
        corpus_ngram_topk,
    )

    rows = [(i, "the quick brown fox " + f"filler{i} pad{i}") for i in range(30)]
    rows += [(100 + i, f"rare one two three unique{i}") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        r["gram"]: r["n_occurrences"]
        for r in corpus_ngram_topk(docs, n=3, k=100).collect()
    }
    est = {
        r["gram"]: r["est_count"]
        for r in cms_ngram_topk(
            docs, n=3, k=100, width=1 << 14, candidate_mod=1
        ).collect()
    }
    # candidate_mod=1 -> every gram is a candidate; ample width -> exact
    assert est == exact
    # undersized sketch: estimates may inflate but NEVER undercount
    crowded = {
        r["gram"]: r["est_count"]
        for r in cms_ngram_topk(docs, n=3, k=100, width=8, candidate_mod=1).collect()
    }
    for gram, c in exact.items():
        assert crowded[gram] >= c, gram


# -- triangle counting --------------------------------------------------------


def test_triangle_count_known_graph(spark):
    """Hand graph: K4 on {1,2,3,4} (4 triangles, 3 per vertex) plus a
    pendant vertex 5 and an isolated edge 6-7; duplicate, reversed, and
    self-loop input edges must not change counts."""
    from knowledge_graph_etl_spark.extensions.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (6, 7)]
    edges += [(b, a) for a, b in k4]  # reversed duplicates
    edges += [(1, 2), (3, 3)]  # duplicate + self-loop
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}


def test_triangle_count_total_matches_naive(spark):
    """Random-ish deterministic graph: total triangle count (sum/3) must
    equal the naive all-triple check."""
    from itertools import combinations

    from knowledge_graph_etl_spark.extensions.graph import triangle_count

    edges = [(i, (i * i + 1) % 23) for i in range(23)] + [
        (i, (i + 7) % 23) for i in range(23)
    ]
    eset = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in eset for v in e}
    naive = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if {(a, b), (a, c), (b, c)} <= eset
    )
    df = spark.createDataFrame(list(eset), "src long, dst long")
    out = triangle_count(df).agg(F.sum("n_triangles")).collect()[0][0]
    assert out == naive * 3


# -- personalized PageRank ----------------------------------------------------


def test_personalized_pagerank_seed_proximity(spark):
    """Chain a->b->c->d with seed {a}: mass decays along the chain; nodes
    unreachable from the seed get rank 0; uniform PageRank unchanged."""
    from knowledge_graph_etl_spark.extensions.graph import MICRO, pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, iters=10, restart=seeds).collect()
    }
    # seed holds the restart mass; downstream decays monotonically
    assert out["a"] == MICRO - 850000  # no in-edges: base only
    assert out["b"] > out["c"] > out["d"] > 0
    # disconnected from the seed set: zero (no restart, no inflow)
    assert out["x"] == 0 and out["y"] == 0
    # classic PageRank still gives every node the uniform base
    uni = {r["node"]: r["rank_micro"] for r in pagerank(edges, iters=10).collect()}
    assert all(v >= 150000 for v in uni.values())


# -- label propagation --------------------------------------------------------


def test_label_propagation_matches_python_reference(spark):
    """Exact mirror of the deterministic sync-LPA rounds in pure Python on
    two triangles joined by one bridge, plus an isolated self-loop node."""
    from knowledge_graph_etl_spark.extensions.graph import label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (9, 9)]
    iters = 4

    sym = {(a, b) for a, b in edges if a != b}
    sym |= {(b, a) for a, b in sym}
    nodes = sorted({v for e in edges for v in e})
    labels = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            votes: dict = {}
            for a, b in sym:
                if b == v:
                    lbl = labels[a]
                    votes[lbl] = votes.get(lbl, 0) + 1
            if votes:
                new[v] = min(votes, key=lambda l: (-votes[l], l))
            else:
                new[v] = v  # isolated keeps its own label
        labels = new

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == labels
    assert got[9] == 9  # self-loop-only vertex: isolated, keeps itself


# -- corpus datasheet ---------------------------------------------------------


def test_corpus_report_values(spark):
    from knowledge_graph_etl_spark.extensions.curation import corpus_report

    docs = spark.createDataFrame(
        [
            ("a", "the cat sat", "web", "en"),
            ("b", "dog runs!", "web", "en"),
            ("c", "", "web", "en"),
            ("d", "une seule ligne ici", "books", "fr"),
        ],
        "doc_id string, text string, source string, lang string",
    )
    out = {
        (r["source"], r["lang"]): r for r in corpus_report(docs).collect()
    }
    web = out[("web", "en")]
    assert web["n_docs"] == 3 and web["total_tokens"] == 5 and web["n_empty"] == 1
    assert web["avg_tokens"] == round(5 / 3, 2)
    # 'the' is the only stopword hit: ratios (1/3 + 0 + 0)/3, quantized
    import math

    q = math.floor((1 / 3) * 1e6 + 0.5)
    assert web["avg_stopword_ratio"] == round(q / 3 / 1e6, 6)
    # punctuation: '!' in 9-char doc b only
    qp = math.floor((1 / 9) * 1e6 + 0.5)
    assert web["avg_punct_ratio"] == round(qp / 3 / 1e6, 6)
    assert out[("books", "fr")]["n_docs"] == 1


def test_kcore_known_graph(spark):
    """Triangle + pendant chain: 2-core is exactly the triangle; the chain
    peels away over two rounds (cascade: removing e exposes d)."""
    from knowledge_graph_etl_spark.extensions.graph import kcore

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    rows = {r["node"]: r["core_degree"] for r in kcore(edges, k=2).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_and_full(spark):
    from knowledge_graph_etl_spark.extensions.graph import kcore

    # k=1 keeps every non-isolated vertex of the cleaned graph
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "c")], "src string, dst string"
    )
    rows = {r["node"]: r["core_degree"] for r in kcore(edges, k=1).collect()}
    assert rows == {"a": 1, "b": 1}  # self-loop-only vertex c peeled with edge
    # k larger than any degree -> empty core
    assert kcore(edges, k=5).count() == 0


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_kcore_oracle_unroll_covers_peeling_depth(spark, sf_dir):
    """The driver oracle unrolls KCORE_ORACLE_ROUNDS peeling rounds;
    assert the Spark side reaches its fixed point within that many rounds
    on the query graph at BOTH sf0.001 and sf0.01 — the latter is the SF
    the driver's oracle gate actually compares at (converging under
    max_iter=rounds proves depth <= rounds, since kcore raises past
    max_iter)."""
    from knowledge_graph_etl_spark.extensions.graph import kcore

    from __spark_entry__ import KCORE_ORACLE_ROUNDS

    ps = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    e = ps.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    out = kcore(e, k=3, max_iter=KCORE_ORACLE_ROUNDS)
    degs = out.agg(F.min("core_degree")).collect()[0][0]
    assert degs is None or degs >= 3


def test_betweenness_path_graph(spark):
    """Path a-b-c-d, max_depth=2: b lies on the single shortest path of
    pairs (a,c); c on (b,d). Each unordered pair contributes MICRO
    (sigma ratio 1/1), halved from the two directions -> 1_000_000."""
    from knowledge_graph_etl_spark.extensions.graph import betweenness

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    rows = {r["node"]: r["bet_micro"] for r in betweenness(edges).collect()}
    assert rows == {"a": 0, "b": 1_000_000, "c": 1_000_000, "d": 0}


def test_betweenness_multiple_shortest_paths(spark):
    """4-cycle a-b-c-d-a: pair (a,c) has TWO shortest paths (via b and d),
    so b and d each get 1/2 per direction -> MICRO/2 per pair-direction
    summed and halved = 500_000. Symmetric for pair (b,d)."""
    from knowledge_graph_etl_spark.extensions.graph import betweenness

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    rows = {r["node"]: r["bet_micro"] for r in betweenness(edges).collect()}
    assert rows == {"a": 500_000, "b": 500_000, "c": 500_000, "d": 500_000}


def test_betweenness_depth3_chain(spark):
    """max_depth=3 on a path a-b-c-d: the (a,d) pair (distance 3) now
    counts, crediting BOTH b and c: delta accumulates through the chain
    ((1+delta_downstream) Brandes recurrence)."""
    from knowledge_graph_etl_spark.extensions.graph import betweenness

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    rows = {
        r["node"]: r["bet_micro"]
        for r in betweenness(edges, max_depth=3).collect()
    }
    # b: pairs (a,c) dist2 + (a,d) dist3 -> 2 * MICRO; symmetric for c
    assert rows == {"a": 0, "b": 2_000_000, "c": 2_000_000, "d": 0}


def test_betweenness_sampled_sources(spark):
    """Brandes–Pich sampling: restricting sources counts only pairs whose
    walk STARTS at a sampled source (no halving symmetry assumed -> the
    raw div-2 halves single-direction contributions)."""
    from knowledge_graph_etl_spark.extensions.graph import betweenness

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    srcs = spark.createDataFrame([("a",)], "node string")
    rows = {
        r["node"]: r["bet_micro"]
        for r in betweenness(edges, sources=srcs).collect()
    }
    # only source a: pair (a,c) credits b once -> MICRO div 2
    assert rows == {"a": 0, "b": 500_000, "c": 0}


def test_prefix_duplicate_pairs(spark):
    from knowledge_graph_etl_spark.extensions.dedup import prefix_duplicate_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # 1 prefix of 2
            (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (4, "totally different words here now ok"),
            (5, "alpha beta gamma delta other tail words"),  # shares anchor, not prefix
            (6, "short text"),  # below anchor_tokens -> excluded
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["relation"]
        for r in prefix_duplicate_pairs(docs, anchor_tokens=5).collect()
    }
    assert out == {(1, 2): "prefix", (3, 2): "prefix", (1, 3): "exact"}


def test_corpus_dedup_keep_flags(spark):
    from knowledge_graph_etl_spark.extensions.dedup import corpus_dedup

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (10, text),
            (11, text),  # exact dup -> cluster with 10
            (12, "completely unrelated content about spark and parquet files"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in corpus_dedup(docs, threshold=0.9).collect()}
    assert rows[10]["is_kept"] and rows[10]["cluster_rep"] == 10
    assert not rows[11]["is_kept"] and rows[11]["cluster_rep"] == 10
    assert rows[12]["is_kept"] and rows[12]["cluster_size"] == 1


def test_contamination_report_values(spark):
    from knowledge_graph_etl_spark.extensions.curation import contamination_report

    docs = spark.createDataFrame(
        [
            (1, "one two three four five", "web"),
            (2, "one two three different tail", "web"),  # shares 3-gram w/ bench
            (3, "nothing in common at all", "web"),
            (4, "books only corpus entry here", "books"),
        ],
        "doc_id bigint, text string, source string",
    )
    bench = docs.where(F.col("doc_id") == 1)
    out = {
        r["source"]: r
        for r in contamination_report(docs, bench, n=3).collect()
    }
    web = out["web"]
    assert web["n_docs"] == 3 and web["n_contaminated"] == 2  # docs 1 and 2
    assert web["rate_ppm"] == (1_000_000 * 2) // 3
    assert out["books"]["n_contaminated"] == 0 and out["books"]["rate_ppm"] == 0


def test_select_token_budget(spark):
    from knowledge_graph_etl_spark.extensions.curation import select_token_budget

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(20)],
        "doc_id bigint, text string",
    )
    total = sum(i + 1 for i in range(20))
    # full budget selects everything; cum of the order's last row == total
    all_sel = select_token_budget(docs, total, partitions=4)
    assert all_sel.count() == 20
    assert all_sel.agg(F.max("cum_tokens")).collect()[0][0] == total
    # cum_tokens is a proper running sum in the md5 order: sorted cums
    # equal the prefix sums of n_tokens in that order
    rows = sorted(all_sel.collect(), key=lambda r: r["cum_tokens"])
    acc = 0
    for r in rows:
        acc += r["n_tokens"]
        assert r["cum_tokens"] == acc
    # half budget: maximal prefix, inclusive semantics
    half = select_token_budget(docs, total // 2, partitions=4)
    hr = sorted(half.collect(), key=lambda r: r["cum_tokens"])
    assert hr and hr[-1]["cum_tokens"] <= total // 2
    assert [r["doc_id"] for r in hr] == [r["doc_id"] for r in rows[: len(hr)]]
    # the NEXT doc in order would have crossed the budget
    nxt = rows[len(hr)]
    assert hr[-1]["cum_tokens"] + nxt["n_tokens"] > total // 2
    assert select_token_budget(docs, 0, partitions=4).count() == 0


def test_select_token_budget_partition_invariant(spark):
    from knowledge_graph_etl_spark.extensions.curation import select_token_budget

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * (i % 7 + 1))) for i in range(100)],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, select_token_budget(docs, 200, partitions=3).collect()))
    b = sorted(map(tuple, select_token_budget(docs, 200, partitions=17).collect()))
    assert a == b  # partition count affects balance, never the output


def test_curriculum_order(spark):
    from knowledge_graph_etl_spark.extensions.curation import curriculum_order

    docs = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(40)],
        "doc_id bigint, score double",
    )
    out = curriculum_order(docs, "score", n_stages=4, partitions=3).collect()
    assert len(out) == 40
    by_id = {r["doc_id"]: r for r in out}
    # equal-size stages
    from collections import Counter

    sizes = Counter(r["stage"] for r in out)
    assert sizes == {0: 10, 1: 10, 2: 10, 3: 10}
    # curriculum_rank is a permutation ordered by stage
    ranks = sorted(r["curriculum_rank"] for r in out)
    assert ranks == list(range(40))
    ordered = sorted(out, key=lambda r: r["curriculum_rank"])
    stages = [r["stage"] for r in ordered]
    assert stages == sorted(stages)  # all of stage s before stage s+1
    # low scores land in low stages (rank-based bucketing on score)
    for r in out:
        if r["stage"] == 0:
            assert by_id[r["doc_id"]] is r
            assert docs.where(F.col("doc_id") == r["doc_id"]).collect()[0][
                "score"
            ] <= 4.0


def test_blocklist_filter_word_mode(spark):
    from knowledge_graph_etl_spark.extensions.curation import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a perfectly Clean document here"),
            (2, "contains the BADWORD in the middle"),
            (3, "badword badword twice but one distinct hit"),
            (4, "has badword and also verboten term"),
            (5, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["blocked"])
        for r in blocklist_filter(docs, ["BadWord", "verboten"]).collect()
    }
    assert out[1] == (0, False)
    assert out[2] == (1, True)
    assert out[3] == (1, True)  # distinct terms, not occurrences
    assert out[4] == (2, True)
    assert out[5] == (0, False)


def test_blocklist_filter_phrase_mode(spark):
    import pytest

    from knowledge_graph_etl_spark.extensions.curation import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "the forbidden phrase appears right here"),
            (2, "forbidden words but not the phrase together"),
            (3, "single banned token and the forbidden phrase"),
        ],
        "doc_id bigint, text string",
    )
    terms = ["forbidden phrase", "banned"]
    out = {
        r["doc_id"]: r["n_hits"]
        for r in blocklist_filter(docs, terms, mode="phrase").collect()
    }
    assert out == {1: 1, 2: 0, 3: 2}
    with pytest.raises(ValueError):
        blocklist_filter(docs, [], mode="phrase")
    with pytest.raises(ValueError):
        blocklist_filter(docs, ["x"], mode="regex")


def test_histogram_quantiles_accuracy_and_clamp(spark):
    """Quantiles land on bin lower edges within one bin width of the
    exact answer; out-of-range values clamp to edge bins; NULLs drop."""
    from knowledge_graph_etl_spark.extensions.stats import histogram_quantiles

    vals = [float(i) for i in range(100)]  # 0..99 uniform
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(None,), (-5.0,), (1000.0,)], ["v"]
    )
    r = histogram_quantiles(
        df, "v", lo=0.0, hi=100.0, bins=100, fracs=(0.5, 0.99)
    ).collect()[0]
    assert r["n_rows"] == 102  # clamped rows count, NULL does not
    # with bin width 1.0 the p50 edge is within 1.0 of the exact median
    assert abs(r["p0_5"] - 50.0) <= 1.0
    assert abs(r["p0_99"] - 99.0) <= 2.0  # clamped 1000.0 sits in top bin
    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=1.0, hi=1.0)
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=0.0, hi=1.0, bins=0)
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=0.0, hi=1.0, fracs=())


def test_histogram_quantiles_single_bin_and_groups(spark):
    from knowledge_graph_etl_spark.extensions.stats import histogram_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0)], ["g", "v"]
    )
    out = {
        r["g"]: r
        for r in histogram_quantiles(
            df, "v", lo=0.0, hi=10.0, bins=1, fracs=(0.5,), group_col="g"
        ).collect()
    }
    # one bin: every quantile is the lower bound
    assert out["a"]["p0_5"] == 0.0 and out["a"]["n_rows"] == 2
    assert out["b"]["p0_5"] == 0.0 and out["b"]["n_rows"] == 1


def test_skew_report_stats_and_tiebreak(spark):
    from knowledge_graph_etl_spark.extensions.skew import skew_report

    # key 1: 6 rows, keys 2 and 3: 2 rows each, key 4: 2 rows -> 12 rows, 4 keys
    rows = [(1,)] * 6 + [(2,)] * 2 + [(3,)] * 2 + [(4,)] * 2
    df = spark.createDataFrame(rows, ["k"])
    out = sorted(skew_report(df, ["k"], top_k=3).collect(), key=lambda r: r["rank"])
    assert [r["k"] for r in out] == [1, 2, 3]  # ties break on key asc
    top = out[0]
    assert top["key_count"] == 6 and top["n_rows"] == 12 and top["n_keys"] == 4
    assert top["share_ppm"] == 6 * 1_000_000 // 12
    assert top["skew_ratio_ppm"] == 6 * 4 * 1_000_000 // 12  # 2x the mean
    assert top["suggested_salt"] == 2
    assert out[1]["skew_ratio_ppm"] == 2 * 4 * 1_000_000 // 12
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew_report(df, [])
    with _pytest.raises(ValueError):
        skew_report(df, ["k"], top_k=0)


def test_curation_manifest_reasons_and_precedence(spark):
    """Hand-built corpus hitting every reason; precedence is
    blocklist > exact_dup > quality > gopher > kept."""
    from knowledge_graph_etl_spark.extensions.curation import curation_manifest

    good = ("the data and that with have be to of word " * 3).strip()  # passes gopher (relaxed)
    rows = [
        (1, good),                      # kept
        (2, good),                      # exact dup of 1
        (3, "bad bad bad"),             # blocklist (3 distinct? no...) -> see terms below
        (4, "tiny"),                    # gopher fail (word count), maybe quality too
        (5, ""),                        # quality fail (empty -> worst score)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in curation_manifest(
            df,
            terms=["bad"],
            blocklist_min_hits=1,
            quality_threshold_micro=-999_999,  # only empty docs (-1e6) fail
            gopher_kwargs={"min_words": 5, "min_stopword_hits": 1},
        ).collect()
    }
    assert out[1]["reason"] == "kept" and out[1]["keep"]
    assert out[2]["reason"] == "exact_dup" and out[2]["dup_of"] == 1
    assert out[3]["reason"] == "blocklist" and out[3]["n_blocklist_hits"] == 1
    assert out[4]["reason"] == "gopher" and not out[4]["gopher_pass"]
    assert out[5]["reason"] == "quality" and out[5]["score_micro"] == -1_000_000
    assert all(not out[i]["keep"] for i in (2, 3, 4, 5))
    assert all(out[i]["dup_of"] == -1 for i in (1, 3, 4, 5))
    # precedence: a blocked doc that is ALSO a dup reports blocklist
    df2 = spark.createDataFrame([(1, "bad x"), (2, "bad x")], ["doc_id", "text"])
    out2 = {
        r["doc_id"]: r["reason"]
        for r in curation_manifest(df2, terms=["bad"], blocklist_min_hits=1).collect()
    }
    assert out2[2] == "blocklist"
    # no terms -> blocklist signal inert
    out3 = curation_manifest(df, terms=None).collect()
    assert all(r["n_blocklist_hits"] == 0 for r in out3)


def test_curation_manifest_null_text_gets_a_row(spark):
    """Review-pinned: NULL-text documents keep their manifest row
    (normalized to '' — they group as dups of each other / fail quality)."""
    from knowledge_graph_etl_spark.extensions.curation import curation_manifest

    df = spark.createDataFrame(
        [(1, "the data and that with"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation_manifest(df, terms=None).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3]["reason"] == "exact_dup" and out[3]["dup_of"] == 2
    assert not out[2]["quality_pass"]


def test_stratified_exact_split_quotas(spark):
    """Every stratum hits its exact floor quotas; assignment is
    deterministic; bad weights rejected."""
    from knowledge_graph_etl_spark.extensions.curation import stratified_exact_split

    rows = [(i, "a" if i < 100 else "b") for i in range(130)]  # strata 100 + 30
    df = spark.createDataFrame(rows, "doc_id long, g string")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_exact_split(df, "g", weights=w).collect()
    from collections import Counter

    by = Counter((r["g"], r["split"]) for r in out)
    assert by[("a", "train")] == 80 and by[("a", "val")] == 10 and by[("a", "test")] == 10
    # stratum b: floor(.8*30)=24 train, floor(.9*30)=27 -> 3 val, 3 test
    assert by[("b", "train")] == 24 and by[("b", "val")] == 3 and by[("b", "test")] == 3
    # deterministic across invocations
    a1 = {r["doc_id"]: r["split"] for r in out}
    a2 = {
        r["doc_id"]: r["split"]
        for r in stratified_exact_split(df, "g", weights=w).collect()
    }
    assert a1 == a2
    # ranks are a permutation of 1..n within each stratum
    ranks_a = sorted(r["stratum_rank"] for r in out if r["g"] == "a")
    assert ranks_a == list(range(1, 101))
    with pytest.raises(ValueError, match="sum to 1"):
        stratified_exact_split(df, "g", weights={"x": 0.5})


def test_contamination_drift_rates_and_sides(spark):
    """Hand-checked drift: source A's rate rises 500000→1000000 ppm,
    source B exists only in the old snapshot (absent side coalesced to
    0), source C only in the new one (rising from nothing)."""
    from knowledge_graph_etl_spark.extensions.curation import contamination_drift

    old = spark.createDataFrame(
        [
            (1, "alpha beta secret eval gamma", "A"),
            (2, "plain text nothing here", "A"),
            (3, "other words entirely", "B"),
        ],
        ["doc_id", "text", "source"],
    )
    new = spark.createDataFrame(
        [
            (11, "secret eval question inside", "A"),
            (12, "eval question also here", "A"),
            (31, "secret eval now in c", "C"),
        ],
        ["doc_id", "text", "source"],
    )
    bench = spark.createDataFrame(
        [(100, "secret eval question")], ["doc_id", "text"]
    )
    rows = {
        r["source"]: r
        for r in contamination_drift(old, new, bench, n=2).collect()
    }
    a, b, c = rows["A"], rows["B"], rows["C"]
    assert (a["old_n_docs"], a["new_n_docs"]) == (2, 2)
    assert (a["old_rate_ppm"], a["new_rate_ppm"]) == (500000, 1000000)
    assert a["delta_ppm"] == 500000 and a["rising"]
    assert (b["old_n_docs"], b["new_n_docs"]) == (1, 0)
    assert (b["old_rate_ppm"], b["new_rate_ppm"], b["delta_ppm"]) == (0, 0, 0)
    assert not b["rising"]
    assert (c["old_n_docs"], c["new_n_docs"]) == (0, 1)
    assert c["new_rate_ppm"] == 1000000 and c["delta_ppm"] == 1000000
    assert c["rising"]


def test_exact_softweight_counts_and_canonical(spark):
    """Hand-checked soft dedup: triplicate group weights 333333 ppm each,
    the min-id copy is canonical, unique docs keep full weight, NULL
    text groups with '' text."""
    from knowledge_graph_etl_spark.extensions.dedup import exact_softweight

    docs = spark.createDataFrame(
        [(1, "same"), (5, "same"), (3, "same"), (2, "solo"), (4, None), (6, "")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_copies"], r["weight_ppm"], r["is_canonical"])
        for r in exact_softweight(docs).collect()
    }
    assert got[1] == (3, 333333, True)
    assert got[3] == (3, 333333, False) and got[5] == (3, 333333, False)
    assert got[2] == (1, 1000000, True)
    # NULL and '' hash identically -> one group of 2, min id 4 canonical
    assert got[4] == (2, 500000, True) and got[6] == (2, 500000, False)
    # group mass ~1e6 per content group
    assert sum(w for _, w, _ in got.values()) == 333333 * 3 + 1000000 + 500000 * 2


def test_perplexity_buckets_exact_terciles(spark):
    """Hand-built corpus: within each source the rank terciles cut at
    exact integer boundaries, bucket 0 holds the most fluent (lowest
    surprisal) docs, untokenizable docs are excluded, and n_buckets=1
    degenerates to a single bucket."""
    import pytest
    from pyspark.sql import functions as F

    from knowledge_graph_etl_spark.extensions.curation import (
        perplexity_buckets,
    )

    # source A: 6 docs — 'common common' repeated tokens are maximally
    # predictable under the corpus unigram LM; rare tokens are not
    rows = [
        (1, "common common common common", "A"),
        (2, "common common common rare1", "A"),
        (3, "common common rare2 rare3", "A"),
        (4, "common rare4 rare5 rare6", "A"),
        (5, "rare7 rare8 rare9 rareA", "A"),
        (6, "rareB rareC rareD rareE", "A"),
        (7, "common common", "B"),
        (8, "rareF rareG", "B"),
        (9, "   ", "B"),  # untokenizable: excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r["doc_id"]: r for r in perplexity_buckets(docs, n_buckets=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}  # doc 9 unscoreable
    # source A: 6 docs -> buckets (rank-1)*3 div 6 = 0,0,1,1,2,2 in
    # ascending surprisal order, which here follows doc_id order
    assert [out[i]["bucket"] for i in range(1, 7)] == [0, 0, 1, 1, 2, 2]
    assert out[1]["slice_rank"] == 1 and out[1]["slice_n"] == 6
    assert out[1]["avg_q"] < out[6]["avg_q"]
    # source B: 2 docs into 3 buckets -> ranks 1,2 -> buckets 0,1
    assert out[7]["bucket"] == 0 and out[8]["bucket"] == 1
    single = perplexity_buckets(docs, n_buckets=1)
    assert {r["bucket"] for r in single.collect()} == {0}
    with pytest.raises(ValueError):
        perplexity_buckets(docs, n_buckets=0)


def test_domain_frequency_cap_respects_cap_and_order(spark):
    """No domain exceeds the token cap; documents admit in the
    reproducible md5 order (a rerun yields the identical kept set);
    cap=0 keeps nothing; a domain entirely under the cap keeps all."""
    from knowledge_graph_etl_spark.extensions.curation import (
        domain_frequency_cap,
    )

    rows = [
        (i, "big" if i < 40 else "small", "tok " * 5)  # 5 tokens each
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = domain_frequency_cap(df, cap_tokens=50)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    # big: 40 docs x 5 tokens = 200 > 50 -> exactly 10 kept (cum 50)
    assert len(by_src["big"]) == 10
    assert max(r["cum_tokens"] for r in by_src["big"]) == 50
    # small: 10 docs x 5 = 50 <= 50 -> all kept
    assert len(by_src["small"]) == 10
    # deterministic: identical kept set on rerun
    again = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in domain_frequency_cap(df, cap_tokens=50).collect()
    )
    assert again == sorted((r["doc_id"], r["cum_tokens"]) for r in got)
    assert domain_frequency_cap(df, cap_tokens=0).count() == 0


def test_cross_snapshot_neardup_classifies_recycled_content(spark):
    """A doc re-added byte-identical under a NEW id is caught (est 1.0,
    not genuinely new); an edited doc matches its old self; a truly
    novel doc is genuinely new; unchanged docs don't appear."""
    from knowledge_graph_etl_spark.extensions.dedup import (
        cross_snapshot_neardup,
    )

    mk = lambda i, t: (i, t)  # noqa: E731
    base_text = "alpha beta gamma delta epsilon zeta eta theta"
    old = spark.createDataFrame(
        [
            mk(1, base_text),
            mk(2, "one two three four five six seven eight"),
            mk(3, "spark scale shuffle partition broadcast join agg scan"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            mk(1, base_text),                      # unchanged
            mk(2, "one two three four five six seven eight nine"),  # changed
            mk(3, "spark scale shuffle partition broadcast join agg scan"),
            mk(10, base_text),                     # re-added copy of 1
            mk(11, "totally novel words nowhere else written here xyzzy"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in cross_snapshot_neardup(
            old, new, threshold=0.5, bands=8, num_hashes=32
        ).collect()
    }
    assert set(out) == {2, 10, 11}
    assert out[10]["status"] == "added" and not out[10]["genuinely_new"]
    assert out[10]["dup_of"] == 1 and out[10]["est_jaccard"] == 1.0
    assert out[2]["status"] == "changed" and not out[2]["genuinely_new"]
    assert out[2]["dup_of"] == 2
    assert out[11]["status"] == "added" and out[11]["genuinely_new"]
