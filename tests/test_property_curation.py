"""Property-based tests for the corpus-curation dedup operators: random
small corpora over a tiny vocabulary (forcing heavy n-gram collisions)
checked against structural invariants the DuckDB oracles can't express
as universally (they verify one fixed corpus; these verify the CLASS).

Invariants:
  * substring_span_dedup — coverage accounting is exact: removed-token
    count equals n_tokens - len(cleaned); spans are maximal runs so
    n_spans <= n_dup_tokens // k; cleaned text is a subsequence of the
    tokenization; a corpus with globally unique k-grams loses nothing;
  * dedup_lines — corpus-wide kept-line total equals the number of
    DISTINCT non-empty lines (first occurrence keeps exactly one copy);
  * bloom_decontaminate — never a false negative vs the exact join, at
    any bitmap size.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_etl_spark.extensions.curation import (
    bloom_decontaminate,
    decontaminate,
    dedup_lines,
    substring_span_dedup,
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
_texts = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_corpora = st.lists(_texts, min_size=1, max_size=6)


def _df(spark, corpus):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(corpus)], "doc_id string, text string"
    )


@settings(max_examples=12, deadline=None)
@given(corpus=_corpora)
def test_substring_dedup_accounting(spark, corpus):
    k = 3
    out = substring_span_dedup(_df(spark, corpus), k=k).collect()
    assert len(out) == len(corpus)  # every document survives as a row
    for r in out:
        toks = corpus[int(r["doc_id"])].split()
        assert r["n_tokens"] == len(toks)
        assert 0 <= r["n_dup_tokens"] <= r["n_tokens"]
        assert r["n_spans"] <= (r["n_dup_tokens"] // k if k else 0) or (
            r["n_spans"] == 0 and r["n_dup_tokens"] == 0
        )
        cleaned = r["cleaned_text"].split() if r["cleaned_text"] else []
        assert len(cleaned) == r["n_tokens"] - r["n_dup_tokens"]
        # cleaned is a subsequence of the original tokens
        it = iter(toks)
        assert all(any(t == x for x in it) for t in cleaned)


@settings(max_examples=12, deadline=None)
@given(corpus=_corpora)
def test_dedup_lines_distinct_accounting(spark, corpus):
    # re-chunk into 2-token pseudo-lines so most corpora have >1 line
    docs = _df(spark, corpus)
    from pyspark.sql import functions as F

    from knowledge_graph_etl_spark.extensions.curation import chunk_into_lines

    chunked = docs.select(
        "doc_id", chunk_into_lines(F.col("text"), 2).alias("text")
    )
    out = dedup_lines(chunked).collect()
    distinct_lines = {
        ln
        for t in corpus
        for ln in _chunk(t, 2)
        if ln.strip()
    }
    assert sum(r["n_kept"] for r in out) == len(distinct_lines)
    assert all(0 <= r["n_kept"] <= r["n_lines"] for r in out)


def _chunk(text, width):
    toks = text.split()
    return [
        " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
    ]


@settings(max_examples=10, deadline=None)
@given(corpus=_corpora, bits=st.sampled_from([64, 4096, 1 << 17]))
def test_bloom_never_false_negative(spark, corpus, bits):
    docs = _df(spark, corpus)
    bench = docs.limit(1)
    exact = {r["doc_id"]: r for r in decontaminate(docs, bench, n=2).collect()}
    bloom = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench, n=2, num_bits=bits).collect()
    }
    for d, ex in exact.items():
        assert bloom[d]["n_maybe_hits"] >= ex["n_hits"], (d, bits)
        if ex["contaminated"]:
            assert bloom[d]["contaminated"], (d, bits)


@settings(max_examples=10, deadline=None)
@given(corpus=_corpora)
def test_cdc_chunks_partition_property(spark, corpus):
    """CDC chunks are a PARTITION of each doc's token sequence: per-doc
    chunk token counts sum to the tokenization length, chunk indexes are
    dense from 0, and no chunk exceeds max_tokens."""
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks

    out = cdc_chunks(_df(spark, corpus), mask_bits=2, max_tokens=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(corpus):
        toks = text.split()
        rows = sorted(by_doc.get(str(i), []), key=lambda r: r["chunk_idx"])
        assert sum(r["n_tokens"] for r in rows) == len(toks)
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert all(1 <= r["n_tokens"] <= 5 for r in rows)


@settings(max_examples=10, deadline=None)
@given(corpus=_corpora)
def test_quality_scores_are_corpus_independent(spark, corpus):
    """quality_classifier is a pure per-row map: a document's score must
    not depend on what else is in the corpus (scored alone == scored
    together)."""
    from knowledge_graph_etl_spark.extensions.curation import quality_classifier

    together = {
        r["doc_id"]: (r["n_feats"], r["score_micro"])
        for r in quality_classifier(_df(spark, corpus)).collect()
    }
    alone = {
        r["doc_id"]: (r["n_feats"], r["score_micro"])
        for r in quality_classifier(_df(spark, corpus[:1])).collect()
    }
    assert together["0"] == alone["0"]


# ---------------------------------------------------------------------------
# r07 additions: boolean_search / phrase_search / cdc_chunks_min
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(corpus=_corpora)
def test_boolean_search_matches_python_reference(spark, corpus):
    """boolean_search over random corpora equals the obvious per-doc
    python evaluation of the same queries."""
    from knowledge_graph_etl_spark.extensions.search import boolean_search

    queries = [
        (1, "alpha beta"),
        (2, '"alpha beta"'),
        (3, "gamma OR delta -eps"),
        (4, "-zeta"),
    ]

    def py_match(qid, text):
        toks = text.split()
        ts, jt = set(toks), " " + " ".join(toks) + " "
        if qid == 1:
            return "alpha" in ts and "beta" in ts
        if qid == 2:
            return " alpha beta " in jt
        if qid == 3:
            return ("gamma" in ts or "delta" in ts) and "eps" not in ts
        return "zeta" not in ts

    expect = {
        (q, i)
        for q, _ in queries
        for i, t in enumerate(corpus)
        if py_match(q, t)
    }
    got = {
        (r["qid"], int(r["doc_id"]))
        for r in boolean_search(_df(spark, corpus), queries).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(corpus=_corpora)
def test_phrase_search_matches_python_reference(spark, corpus):
    """phrase_search occurrence counts equal a sliding-window python
    count on every document, including overlapping occurrences."""
    from knowledge_graph_etl_spark.extensions.search import phrase_search

    phrases = [(1, "alpha beta"), (2, "alpha alpha"), (3, "gamma")]

    def py_count(words, text):
        toks = text.split()
        k = len(words)
        return sum(1 for i in range(len(toks) - k + 1) if toks[i : i + k] == words)

    expect = {
        (q, i): py_count(p.split(), t)
        for q, p in phrases
        for i, t in enumerate(corpus)
        if py_count(p.split(), t) > 0
    }
    got = {
        (r["qid"], int(r["doc_id"])): r["n_occurrences"]
        for r in phrase_search(_df(spark, corpus), phrases).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    corpus=_corpora,
    mask_bits=st.integers(min_value=1, max_value=3),
    mn=st.integers(min_value=1, max_value=4),
)
def test_cdc_chunks_min_partition_property(spark, corpus, mask_bits, mn):
    """For any corpus/params: chunks partition each doc's tokens exactly
    (no loss, no overlap), every chunk <= max_tokens, every non-final
    chunk >= min_tokens, indices dense from 0."""
    from knowledge_graph_etl_spark.extensions.curation import cdc_chunks_min

    mx = max(mn, 5)
    rows = cdc_chunks_min(
        _df(spark, corpus), mask_bits=mask_bits, max_tokens=mx, min_tokens=mn
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(corpus):
        toks = text.split()
        chunks = sorted(by_doc.get(str(i), []), key=lambda r: r["chunk_idx"])
        assert sum(c["n_tokens"] for c in chunks) == len(toks)
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert all(c["n_tokens"] <= mx for c in chunks)
        assert all(c["n_tokens"] >= mn for c in chunks[:-1])


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=150.0, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    bins=st.integers(min_value=1, max_value=16),
)
def test_histogram_quantiles_matches_python_reference(spark, vals, bins):
    """Exact mirror of the bin/cumulate/select rule in plain Python,
    including clamping, for arbitrary value sets and bin counts."""
    from knowledge_graph_etl_spark.extensions.stats import histogram_quantiles

    lo, hi = 0.0, 100.0
    fracs = (0.5, 0.9)

    import math
    from collections import Counter

    def bucket(v):
        return max(0, min(bins - 1, math.floor(((v - lo) * bins) / (hi - lo))))

    cnt = Counter(bucket(v) for v in vals)
    n = len(vals)
    width = (hi - lo) / bins

    def quant(f):
        target = math.ceil(f * n)
        cum = 0
        for b in sorted(cnt):
            cum += cnt[b]
            if cum >= target:
                return lo + b * width
        raise AssertionError

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = histogram_quantiles(df, "v", lo=lo, hi=hi, bins=bins, fracs=fracs).collect()[0]
    assert r["n_rows"] == n
    assert r["p0_5"] == quant(0.5) and r["p0_9"] == quant(0.9)


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=40),
    top_k=st.integers(min_value=1, max_value=5),
)
def test_skew_report_matches_python_reference(spark, keys, top_k):
    from collections import Counter

    from knowledge_graph_etl_spark.extensions.skew import skew_report

    cnt = Counter(keys)
    n_rows, n_keys = len(keys), len(cnt)
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(skew_report(df, ["k"], top_k=top_k).collect(), key=lambda r: r["rank"])
    assert [(r["k"], r["key_count"]) for r in got] == order
    for r in got:
        assert r["share_ppm"] == r["key_count"] * 1_000_000 // n_rows
        assert r["skew_ratio_ppm"] == r["key_count"] * n_keys * 1_000_000 // n_rows
        assert r["suggested_salt"] == -((-r["key_count"] * n_keys) // n_rows)
        assert (r["n_keys"], r["n_rows"]) == (n_keys, n_rows)


@settings(max_examples=10, deadline=None)
@given(
    old_texts=st.lists(st.sampled_from(["a", "b", "c", None]), min_size=0, max_size=8),
    new_texts=st.lists(st.sampled_from(["a", "b", "c", None]), min_size=0, max_size=8),
)
def test_snapshot_diff_matches_python_reference(spark, old_texts, new_texts):
    from knowledge_graph_etl_spark.extensions.changelog import snapshot_diff

    schema = "doc_id long, text string"
    old = spark.createDataFrame(list(enumerate(old_texts)), schema)
    new = spark.createDataFrame(list(enumerate(new_texts)), schema)
    o = {i: (t or "") for i, t in enumerate(old_texts)}
    nn = {i: (t or "") for i, t in enumerate(new_texts)}

    def status(i):
        if i not in o:
            return "added"
        if i not in nn:
            return "removed"
        return "unchanged" if o[i] == nn[i] else "changed"

    expect = {i: status(i) for i in set(o) | set(nn)}
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == expect
