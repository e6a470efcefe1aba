"""Property-based tests for the r09 session-2 operators: random inputs
checked against structural invariants / reference recomputation — the
CLASS-level verification the fixed-corpus DuckDB oracles can't express.

Invariants:
  * setsim_prefix_pairs — lossless vs the full inverted-index join on
    ANY corpus (same pairs, same Jaccard), at several thresholds;
  * join_view_delta — incremental == full recompute as BAGS for any
    base/delta split, including duplicate keys;
  * markov_transitions — per-src probabilities sum to ~1e6 (integer-div
    remainder < out-degree) and n sums to total transitions;
  * kmv_overlap — exact when union < k for any two sets;
  * rank_normalize — output ppm within [0, 1e6]; monotone with value;
    ties share a value.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["a", "b", "c", "d", "e", "f", "g", "h"]
_texts = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(" ".join)
_corpora = st.lists(_texts, min_size=1, max_size=6)


def _docs(spark, corpus):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )


@settings(max_examples=8, deadline=None)
@given(corpus=_corpora, t=st.sampled_from([0.3, 0.6, 0.9]))
def test_setsim_prefix_lossless_any_corpus(spark, corpus, t):
    from knowledge_graph_etl_spark.extensions.dedup import (
        ngram_jaccard_pairs,
        setsim_prefix_pairs,
    )

    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            _docs(spark, corpus), n=2, threshold=t, max_shingle_freq=None
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in setsim_prefix_pairs(_docs(spark, corpus), n=2, threshold=t).collect()
    }
    assert pref == full


@settings(max_examples=10, deadline=None)
@given(
    keys_a=st.lists(st.integers(0, 5), min_size=0, max_size=8),
    keys_b=st.lists(st.integers(0, 5), min_size=0, max_size=8),
    split=st.integers(0, 8),
)
def test_join_view_delta_property(spark, keys_a, keys_b, split):
    from knowledge_graph_etl_spark.extensions.changelog import join_view_delta

    a = [(k, f"a{i}") for i, k in enumerate(keys_a)]
    b = [(k, f"b{i}") for i, k in enumerate(keys_b)]
    schema_a, schema_b = "k bigint, av string", "k bigint, bv string"
    a_old = spark.createDataFrame(a[:split] or [], schema_a)
    a_new = spark.createDataFrame(a[split:] or [], schema_a)
    b_old = spark.createDataFrame(b[: split // 2] or [], schema_b)
    b_new = spark.createDataFrame(b[split // 2 :] or [], schema_b)
    delta = join_view_delta(a_old, a_new, b_old, b_new, on="k")
    incr = sorted(map(tuple, a_old.join(b_old, "k").unionByName(delta).collect()))
    full = sorted(
        map(
            tuple,
            a_old.unionByName(a_new).join(b_old.unionByName(b_new), "k").collect(),
        )
    )
    assert incr == full


@settings(max_examples=8, deadline=None)
@given(
    seq=st.lists(
        st.tuples(st.integers(1, 3), st.sampled_from(["x", "y", "z"])),
        min_size=0,
        max_size=20,
    )
)
def test_markov_probabilities_property(spark, seq):
    import datetime

    from knowledge_graph_etl_spark.extensions.events import markov_transitions

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (i, u, typ, t0 + datetime.timedelta(minutes=i))
        for i, (u, typ) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = markov_transitions(df).collect()
    n_trans = sum(r["n"] for r in out)
    by_user = {}
    for u, _ in seq:
        by_user[u] = by_user.get(u, 0) + 1
    assert n_trans == sum(max(0, c - 1) for c in by_user.values())
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    for src, rows_ in by_src.items():
        total_ppm = sum(r["p_ppm"] for r in rows_)
        # integer div loses < out-degree ppm
        assert 1_000_000 - len(rows_) < total_ppm <= 1_000_000


@settings(max_examples=8, deadline=None)
@given(
    xs=st.sets(st.integers(0, 40), min_size=1, max_size=15),
    ys=st.sets(st.integers(0, 40), min_size=1, max_size=15),
)
def test_kmv_overlap_exact_under_k_property(spark, xs, ys):
    from knowledge_graph_etl_spark.extensions.stats import kmv_overlap

    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v bigint")
    r = kmv_overlap(df, "g", "v", k=64).collect()[0]
    union, inter = len(xs | ys), len(xs & ys)
    assert r["n_kept"] == union
    assert r["est_union"] == float(union)
    assert r["est_intersect"] == float(inter)


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=20))
def test_rank_normalize_bounds_and_monotone(spark, vals):
    from knowledge_graph_etl_spark.extensions.stats import rank_normalize

    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)],
        "event_id bigint, g string, v double",
    )
    out = rank_normalize(df, "v", group_col="g", id_cols=["event_id"]).collect()
    ppm = {r["event_id"]: r["rank_ppm"] for r in out}
    for r in out:
        assert 0 <= r["rank_ppm"] <= 1_000_000
    for i, vi in enumerate(vals):
        for j, vj in enumerate(vals):
            if vi < vj:
                assert ppm[i] < ppm[j]
            elif vi == vj:
                assert ppm[i] == ppm[j]
