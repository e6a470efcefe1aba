"""Tests for the r13 crawl-ingestion front door: HTML boilerplate
removal, outlink host-graph extraction, URL canonicalization + dedup,
the MinHash operating-point tuner, and the per-shard divergence gate."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- HTML


def _page(body: str) -> str:
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


def test_extract_main_text_density_rules(spark):
    from knowledge_graph_etl_spark.extensions.html import extract_main_text

    long_a = "alpha beta gamma delta epsilon zeta eta theta words here"
    long_b = "second content block with plenty of visible characters in it"
    rows = [
        (
            1,
            _page(
                "<header>site chrome</header>"
                "<nav>home about contact</nav>"
                f"<p>{long_a}</p>"
                "<p>tiny</p>"
                f"<div>{long_b}</div>"
                '<p><a href="https://x.net/1">first related article</a> '
                '<a href="https://x.net/2">second related article</a></p>'
                "<aside>subscribe now to the newsletter</aside>"
                "<footer>copyright forever and ever</footer>"
            ),
        ),
        (2, _page("")),  # no blocks at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["doc_id"]: r for r in extract_main_text(df).collect()}
    r1 = out[1]
    # chrome tags, the short block and the link farm all drop; the two
    # content blocks survive in document order
    assert r1["main_text"] == f"{long_a} {long_b}"
    assert r1["n_blocks"] == 8 and r1["n_kept"] == 2
    assert r1["main_len"] == len(long_a) + 1 + len(long_b)
    assert 0 < r1["boilerplate_ppm"] < 1_000_000
    r2 = out[2]
    assert r2["main_text"] == "" and r2["n_blocks"] == 0
    assert r2["boilerplate_ppm"] == 0


def test_extract_main_text_link_density_boundary(spark):
    from knowledge_graph_etl_spark.extensions.html import extract_main_text

    # anchor text is a small share of a long block -> kept despite links
    body = (
        '<p>plenty of ordinary running text around one small '
        '<a href="https://x.net/a">link</a> so the density stays low</p>'
    )
    df = spark.createDataFrame([(1, _page(body))], "doc_id long, html string")
    r = extract_main_text(df).collect()[0]
    assert r["n_kept"] == 1
    assert "ordinary running text" in r["main_text"]
    # tags are stripped from the joined text
    assert "<" not in r["main_text"]


def test_outlink_hostgraph_resolution(spark):
    from knowledge_graph_etl_spark.extensions.html import outlink_hostgraph

    rows = [
        (
            1,
            _page(
                '<p><a href="https://other.net/a">x</a>'
                '<a href="HTTPS://Other.NET:443/b">y</a>'
                '<a href="/relative/path">z</a></p>'
            ),
            "https://src.example.org/page",
        ),
        (
            2,
            _page('<p><a href="https://other.net/a">x</a></p>'),
            "https://src.example.org/another",
        ),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string, url string")
    out = {
        (r["src_host"], r["dst_host"]): r
        for r in outlink_hostgraph(df).collect()
    }
    # uppercase + port variants collapse onto one lowercased host; doc 2
    # repeats doc 1's first href, so distinct target URLs = 2
    e = out[("src.example.org", "other.net")]
    assert e["n_links"] == 3 and e["n_unique_urls"] == 2 and e["n_src_docs"] == 2
    # relative href resolves to the source host
    rel = out[("src.example.org", "src.example.org")]
    assert rel["n_links"] == 1


# ---------------------------------------------------------------- URLs


def test_canonicalize_url_rules(spark):
    from knowledge_graph_etl_spark.extensions.text import canonicalize_url

    cases = [
        ("HTTPS://Shop.Example.COM:443/item/5", "https://shop.example.com/item/5"),
        ("https://shop.example.com/item/5/?utm_source=x", "https://shop.example.com/item/5"),
        ("https://shop.example.com/item/5?b=2&a=1#frag", "https://shop.example.com/item/5?a=1&b=2"),
        ("http://h.net:80/", "http://h.net/"),
        ("http://h.net:8080/p", "http://h.net:8080/p"),
        ("https://h.net", "https://h.net/"),
        ("https://h.net/p?gclid=1&&ref=z", "https://h.net/p"),
        ("not a url", "not a url"),
        ("MAILTO-ish Opaque", "mailto-ish opaque"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, u string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_canonical_url_dedup_keeper_election(spark):
    from knowledge_graph_etl_spark.extensions.dedup import canonical_url_dedup

    rows = [
        (1, "https://a.net/x/?utm_source=f"),
        (2, "HTTPS://A.NET:443/x"),
        (5, "https://a.net/x"),
        (3, "https://a.net/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in canonical_url_dedup(df).collect()}
    assert all(out[i]["canonical_url"] == "https://a.net/x" for i in (1, 2, 5))
    assert out[1]["is_canonical"] and not out[2]["is_canonical"]
    assert out[5]["group_size"] == 3
    assert out[3]["is_canonical"] and out[3]["group_size"] == 1


# --------------------------------------------------------------- tuner


def test_minhash_operating_point_curve_and_rank(spark):
    from knowledge_graph_etl_spark.extensions.dedup import (
        minhash_operating_point,
    )

    # two identical docs (s=1), two disjoint docs: only the identical
    # pair shares tokens -> one pair at s_ppm=1000000, fn=0 at any (b,r)
    rows = [
        (0, "alpha beta gamma delta"),
        (8, "alpha beta gamma delta"),
        (16, "zeta eta theta iota"),
        (24, "kappa lambda mu nu"),
    ]
    # the disjoint docs DO share nothing with the identical pair, but
    # (16, 24) share nothing either -> pairs = {(0,8)} plus none
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_operating_point(
        df, num_hashes=32, target_jaccard_ppm=800_000, sample_mod=8
    ).collect()
    assert len(out) == 6  # divisor pairs of 32
    by_bands = {r["bands"]: r for r in out}
    assert set(by_bands) == {1, 2, 4, 8, 16, 32}
    for r in out:
        assert r["bands"] * r["rows_per_band"] == 32
        # the only pair is an exact duplicate: P(1) = 1 -> fn == fp == 0
        assert r["n_pairs"] == 1 and r["n_pos_pairs"] == 1
        assert r["fp_micro"] == 0 and r["fn_micro"] == 0
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5, 6]


def test_minhash_operating_point_s_curve_values(spark):
    from knowledge_graph_etl_spark.extensions.dedup import (
        minhash_operating_point,
    )

    # one pair with jaccard 1/3 (below target): fp mass = P(1/3) exactly
    rows = [(0, "a b c"), (8, "a x y")]  # inter=1, union=5? no: {a,b,c} vs {a,x,y} -> 1/5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_operating_point(
        df, num_hashes=4, target_jaccard_ppm=800_000, sample_mod=8
    ).collect()
    s = 200_000 / 1_000_000.0  # 1/5 as exact s_ppm/1e6
    for r in out:
        b, rr = r["bands"], r["rows_per_band"]
        acc = 1.0
        for _ in range(rr):
            acc *= s
        q = 1.0 - acc
        qb = 1.0
        for _ in range(b):
            qb *= q
        want = math.floor((1.0 - qb) * 1_000_000.0 + 0.5)
        assert r["fp_micro"] == want, (b, rr, r["fp_micro"], want)
        assert r["fn_micro"] == 0 and r["n_pos_pairs"] == 0


def test_minhash_operating_point_validation(spark):
    from knowledge_graph_etl_spark.extensions.dedup import (
        minhash_operating_point,
    )

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_operating_point(df, num_hashes=0)
    with pytest.raises(ValueError):
        minhash_operating_point(df, target_jaccard_ppm=0)


# ------------------------------------------------------------- shards


def test_shard_psi_report_uniform_vs_planted_drift(spark):
    from knowledge_graph_etl_spark.extensions.stats import shard_psi_report

    n = 4000
    # v = (id div 4) % 100: every shard sees the identical value cycle,
    # so per-bin shares match the corpus exactly and PSI is exactly 0
    base = spark.range(n).select(
        (F.col("id") % 4).alias("shard"),
        ((F.col("id") / 4).cast("bigint") % 100).cast("double").alias("v"),
    )
    out = {r["shard"]: r for r in shard_psi_report(base, "v", "shard").collect()}
    assert set(out) == {0, 1, 2, 3}
    for r in out.values():
        assert r["n_rows"] == n // 4
        assert r["psi_micro"] == 0 and not r["drifted"]

    # plant drift: shard 3 sees a compressed distribution
    drifted = spark.range(n).select(
        (F.col("id") % 4).alias("shard"),
        F.when(
            (F.col("id") % 4) == 3,
            ((F.col("id") / 4).cast("bigint") % 10).cast("double"),
        )
        .otherwise(((F.col("id") / 4).cast("bigint") % 100).cast("double"))
        .alias("v"),
    )
    out2 = {r["shard"]: r for r in shard_psi_report(drifted, "v", "shard").collect()}
    # the drifted shard fires the flag; the clean shards also move away
    # from the CONTAMINATED corpus reference (25% of corpus mass shifts
    # with it — PSI-vs-corpus by design), but far less than the culprit
    assert out2[3]["drifted"] and out2[3]["psi_micro"] > 250_000
    assert out2[3]["psi_micro"] > 3 * out2[0]["psi_micro"]


def test_shard_psi_report_validation(spark):
    from knowledge_graph_etl_spark.extensions.stats import shard_psi_report

    df = spark.createDataFrame([(0, 1.0)], "shard long, v double")
    with pytest.raises(ValueError):
        shard_psi_report(df, "v", "shard", bins=1)
    with pytest.raises(ValueError):
        shard_psi_report(df, "v", "shard", quant_scale=0)


# ---------------------------------------------------------- eval ops


def test_calibration_report_hand_values(spark):
    from knowledge_graph_etl_spark.extensions.stats import calibration_report

    # bin 0: two rows predicted 50000, one positive -> obs 500000
    # bin 9: two rows predicted 950000, both positive -> obs 1000000
    rows = [
        (50_000, True),
        (50_000, False),
        (950_000, True),
        (950_000, True),
    ]
    df = spark.createDataFrame(rows, "score_ppm long, label boolean")
    out = {r["bin_id"]: r for r in calibration_report(df, "score_ppm", "label").collect()}
    assert set(out) == {0, 9}
    assert out[0]["mean_pred_ppm"] == 50_000 and out[0]["obs_pos_ppm"] == 500_000
    assert out[0]["gap_ppm"] == 450_000
    assert out[9]["gap_ppm"] == 50_000
    # ECE = (2*450000 + 2*50000) / 4
    assert out[0]["ece_ppm"] == out[9]["ece_ppm"] == 250_000


def test_calibration_report_score_1e6_lands_in_last_bin(spark):
    from knowledge_graph_etl_spark.extensions.stats import calibration_report

    df = spark.createDataFrame([(1_000_000, True)], "score_ppm long, label boolean")
    out = calibration_report(df, "score_ppm", "label").collect()
    assert len(out) == 1 and out[0]["bin_id"] == 9


def test_cohen_kappa_hand_values(spark):
    from knowledge_graph_etl_spark.extensions.stats import cohen_kappa

    # perfect agreement -> kappa 1e6; random-looking disagreement lower
    rows = [(0, "x", "x"), (0, "y", "y"), (0, "x", "x"), (0, "y", "y")]
    df = spark.createDataFrame(rows, "slice long, a string, b string")
    r = cohen_kappa(df, "a", "b", "slice").collect()[0]
    assert r["po_ppm"] == 1_000_000 and r["kappa_micro"] == 1_000_000

    # single-label degenerate: pe = 1 -> kappa defined as 0
    df2 = spark.createDataFrame([(1, "x", "x"), (1, "x", "x")], "slice long, a string, b string")
    r2 = cohen_kappa(df2, "a", "b", "slice").collect()[0]
    assert r2["pe_ppm"] == 1_000_000 and r2["kappa_micro"] == 0

    # hand case: po = 0.5, marginals a: 2/2, b: 2/2 over {x,y} -> pe = 0.5
    df3 = spark.createDataFrame(
        [(2, "x", "x"), (2, "x", "y"), (2, "y", "x"), (2, "y", "y")],
        "slice long, a string, b string",
    )
    r3 = cohen_kappa(df3, "a", "b", "slice").collect()[0]
    assert r3["po_ppm"] == 500_000 and r3["pe_ppm"] == 500_000
    assert r3["kappa_micro"] == 0


def test_window_chunks_shapes(spark):
    from knowledge_graph_etl_spark.extensions.text import window_chunks

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (2, "one two"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = window_chunks(df, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,3,6,9 -> sizes 4,4,4,1
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["start_tok"] for r in c1] == [0, 3, 6, 9]
    assert [r["n_tokens"] for r in c1] == [4, 4, 4, 1]
    assert c1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c1[-1]["chunk_text"] == "t9"
    # consecutive chunks overlap by size - stride = 1 token
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    assert [r["n_tokens"] for r in by_doc[2]] == [2]
    assert 3 not in by_doc  # empty doc -> no rows

    import pytest as _pytest

    with _pytest.raises(ValueError):
        window_chunks(df, size=0)
    with _pytest.raises(ValueError):
        window_chunks(df, stride=0)


def test_paired_bootstrap_deterministic_and_directional(spark):
    from knowledge_graph_etl_spark.extensions.stats import (
        paired_bootstrap_eval,
    )

    # B strictly better on every doc -> B wins every resample
    rows = [(i, 100_000, 200_000) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, a long, b long")
    r = paired_bootstrap_eval(df, "doc_id", "a", "b", n_boot=50).collect()[0]
    assert r["n_docs"] == 12 and r["n_boot"] == 50
    assert r["b_wins_ppm"] == 1_000_000 and r["a_wins_ppm"] == 0
    assert r["mean_delta_ppm"] == -100_000
    # deterministic: the same call yields the identical row
    r2 = paired_bootstrap_eval(df, "doc_id", "a", "b", n_boot=50).collect()[0]
    assert r.asDict() == r2.asDict()


def test_json_shape_profile_types_and_shares(spark):
    from knowledge_graph_etl_spark.extensions.curation import (
        json_shape_profile,
    )

    rows = [
        (1, '{"a": 1, "b": "x", "c": {"d": true}, "e": [1], "f": null}'),
        (2, '{"a": -2.5e3, "b": "y with \\"quote", "g": false}'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, js string")
    out = {
        (r["key"], r["jtype"]): r
        for r in json_shape_profile(df, "js").collect()
    }
    assert out[("a", "number")]["n"] == 2
    assert out[("a", "number")]["key_share_ppm"] == 1_000_000
    assert out[("b", "string")]["n"] == 2
    assert ("c", "object") in out and ("e", "array") in out
    assert ("d", "bool") in out  # nested keys flattened by name
    assert ("f", "null") in out and ("g", "bool") in out


def test_learning_curve_splits_nested_exact(spark):
    from knowledge_graph_etl_spark.extensions.curation import (
        learning_curve_splits,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("tok")
    )
    out = {
        r["fraction_ppm"]: r
        for r in learning_curve_splits(df, token_col="tok").collect()
    }
    # exact ceil(f*N) sizes, cumulative tokens = 10 * n_docs
    assert [out[f]["n_docs"] for f in (100_000, 200_000, 400_000, 1_000_000)] == [
        10, 20, 40, 100,
    ]
    for f, r in out.items():
        assert r["n_tokens"] == 10 * r["n_docs"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        learning_curve_splits(df, fractions_ppm=(0,))
    with _pytest.raises(ValueError):
        learning_curve_splits(df, fractions_ppm=())


def test_ranking_metrics_hand_values(spark):
    from knowledge_graph_etl_spark.extensions.search import (
        dcg_factors_micro,
        ranking_metrics,
    )

    runs = spark.createDataFrame(
        [(1, "d1", 1), (1, "d2", 2), (1, "d3", 3), (2, "d9", 1)],
        "qid long, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, "d2", 1), (1, "d3", 1), (1, "d7", 1), (2, "zz", 1)],
        "qid long, doc_id string, rel long",
    )
    out = {r["qid"]: r for r in ranking_metrics(runs, qrels, k=3).collect()}
    f = dcg_factors_micro(3)
    r1 = out[1]
    # first relevant at rank 2; 2 of 3 retrieved relevant; 3 relevant total
    assert r1["mrr_micro"] == 500_000
    assert r1["p_at_k_ppm"] == 666_666
    assert r1["n_rel"] == 3
    assert r1["dcg_micro"] == f[1] + f[2]
    assert r1["idcg_micro"] == f[0] + f[1] + f[2]
    assert r1["ndcg_micro"] == (f[1] + f[2]) * 1_000_000 // (f[0] + f[1] + f[2])
    # query 2 retrieved nothing relevant
    r2 = out[2]
    assert r2["mrr_micro"] == 0 and r2["dcg_micro"] == 0
    assert r2["idcg_micro"] == f[0] and r2["ndcg_micro"] == 0
