"""HTML crawl-ingestion front door: boilerplate removal and outlink
extraction over raw-HTML columns.

The reference pipeline ingests pre-extracted text (its WET-style JSON
feed — reference load_knowledge_graph.py feeds parsed fields straight
to SPARQL); at 100 TB the actual crawl input is raw WARC HTML, so the
front door needs (1) main-content extraction that strips nav/footer
chrome and link farms (the trafilatura/jusText text-density family) and
(2) anchor extraction into the host link graph a crawler's frontier and
reputation scoring run on. Both are pure column expressions — regexp +
list algebra, whole-stage codegen, zero shuffle for extraction and one
map-side-combinable aggregate for the host graph — so at 100 TB they
are scan-bound map passes.

Determinism contract (the repo-wide oracle rule): every output is
integer/string arithmetic over regexp matches that RE2 (DuckDB) and
java.util.regex (Spark) resolve identically — no backreferences, no
lookaround, lazy quantifiers only (supported by both). Block pairing is
by tag-name alternation, not backreference, so NESTED same-family block
tags pair open-to-first-close; the documented contract is flat block
structure (the wild-HTML nesting case belongs to a real parser UDF —
see multimodal.py's stub-the-codec pattern for how the repo gates
library-dependent paths).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: block-level tags considered content candidates, and the subset whose
#: content is page chrome regardless of density (jusText's "bad" tags)
BLOCK_TAGS = ("p", "div", "li", "h1", "h2", "h3", "nav", "footer", "header", "aside")
BOILERPLATE_TAGS = ("nav", "footer", "header", "aside")

_TAG_ALT = "|".join(BLOCK_TAGS)
#: one flat block element: `<tag ...>` through the first `</tag-family>`
#: close — no backreference (RE2 has none), `(?s)` so minified multi-line
#: HTML still matches
BLOCK_RE = rf"(?s)<(?:{_TAG_ALT})(?: [^>]*)?>.*?</(?:{_TAG_ALT})>"
#: anchor inner text (for link density) and href target (for outlinks)
ANCHOR_TEXT_RE = r"(?s)<a (?:[^>]*)>([^<]*)</a>"
HREF_RE = r"""<a [^>]*href="([^"]*)\""""


def _inner_text(block: Column) -> Column:
    """Tag-stripped, whitespace-normalized text of one block."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(block, F.lit(r"<[^>]*>"), F.lit(" ")),
            F.lit(r"\s+"),
            F.lit(" "),
        )
    )


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_text_len: int = 25,
    max_link_density_ppm: int = 500_000,
) -> DataFrame:
    """Boilerplate removal by per-block text density — the crawl step
    between "fetched bytes" and "document text". Splits the page into
    flat block elements, drops (a) chrome tags (nav/footer/header/
    aside), (b) blocks shorter than ``min_text_len`` visible chars, and
    (c) link farms whose anchor-text share of the visible text exceeds
    ``max_link_density_ppm`` (jusText's link-density rule, exact integer
    ppm), then rejoins the survivors in document order. One row per
    input row:

    * ``main_text`` — space-joined surviving block texts;
    * ``n_blocks`` / ``n_kept`` — block counts before/after;
    * ``main_len`` — ``length(main_text)``;
    * ``boilerplate_ppm`` — dropped visible chars per total visible
      char (exact integer division).

    Scale shape: a pure projection (regexp_extract_all + list algebra,
    all whole-stage codegen) — no shuffle, no UDF, no data exchange of
    any kind; at 100 TB this is a map-only scan that column-prunes to
    the HTML column. Entity unescape and full nesting support are out
    of scope of the density pass (real-parser territory; see module
    docstring)."""
    html = F.col(html_col)
    # group 0 = whole match: Spark's regexp_extract_all DEFAULTS to
    # group 1 and BLOCK_RE deliberately has no capturing groups
    blocks = F.regexp_extract_all(html, F.lit(BLOCK_RE), F.lit(0))

    def _struct(b: Column) -> Column:
        inner = _inner_text(b)
        text_len = F.length(inner).cast("bigint")
        link_len = F.aggregate(
            F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), F.lit(1)),
            F.lit(0),
            lambda acc, t: acc + F.length(F.trim(t)),
        ).cast("bigint")
        # floor of the double division, not bare integer ops: the
        # url_features convention — lengths are tiny relative to the
        # 2^53 double-exact range and |a/b - n| >= 1/b >> 1 ulp, so
        # floor(double div) == exact integer div on both engines
        link_ppm = F.floor(
            link_len.cast("double")
            * 1000000.0
            / F.greatest(text_len, F.lit(1)).cast("double")
        ).cast("bigint")
        return F.struct(
            F.regexp_extract(b, r"^<([a-z0-9]+)", 1).alias("tag"),
            inner.alias("inner"),
            text_len.alias("text_len"),
            link_ppm.alias("link_ppm"),
        )

    bs = F.transform(blocks, _struct)
    kept = F.filter(
        bs,
        lambda s: (~s["tag"].isin(*BOILERPLATE_TAGS))
        & (s["text_len"] >= F.lit(min_text_len))
        & (s["link_ppm"] <= F.lit(max_link_density_ppm)),
    )
    total_len = F.aggregate(
        bs, F.lit(0).cast("bigint"), lambda acc, s: acc + s["text_len"]
    )
    kept_len = F.aggregate(
        kept, F.lit(0).cast("bigint"), lambda acc, s: acc + s["text_len"]
    )
    main_text = F.array_join(F.transform(kept, lambda s: s["inner"]), " ")
    return df.select(
        F.col(id_col),
        main_text.alias("main_text"),
        F.size(bs).cast("bigint").alias("n_blocks"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.length(main_text).cast("bigint").alias("main_len"),
        F.floor(
            (total_len - kept_len).cast("double")
            * 1000000.0
            / F.greatest(total_len, F.lit(1)).cast("double")
        )
        .cast("bigint")
        .alias("boilerplate_ppm"),
    )


def outlink_hostgraph(
    df: DataFrame,
    html_col: str = "html",
    src_url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Outlink extraction into the host-level link graph: pull every
    ``<a href>`` target out of the HTML, resolve source and target
    hosts (lowercased; scheme-relative and path-relative hrefs resolve
    to the SOURCE host, the crawler convention), and aggregate one edge
    row per ``(src_host, dst_host)``:

    * ``n_links`` — total anchors;
    * ``n_unique_urls`` — distinct target URLs;
    * ``n_src_docs`` — distinct linking documents.

    This is the frontier/reputation input table: PageRank, source
    reputation and anchor aggregation (text.anchor_text_features) all
    key on it. Scale shape: regexp projection → explode → ONE hash
    aggregate on (src_host, dst_host) with map-side partial combine;
    host keys are low-cardinality relative to links, so the single
    exchange carries pre-combined partials. No UDF, no driver
    collection."""
    # host captured WITHOUT the port ([^/:?#]): the link graph keys on
    # registrable hosts, and :80 vs bare would split one host in two
    scheme = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
    src_host = F.lower(F.regexp_extract(F.col(src_url_col), scheme + r"([^/:?#]+)", 1))
    links = df.select(
        F.col(id_col),
        src_host.alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
        ).alias("href"),
    )
    abs_host = F.lower(F.regexp_extract(F.col("href"), scheme + r"([^/:?#]+)", 1))
    dst_host = F.when(abs_host != "", abs_host).otherwise(F.col("src_host"))
    return (
        links.select(
            F.col(id_col),
            "src_host",
            dst_host.alias("dst_host"),
            F.col("href"),
        )
        .where(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_links"),
            F.countDistinct("href").cast("bigint").alias("n_unique_urls"),
            F.countDistinct(id_col).cast("bigint").alias("n_src_docs"),
        )
    )


def robots_policy_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    rule_host_col: str = "host",
    rule_path_col: str = "path_prefix",
    allow_col: str = "allow",
) -> DataFrame:
    """robots.txt policy evaluation — the crawl-front-door admission
    join: each URL against its host's rule set under the longest-match
    rule (the REP / RFC 9309 resolution: the most specific matching
    path prefix wins; on equal length, Allow beats Disallow; no
    matching rule ⇒ allowed). Input ``rules`` rows are pre-parsed
    ``(host, path_prefix, allow)`` — parsing robots.txt text is an
    ingest step; POLICY RESOLUTION is the part that must run as a join
    against billions of URLs, and is what this operator distributes.
    Output: the URL rows plus ``(allowed, rule_prefix, rule_len)``
    where ``rule_prefix`` is the winning rule (NULL when no rule
    matched).

    Scale shape: ONE host-keyed equi-join (rule sets are per-host and
    small — broadcast when the rule table fits, AQE decides), prefix
    match filtered IN the join, then one URL-keyed max-struct
    aggregate picks the winner — no window over the URL table, no
    regex, plain ``startswith`` in codegen."""
    u = urls.select(
        F.col(host_col).alias("_uh"),
        F.col(path_col).alias("_up"),
        "*",
    )
    r = rules.select(
        F.col(rule_host_col).alias("_rh"),
        F.col(rule_path_col).alias("_rp"),
        F.col(allow_col).cast("boolean").alias("_ra"),
    )
    joined = u.join(
        r,
        (F.col("_uh") == F.col("_rh"))
        & F.col("_up").startswith(F.col("_rp")),
        "left",
    )
    # longest rule wins; tie -> allow wins: max over struct(len, allow)
    win = F.max(
        F.when(
            F.col("_rp").isNotNull(),
            F.struct(
                F.length("_rp").cast("bigint").alias("l"),
                F.col("_ra").alias("a"),
                F.col("_rp").alias("p"),
            ),
        )
    ).alias("_w")
    key_cols = [c for c in urls.columns]
    agg = joined.groupBy("_uh", "_up", *key_cols).agg(win)
    return agg.select(
        *key_cols,
        F.coalesce(F.col("_w.a"), F.lit(True)).alias("allowed"),
        F.col("_w.p").alias("rule_prefix"),
        F.col("_w.l").alias("rule_len"),
    )
