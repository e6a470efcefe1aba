"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen — no Python in
the hot path), designed to run over a ~100 TB ``documents`` table: every
function is a narrow per-row map, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Minimal deterministic stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "den"],
    "es": ["el", "la", "los", "de", "y", "que", "es", "un", "una", "por"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased). One expression, no UDF.
    Empty/whitespace-only text yields an EMPTY array — ``split`` alone
    returns [''] there, which would give every blank document the same
    one-token minhash/simhash signature and flood the dedup output with
    blank-blank "perfect duplicate" pairs."""
    return F.array_remove(F.split(F.trim(F.lower(text)), r"\s+"), "")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: split on whitespace AND on
    letter/digit/punctuation boundaries — a cheap, deterministic proxy for a
    BPE tokenizer's piece count."""
    pieces = F.split(
        F.trim(text), r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|\s+"
    )
    return F.size(F.filter(pieces, lambda p: F.length(F.trim(p)) > 0))


def punct_ratio(text: Column) -> Column:
    total = F.length(text)
    punct = total - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    tks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(tks, lambda t: F.array_contains(sw, t)))
    n = F.size(tks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic: length band + punctuation sanity +
    stopword presence. Deterministic, SQL-expressible (oracled in
    __spark_entry__)."""
    n = token_count(text)
    length_ok = F.when((n >= 10) & (n <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(text, "en") >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + punct_ok + sw_ok, 2)


def langid_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_ratio(text, lang)) for lang in STOPWORDS]


def langid(text: Column) -> Column:
    """N-gram-free language-ID heuristic: argmax of stopword-hit ratio over
    the five built-in lists, ties broken by language code order, 'und' when
    nothing hits."""
    scores = langid_scores(text)
    # ties must pick the FIRST language code: sort structs of (-score, lang)
    # ascending and take the head
    keyed = F.array(
        *[
            F.struct((-s).alias("negscore"), F.lit(lang).alias("lang"))
            for lang, s in scores
        ]
    )
    first = F.sort_array(keyed, asc=True)[0]
    return F.when(-first["negscore"] > 0, first["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the sorted set of distinct tokens
    (canonical "bag fingerprint" — robust to token order & repetition)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon)


def _shifted(arr: Column, i: int) -> Column:
    """``arr`` shifted left by ``i`` (suffix slice); empty-safe."""
    return F.slice(arr, i + 1, F.greatest(F.size(arr) - i, F.lit(0)))


def zip_kgrams(tks: Column, k: int, sep: str = " ") -> Column:
    """k-grams of a token array, via ``arrays_zip`` of the array with its
    k-1 shifted suffixes — NOT ``transform(idx, i -> slice(tks, i, k))``:
    Catalyst does no common-subexpression elimination inside lambda bodies,
    so the per-index form re-evaluates the token-array expression once per
    OUTPUT GRAM (measured 6× slower end-to-end). The zip form evaluates it
    a constant ~2(k-1)+1 times per row. Shared by
    :func:`dedup.word_shingles` and :func:`winnow_fingerprints`.

    NULL-safe: NULL input (or fewer than k tokens) → empty array."""
    parts = {"g0": tks}
    for i in range(1, k):
        parts[f"g{i}"] = _shifted(tks, i)
    z = F.arrays_zip(*[c.alias(n) for n, c in parts.items()])
    # arrays_zip pads the shifted suffixes with NULL at the tail; a NULL
    # last component marks an incomplete window → filtered out
    grams = F.transform(
        z,
        lambda s: F.when(
            s[f"g{k - 1}"].isNotNull(),
            F.concat_ws(sep, *[s[f"g{i}"] for i in range(k)]),
        ),
    )
    return F.coalesce(
        F.filter(grams, lambda g: g.isNotNull()), F.array().cast("array<string>")
    )


def winnow_fingerprints(
    text: Column, k: int = 4, window: int = 5
) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): rolling
    hashes of the k-gram stream, then the MINIMUM of each sliding window of
    ``window`` consecutive hashes; the distinct minima are the document's
    fingerprint set. Guarantees any shared run of ≥ ``window+k-1`` tokens
    between two documents yields a shared fingerprint — the position-aware
    complement of the bag :func:`fingerprint`.

    Hash = md5-derived bigint of the k-gram (cross-engine-deterministic, so
    the DuckDB oracle reproduces the exact fingerprint sets). All array
    expressions — shifted-slice zips, never per-index lambdas over the
    re-evaluated parent (see dedup.word_shingles).

    Returns a sorted array<bigint> (empty when the doc has < k tokens)."""
    from .hashing import md5_base  # local import: avoids module cycle

    grams = zip_kgrams(tokens(text), k)
    hashes = F.transform(grams, md5_base)
    # sliding-window min: least() across the hash array and its w-1 shifts
    hparts = {"h0": hashes}
    for i in range(1, window):
        hparts[f"h{i}"] = _shifted(hashes, i)
    hz = F.arrays_zip(*[c.alias(n) for n, c in hparts.items()])
    mins = F.filter(
        F.transform(
            hz,
            lambda s: F.when(
                s[f"h{window - 1}"].isNotNull(),
                F.least(*[s[f"h{i}"] for i in range(window)]),
            ),
        ),
        lambda m: m.isNotNull(),
    )
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprint_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """Row-form winnowing: the same fingerprint SET as
    :func:`winnow_fingerprints`, as exploded (id, fp) rows.

    This is the fast path: the array form's sliding-min must reference the
    per-gram hash array ``window`` times, and Catalyst re-evaluates the
    whole md5-transform per reference (no CSE across array arguments —
    measured ~2.5× slower). Here each gram is hashed EXACTLY once
    (posexplode → md5 → windowed min over dense positions); cost is one
    shuffle on the doc id, linear in corpus size."""
    from pyspark.sql import Window

    from .hashing import md5_base

    grams = docs.select(
        F.col(id_col),
        F.posexplode(zip_kgrams(tokens(F.col(text_col)), k)).alias("pos", "gram"),
    )
    h = grams.select(id_col, "pos", md5_base(F.col("gram")).alias("h"))
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    n = Window.partitionBy(id_col)
    mins = (
        h.withColumn("m", F.min("h").over(w))
        .withColumn("maxpos", F.max("pos").over(n))
        .where(F.col("pos") <= F.col("maxpos") - (window - 1))
    )
    return mins.select(F.col(id_col), F.col("m").alias("fp")).distinct()


def simhash64_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document 64-bit SimHash as a SIGNED bigint column ``sh``
    (bit 63 lands in the sign — irrelevant: all consumers use bitwise
    ops, e.g. ``bit_count(a ^ b)`` for Hamming distance).

    Token hash = ``xxhash64(token)``; per-bit majority vote over the
    document's distinct tokens. Implemented as explode → ONE hash
    aggregate with 64 bitwise vote sums — stays inside whole-stage
    codegen, one shuffle on ``id`` with map-side partial aggregation
    (vs. interpreted per-row array traversals, which are ~100× slower).
    """
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    agg = tok.groupBy("id").agg(*votes)
    sh = F.lit(0).cast("long")
    for b in range(64):
        sh = sh.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select("id", sh.alias("sh"))


def simhash_segments_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document SimHash as ``blocks`` 16-bit integer segments
    ``seg0..seg{blocks-1}`` (low bits first) — the form the pigeonhole
    block join consumes directly, avoiding 64-bit sign pitfalls entirely.

    ``hash_fn``:
      * ``"xxhash64"`` (default) — token hash = ``xxhash64(token)``,
        segments carved by shifts. The cheap scale path.
      * ``"md5"`` — token hash = first ``4·blocks`` hex chars of
        ``md5(token)``, each segment parsed from 4 hex digits. Bit-identical
        to ANSI-SQL ``md5`` in any engine → cross-engine oracle-able. Same
        per-bit uniformity; ~2× hash cost.

    Same physical shape as :func:`simhash64_table`: explode distinct
    tokens → ONE hash aggregate carrying 16·blocks bitwise vote sums —
    whole-stage codegen, one shuffle on ``id`` with map-side partials.
    """
    width = 16
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    if hash_fn == "md5":
        hm = F.md5("tok")
        seg_exprs = [
            F.conv(F.substring(hm, 4 * k + 1, 4), 16, 10).cast("int").alias(f"ts{k}")
            for k in range(blocks)
        ]
    else:
        h = F.xxhash64("tok")
        mask = F.lit((1 << width) - 1).cast("long")
        seg_exprs = [
            F.shiftright(h, k * width).bitwiseAND(mask).cast("int").alias(f"ts{k}")
            for k in range(blocks)
        ]
    tok = tok.select("id", *seg_exprs)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col(f"ts{k}"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{k}_{b}")
        for k in range(blocks)
        for b in range(width)
    ]
    agg = tok.groupBy("id").agg(*votes)
    out_cols = []
    for k in range(blocks):
        seg = F.lit(0)
        for b in range(width):
            seg = seg + F.when(F.col(f"v{k}_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        out_cols.append(seg.cast("int").alias(f"seg{k}"))
    return agg.select("id", *out_cols)


def add_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", langid(t))
        .withColumn("fingerprint", fingerprint(t))
    )


def normalize_text(text: Column) -> Column:
    """Canonical whitespace/control cleanup — the first pass of every text
    pipeline: control characters (C0 range) become spaces, whitespace runs
    collapse to one space, ends trimmed. Three chained ``regexp_replace``
    expressions (JVM-side, codegen; patterns portable between Java regex
    and RE2 so the op is exactly oracle-able)."""
    no_ctl = F.regexp_replace(text, r"[\x00-\x1F\x7F]", " ")
    collapsed = F.regexp_replace(no_ctl, r"\s+", " ")
    return F.trim(collapsed)


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease per document from three exact integer counts —
    sentences (terminal-punctuation runs, floored at 1), words
    (:func:`tokens`), and syllables (vowel-group runs, the standard
    heuristic) — combined by the Flesch formula ``206.835 − 1.015·(W/S)
    − 84.6·(Syll/W)`` in ONE double expression over exact ints, floored
    to micro units: deterministic cross-engine, no UDF, evaluated inside
    the scan projection. The curation use is the same as the Gopher
    rules: hard floors/ceilings on mechanically-scored readability
    flag boilerplate, tables-as-text, and OCR soup that token-count
    filters miss. Zero-word documents report NULL score (the formula is
    undefined), kept in the output so the gate sees them.

    Returns ``(id, n_sents, n_words, n_syll, flesch_micro)``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    n_words = F.size(tokens(t)).cast("bigint")
    n_syll = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("bigint")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * n_words.cast("double") / n_sents.cast("double")
        - F.lit(84.6) * n_syll.cast("double") / n_words.cast("double")
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_sents.alias("n_sents"),
        n_words.alias("n_words"),
        n_syll.alias("n_syll"),
        F.when(
            n_words > 0,
            F.floor(flesch * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"),
        ).alias("flesch_micro"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty in corpus order: the fraction of a
    document's distinct n-grams whose FIRST corpus occurrence (smallest
    id) is this document — the diversity/memorization metric a training
    pipeline tracks while ingesting ("are new crawls still contributing
    new text, or re-serving the corpus?"). A novelty collapse across a
    source is the cheap early warning the expensive near-dup pass then
    confirms.

    Exact and order-deterministic: "first" is ``min(id)`` per distinct
    gram — no timestamps needed, ties impossible. Documents with fewer
    than ``n`` tokens report zero grams and NULL novelty (kept).

    Scale shape: one tokenize+shingle scan; a (gram, doc) distinct
    aggregate; a gram-keyed min; one join of the per-doc gram set
    against the winners — all keys are grams or ids, map-combinable,
    never all-pairs. Returns ``(id, n_grams, n_novel, novelty_ppm)``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(zip_kgrams(tokens(F.col(text_col)), n)).alias("gram"),
    ).distinct()
    first = grams.groupBy("gram").agg(F.min("id").alias("first_id"))
    per_doc = (
        grams.join(first, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("first_id") == F.col("id"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    spine = df.select(F.col(id_col).alias("id"))
    return (
        spine.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.expr("n_novel * 1000000 div n_grams"),
            )
            .cast("bigint")
            .alias("novelty_ppm"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str | None = "source",
    top_ranks: int = 1000,
) -> DataFrame:
    """Zipf-law fit per corpus slice: OLS slope of log2(frequency) on
    log2(rank) over the top-``top_ranks`` token frequencies. Natural
    text sits near slope ≈ -1; machine-generated / boilerplate corpora
    drift shallower, extreme-dedup corpora steeper — a one-row-per-slice
    corpus-health indicator alongside corpus_report.

    Exactness: token counts and ranks are exact bigints; the regression
    points x = log2(rank), y = log2(count) are 1e-6-quantized PER POINT
    (the unigram_lm_score discipline) so the five OLS sums are exact
    integer aggregates — order-independent across engines. The closed-
    form slope/intercept then evaluate in double FROM those exact sums
    (sums cast to double before multiplying: n·Sxy would overflow int64,
    and the double evaluation is the same IEEE expression on identical
    inputs on both engines), rounded to 1e-6.

    Scale shape: one explode + map-combinable token count, one
    per-slice top-k (rank window over slice-local COUNTS — |vocab|
    rows, not corpus rows), and a 5-sum aggregate over ≤ top_ranks rows
    per slice. With ``group_col=None`` the rank window is a single
    partition over the whole vocabulary — fine for a fixture, but at
    100 TB pass a real slice column (source/lang/shard) so the window
    partitions; the per-slice form is the production shape. Returns one
    row per slice: ``(group, n_ranks, slope, intercept)``."""
    from pyspark.sql import Window

    gname = group_col if group_col is not None else "_g"
    tok = docs.select(
        (F.col(group_col) if group_col else F.lit("all")).alias(gname),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    cnt = tok.groupBy(gname, "tok").agg(F.count(F.lit(1)).alias("c"))
    ranked = cnt.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(gname).orderBy(
                F.desc("c"), F.asc("tok")
            )
        ),
    ).where(F.col("rank") <= top_ranks)

    def q(col: F.Column) -> F.Column:
        return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")

    pts = ranked.select(
        gname,
        q(F.log2(F.col("rank").cast("double"))).alias("x"),
        q(F.log2(F.col("c").cast("double"))).alias("y"),
    )
    sums = pts.groupBy(gname).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranks"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    nd = F.col("n_ranks").cast("double")
    # degenerate-slice guard (ADVICE r11): a slice with a single ranked
    # token has sx=sxx=0 → den 0/0; return NULL instead of relying on
    # non-ANSI division semantics (ANSI mode would error, and the
    # oracle SQL applies the identical CASE den > 0 guard)
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    slope = F.when(
        den > 0,
        (
            nd * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / den,
    )
    return sums.select(
        F.col(gname),
        "n_ranks",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / nd
            / F.lit(1000000.0),
            6,
        ).alias("intercept"),
    )


def url_features(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-structure quality features — the standard web-crawl quality
    signals computed from the URL alone, before fetching a byte of
    content: deep paths, digit-heavy slugs and tracking parameters
    correlate with boilerplate/spam; root and shallow pages with hubs.
    One row per input row:

    * ``host`` / ``tld`` — registrable host and its last label;
    * ``path_depth`` — number of non-empty path segments;
    * ``path_digit_ppm`` — digits per path character (ppm, exact
      integer division — cross-engine identical);
    * ``n_query_params`` — non-empty ``&``-separated parameter count;
    * ``has_tracking`` — any ``utm_`` parameter present;
    * ``is_root`` — path is ``''`` or ``/``.

    Scale shape: a pure projection (regexp + length arithmetic, all
    whole-stage codegen) — no shuffle, no UDF; at 100 TB this is a
    map-only pass that column-prunes to the URL column."""
    url = F.col(url_col)
    # RFC-3986 scheme class (case-insensitive, alnum+.- after the first
    # letter) — an uppercase-scheme URL must not degrade to empty
    # host/path (which would mislabel it is_root=true)
    scheme = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
    host = F.regexp_extract(url, scheme + r"([^/?#]+)", 1)
    path = F.regexp_extract(url, scheme + r"[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    path_len = F.length(path)
    n_digits = path_len - F.length(F.regexp_replace(path, "[0-9]", ""))
    return df.select(
        F.col(id_col),
        url.alias("url"),
        host.alias("host"),
        F.regexp_extract(host, r"\.([^.]+)$", 1).alias("tld"),
        F.size(F.filter(F.split(path, "/"), lambda x: x != "")).cast(
            "bigint"
        ).alias("path_depth"),
        # floor of the double division (not a bare cast): Spark casts
        # double→int by truncation but DuckDB rounds half-even; floor()
        # of a correctly-rounded IEEE division is identical on both
        F.when(
            path_len > 0,
            F.floor(
                n_digits.cast("double") * 1000000.0 / path_len.cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("path_digit_ppm"),
        # empty '&'-segments ('a=1&&b=2') are separators, not params
        F.size(F.filter(F.split(query, "&"), lambda x: x != ""))
        .cast("bigint")
        .alias("n_query_params"),
        query.contains("utm_").alias("has_tracking"),
        path.isin("", "/").alias("is_root"),
    )


def subword_fertility(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fertility proxy per corpus slice: sub-word pieces per
    whitespace word — the standard "how expensive is this domain/language
    for my tokenizer" signal (fertility ≈ 1 for clean prose, rising with
    punctuation-dense / code-like / agglutinative text). Pieces are runs
    of word chars or of non-word-non-space chars (``\\w+|[^\\w\\s]+`` —
    deliberately lookaround-free so the SAME regex runs on engines
    without lookbehind, unlike :func:`bpe_ish_token_count`'s
    boundary-split form). Exact integer sums; fertility as ppm via
    integer division. One map-side-combinable aggregate per slice:
    ``(group, n_docs, n_words, n_pieces, fertility_ppm)``."""
    pieces = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\w+|[^\w\s]+"), 0)
    ).cast("bigint")
    words = token_count(F.col(text_col)).cast("bigint")
    return (
        docs.select(F.col(group_col), pieces.alias("__p"), words.alias("__w"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__w").cast("bigint").alias("n_words"),
            F.sum("__p").cast("bigint").alias("n_pieces"),
            F.expr(
                "CASE WHEN sum(__w) > 0 THEN sum(__p) * 1000000 div sum(__w) "
                "ELSE 0 END"
            )
            .cast("bigint")
            .alias("fertility_ppm"),
        )
    )


def anchor_text_features(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-quality /
    relevance signal set computed from a link table ``(src, dst,
    anchor)``: how many pages link here, with how many distinct anchor
    phrasings, over how diverse a term vocabulary. High inlink counts
    with near-zero anchor diversity flag templated/spam linking; diverse
    anchors flag genuinely referenced content. Returns one row per
    target: ``n_inlinks``, ``n_unique_anchors``, ``n_anchor_terms``,
    ``n_distinct_terms``, ``diversity_ppm`` (distinct/total terms),
    ``avg_anchor_len_milli`` (chars per link, exact integer milli).

    Scale shape: two shuffles keyed on the SAME dst column (the link
    aggregate and the exploded-term aggregate — the second reuses the
    first's partitioning in the final co-partitioned join); anchors
    explode term-sized, never pairwise."""
    base = links.groupBy(dst_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_inlinks"),
        F.countDistinct(anchor_col).cast("bigint").alias("n_unique_anchors"),
        F.expr(
            f"sum(length({anchor_col})) * 1000 div count(1)"
        )
        .cast("bigint")
        .alias("avg_anchor_len_milli"),
    )
    terms = (
        links.select(
            F.col(dst_col), F.explode(tokens(F.col(anchor_col))).alias("t")
        )
        .groupBy(dst_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_anchor_terms"),
            F.countDistinct("t").cast("bigint").alias("n_distinct_terms"),
        )
    )
    return base.join(terms, dst_col, "left").select(
        dst_col,
        "n_inlinks",
        "n_unique_anchors",
        F.coalesce("n_anchor_terms", F.lit(0)).cast("bigint").alias(
            "n_anchor_terms"
        ),
        F.coalesce("n_distinct_terms", F.lit(0)).cast("bigint").alias(
            "n_distinct_terms"
        ),
        F.expr(
            "CASE WHEN coalesce(n_anchor_terms, 0) > 0 THEN "
            "n_distinct_terms * 1000000 div n_anchor_terms ELSE 0 END"
        )
        .cast("bigint")
        .alias("diversity_ppm"),
        "avg_anchor_len_milli",
    )


#: query parameters stripped by canonicalize_url: the cross-site click /
#: campaign trackers that make otherwise-identical pages distinct keys
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=.*)?$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for exact-key dedup — the crawl-frontier
    normalization that collapses the cosmetic variants a crawler sees of
    one page: scheme and host lowercased, default ports dropped (``:80``
    http, ``:443`` https), trailing path slashes trimmed (empty path →
    ``/``), tracking parameters stripped (``TRACKING_PARAM_RE``: utm_*,
    gclid, fbclid, msclkid, mc_eid, ref), surviving query parameters
    SORTED (param order is not page identity), and the fragment dropped.
    A string without a ``scheme://`` prefix canonicalizes to itself
    lowercase-trimmed (opaque key), never to a fabricated URL.

    Pure column expression (regexp + list algebra, whole-stage codegen,
    no UDF) with an exact DuckDB twin — composes with
    :func:`url_features` and dedup.canonical_url_dedup."""
    scheme_cls = r"[A-Za-z][A-Za-z0-9+.\-]*"
    scheme = F.lower(F.regexp_extract(url, rf"^({scheme_cls})://", 1))
    hostport = F.regexp_extract(url, rf"^{scheme_cls}://([^/?#]+)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    rawpath = F.regexp_extract(
        url, rf"^{scheme_cls}://[^/?#]+([^?#]*)", 1
    )
    path = F.regexp_replace(rawpath, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.lower(F.trim(url))
    ).otherwise(F.concat(scheme, F.lit("://"), host, portpart, path, qpart))


def window_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking — the fixed-size, overlapping token
    windows a RAG / embedding pipeline splits documents into before
    vectorizing (stride < size gives the standard overlap so no span
    falls on a chunk boundary unseen). The content-defined complement
    is doc_cdc_chunks; this is the shape-stable one retrieval indexes
    want. One row per chunk: ``(id, chunk_id, start_tok, n_tokens,
    chunk_text)`` — chunk_id dense from 0 in document order, last
    chunk may be short, empty documents yield no rows.

    Scale shape: tokens → per-row sequence of window starts →
    posexplode; a pure map-side explode with NO shuffle and no UDF —
    the fan-out is rows × ceil(n/stride), each output row narrow. At
    100 TB this is scan-bound and embarrassingly parallel."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    tks = tokens(F.col(text_col))
    n = F.size(tks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("bigint").alias("start_tok"),
            F.slice(tks, s + 1, size).alias("_tk"),
        ),
    )
    ex = docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("_c.start_tok").alias("start_tok"),
        F.size("_c._tk").cast("bigint").alias("n_tokens"),
        F.array_join("_c._tk", " ").alias("chunk_text"),
    )


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str,
    top_n: int = 50,
    max_word_len: int = 30,
) -> DataFrame:
    """First-round BPE merge candidates: the ``top_n`` most frequent
    adjacent character pairs inside words — the corpus statistic a BPE
    tokenizer trainer computes each merge round, here as one pass so a
    pipeline can sanity-check tokenizer fit against a new corpus (a
    shifted pair table means the frozen tokenizer's merges no longer
    match the data). Words are ``[a-z]+`` runs of the lowercased text;
    words longer than ``max_word_len`` are dropped (boilerplate/URL
    blobs, and a hard bound on the explode fan-out). Output:
    ``(pair, n, merge_rank)`` with rank 1 = most frequent, ties broken
    by pair ascending.

    Scale shape: a narrow map-side double explode (words, then ≤
    ``max_word_len − 1`` pairs per word) feeding ONE map-combinable
    hash aggregate whose key space is ≤ 26² — the aggregate output is
    a few hundred rows regardless of corpus size, so the final
    rank-and-limit window is a single trivial task by construction."""
    words = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("_w")
    ).where(
        (F.length("_w") >= 2) & (F.length("_w") <= max_word_len)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(_w) - 1), i -> substr(_w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        counts.withColumn(
            "merge_rank", F.row_number().over(w).cast("bigint")
        )
        .where(F.col("merge_rank") <= top_n)
        .select("pair", "n", "merge_rank")
    )


def template_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Template-level dedup statistics: normalize each document to its
    structural template (lowercase, every digit run → ``0``, whitespace
    collapsed, trimmed) and report templates that more than
    ``min_count − 1`` documents share — the machine-generated-
    boilerplate detector (invoices, error pages, listings) that exact
    dedup misses because the variable fields differ. Output one row per
    surviving template: ``(template_hash, n_docs, exemplar_id,
    share_ppm)`` where ``exemplar_id`` is the smallest id (a stable
    representative to inspect or keep) and ``share_ppm`` is the
    template's share of ALL documents.

    Scale shape: per-row normalization + md5 (pure map, whole-stage
    codegen), ONE map-combinable hash aggregate on the 128-bit template
    hash, a broadcast one-row corpus total, and a post-aggregate
    ``HAVING`` — no raw-row shuffle, no text carried past the map."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[0-9]+", "0"),
            "\\s+",
            " ",
        )
    )
    base = df.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.md5(norm).alias("template_hash"),
    )
    total = base.agg(F.count(F.lit(1)).cast("bigint").alias("_tot"))
    grouped = base.groupBy("template_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("_id").alias("exemplar_id"),
    )
    return (
        grouped.where(F.col("n_docs") >= min_count)
        .crossJoin(F.broadcast(total))
        .select(
            "template_hash",
            "n_docs",
            "exemplar_id",
            F.expr("n_docs * 1000000 div _tot").cast("bigint").alias("share_ppm"),
        )
    )


def bleu_corpus_stats(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU sufficient statistics — modified (clipped)
    n-gram precision per order n = 1..``max_n`` plus the corpus length
    ratio, the generation-eval statistic computed the way sacrebleu
    does before the geometric mean: per segment, each candidate n-gram
    counts at most as often as it appears in that segment's reference
    (the clip that stops "the the the" from scoring). Inputs are token
    ARRAY columns (tokenize upstream — tokenization is a contract, not
    a detail). One row per order:
    ``(n, clipped_matches, cand_ngrams, precision_ppm, cand_len,
    ref_len, length_ratio_ppm)`` — the brevity penalty
    exp(1 − r/c) is transcendental, so the exact inputs (corpus
    ``cand_len``/``ref_len``) are reported instead of a rounded BP;
    every reported number is an exact integer or a ppm ``div``.

    Scale shape: both sides explode to (id, n, gram) counts via ONE
    map-combinable hash aggregate each, then a co-partitioned equi-join
    on the composite key (the canonical BLEU shuffle — ngram cells,
    never raw text), and order-keyed finals whose output is ``max_n``
    rows."""
    orders = F.explode(
        F.sequence(F.lit(1), F.lit(int(max_n)))
    ).alias("n")

    def ngram_counts(col: str, side: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias("_id"),
                F.col(col).alias("_tk"),
            )
            .select("_id", orders, F.col("_tk"))
            # sequence(1, 0) steps DOWNWARD in Spark ([1, 0] — a slice
            # at index 0 throws), so rows too short for this order are
            # filtered before the transform rather than clamped inside
            .where(F.expr("size(_tk) >= n"))
            .select(
                "_id",
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(_tk) - n + 1),"
                        " i -> concat_ws(' ', slice(_tk, i, n)))"
                    )
                ).alias("gram"),
            )
            .groupBy("_id", "n", "gram")
            .agg(F.count(F.lit(1)).cast("bigint").alias(side))
        )

    cand = ngram_counts(cand_col, "cc")
    ref = ngram_counts(ref_col, "rc")
    matches = (
        cand.join(ref, ["_id", "n", "gram"])
        .groupBy("n")
        .agg(
            F.sum(F.least("cc", "rc")).cast("bigint").alias("clipped_matches")
        )
    )
    totals = cand.groupBy("n").agg(
        F.sum("cc").cast("bigint").alias("cand_ngrams")
    )
    lens = df.agg(
        F.sum(F.size(F.col(cand_col))).cast("bigint").alias("cand_len"),
        F.sum(F.size(F.col(ref_col))).cast("bigint").alias("ref_len"),
    )
    spine = (
        df.sparkSession.range(1, int(max_n) + 1)
        .select(F.col("id").cast("int").alias("n"))
    )
    return (
        spine.join(totals, "n", "left")
        .join(matches, "n", "left")
        .crossJoin(F.broadcast(lens))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.coalesce("clipped_matches", F.lit(0))
            .cast("bigint")
            .alias("clipped_matches"),
            F.coalesce("cand_ngrams", F.lit(0))
            .cast("bigint")
            .alias("cand_ngrams"),
            F.when(
                F.col("cand_ngrams") > 0,
                F.expr(
                    "coalesce(clipped_matches, 0) * 1000000 div cand_ngrams"
                ),
            )
            .cast("bigint")
            .alias("precision_ppm"),
            "cand_len",
            "ref_len",
            F.when(
                F.col("ref_len") > 0,
                F.expr("cand_len * 1000000 div ref_len"),
            )
            .cast("bigint")
            .alias("length_ratio_ppm"),
        )
    )


def vocab_growth_curve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fractions_ppm: tuple[int, ...] = (100_000, 200_000, 400_000, 1_000_000),
    max_word_len: int = 30,
) -> DataFrame:
    """Heaps-law vocabulary growth curve: for each corpus fraction f
    (nested md5-shuffle prefixes, the same reproducible order as
    ``learning_curve_splits``), the number of DISTINCT word types seen
    in the first ceil(f·N) documents vs the running token total — the
    statistic that says whether a corpus keeps paying vocabulary for
    more data (V(n) ≈ K·n^β; the curve is reported exactly, the log-fit
    is the consumer's transcendental business). One row per fraction:
    ``(fraction_ppm, n_docs, n_tokens, vocab_size, ttr_ppm)`` with
    ``ttr_ppm`` the type-token ratio in ppm. Words are 2..
    ``max_word_len``-char ``[a-z]+`` runs of the lowercased text.

    Scale shape: per-doc DISTINCT (doc, word) pairs from one explode +
    aggregate, then each word reduces to its FIRST-seen doc rank (one
    word-keyed min), so cut evaluation is a ≤-join of the word table
    against the handful of cut ranks — never re-scanning text per
    fraction. The doc rank needs a total order: the same deliberate
    global (md5(id), id) window convention as learning_curve_splits
    (at 100 TB switch to hash-threshold prefixes and accept binomial
    sizes); everything after the windows is vocab-sized or
    fractions-sized."""
    from .hashing import md5_u60

    if not fractions_ppm or any(
        not 0 < int(f) <= 1_000_000 for f in fractions_ppm
    ):
        raise ValueError(f"bad fractions_ppm: {fractions_ppm}")
    fr = sorted({int(f) for f in fractions_ppm})
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: (F.length(t) >= 2) & (F.length(t) <= max_word_len),
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        md5_u60(F.col(id_col).cast("string")).alias("_h"),
        toks.alias("_tk"),
    )
    w = Window.orderBy("_h", "_id")
    ranked = base.select(
        F.col("_id"),
        F.row_number().over(w).cast("bigint").alias("_r"),
        F.size("_tk").cast("bigint").alias("_ntok"),
        F.col("_tk"),
    )
    cum = ranked.select(
        "_r",
        F.sum("_ntok")
        .over(
            Window.orderBy("_r").rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("_cum_tok"),
    )
    first_seen = (
        ranked.select("_r", F.explode_outer("_tk").alias("_wd"))
        .where(F.col("_wd").isNotNull())
        .groupBy("_wd")
        .agg(F.min("_r").cast("bigint").alias("_first"))
    )
    n_tot = ranked.agg(F.max("_r").cast("bigint").alias("_n"))
    cuts = n_tot.select(
        F.explode(F.array(*[F.lit(f) for f in fr])).alias("fraction_ppm"),
        F.col("_n"),
    ).select(
        F.col("fraction_ppm").cast("bigint").alias("fraction_ppm"),
        F.expr("(fraction_ppm * _n + 999999) div 1000000")
        .cast("bigint")
        .alias("_cut"),
    )
    vocab = (
        first_seen.crossJoin(F.broadcast(cuts))
        .where(F.col("_first") <= F.col("_cut"))
        .groupBy("fraction_ppm", "_cut")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_size"))
    )
    return (
        cuts.join(vocab, ["fraction_ppm", "_cut"], "left")
        .join(cum, F.col("_cut") == F.col("_r"), "left")
        .select(
            "fraction_ppm",
            F.col("_cut").alias("n_docs"),
            F.coalesce("_cum_tok", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("vocab_size", F.lit(0))
            .cast("bigint")
            .alias("vocab_size"),
            F.when(
                F.coalesce("_cum_tok", F.lit(0)) > 0,
                F.expr("coalesce(vocab_size, 0) * 1000000 div _cum_tok"),
            )
            .cast("bigint")
            .alias("ttr_ppm"),
        )
    )


def collocation_lift(
    df: DataFrame,
    text_col: str,
    top_n: int = 50,
    min_count: int = 5,
    max_word_len: int = 30,
) -> DataFrame:
    """Collocation extraction by PMI-lift: the ``top_n`` adjacent word
    bigrams ranked by lift = P(xy)/(P(x)·P(y)) — the phrase-mining /
    tokenizer-vocab statistic ("new york" scores high, "of the" low)
    computed WITHOUT logs so the oracle is exact: lift and log-PMI rank
    identically (log is monotone), and lift_ppm = c_xy·N·10⁶ div
    (c_x·c_y) is pure integer arithmetic (overflow bound: c_xy·N·10⁶
    needs N ≲ 3·10⁶ tokens; at larger corpora pre-divide N or widen to
    decimal — documented, not silent). ``min_count`` floors the bigram
    count so hapax pairs (lift ≈ N) don't own the ranking. Output:
    ``(pair, n_pair, n_left, n_right, lift_ppm, lift_rank)``, rank 1 =
    highest lift, ties broken by pair ascending.

    Scale shape: one explode for unigram counts, one windowless
    adjacent-pair transform for bigram counts — both ONE map-combinable
    hash aggregate; then the bigram table (already min_count-pruned)
    joins the unigram table twice on word equi-keys. The final rank
    window runs over ≤ the pruned-bigram table."""
    if top_n <= 0 or min_count < 1:
        raise ValueError("top_n must be positive and min_count >= 1")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: (F.length(t) >= 2) & (F.length(t) <= max_word_len),
    )
    base = df.select(toks.alias("_tk"))
    uni = (
        base.select(F.explode("_tk").alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n_row = uni.agg(F.sum("c").cast("bigint").alias("_n"))
    bi = (
        base.where(F.size("_tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_tk) - 1), i ->"
                    " struct(element_at(_tk, i) AS x,"
                    " element_at(_tk, i + 1) AS y))"
                )
            ).alias("_p")
        )
        .select(F.col("_p.x").alias("x"), F.col("_p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .where(F.col("n_pair") >= int(min_count))
    )
    ux = uni.select(F.col("_w").alias("x"), F.col("c").alias("n_left"))
    uy = uni.select(F.col("_w").alias("y"), F.col("c").alias("n_right"))
    scored = (
        bi.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(n_row))
        .select(
            F.concat_ws(" ", "x", "y").alias("pair"),
            "n_pair",
            "n_left",
            "n_right",
            F.expr("n_pair * _n * 1000000 div (n_left * n_right)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
    w = Window.orderBy(F.col("lift_ppm").desc(), F.col("pair").asc())
    return (
        scored.withColumn(
            "lift_rank", F.row_number().over(w).cast("bigint")
        )
        .where(F.col("lift_rank") <= int(top_n))
        .select(
            "pair", "n_pair", "n_left", "n_right", "lift_ppm", "lift_rank"
        )
    )


_SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    # (class name, literal char-class pattern — literal ranges, not
    # \p{...} names, so Java regex (Spark) and RE2 (DuckDB) agree)
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("cjk", "[一-鿿]"),
)


def script_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Unicode-script profile of a corpus — the multilingual-crawl
    triage report language-ID alone misses (langid says *which*
    language; this says whether the bytes are even the script the
    pipeline expects, catching mojibake, mixed-script spam, and
    wrong-corpus mounts). Per document, characters are counted in five
    literal-range classes (latin / digit / cyrillic / greek / cjk —
    literal ranges, not ``\\p{...}`` names, so every regex engine
    agrees) plus ``other``; the document's dominant script is the
    class with the most characters, ties broken by the declaration
    order above (other last). One row per class present:
    ``(script, n_docs_dominant, n_chars, char_share_ppm)`` where the
    share is over ALL characters in the corpus.

    Scale shape: pure map — per class, chars = length(text) −
    length(regexp_replace(text, class, '')) in whole-stage codegen;
    then ONE 6-key hash aggregate. Nothing shuffles but the 6-row
    class table."""
    names = [n for n, _ in _SCRIPT_CLASSES] + ["other"]
    counts = [
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), pat, ""))
        )
        .cast("bigint")
        .alias(f"_c_{name}")
        for name, pat in _SCRIPT_CLASSES
    ]
    base = df.select(
        F.col(id_col).alias("_id"),
        F.length(F.col(text_col)).cast("bigint").alias("_len"),
        *counts,
    ).withColumn(
        "_c_other",
        F.col("_len")
        - sum(F.col(f"_c_{n}") for n, _ in _SCRIPT_CLASSES),
    )
    dom = F.greatest(*[F.col(f"_c_{n}") for n in names])
    pick = F.when(F.col("_len") == 0, F.lit("other"))
    for n in names:
        pick = pick.when(F.col(f"_c_{n}") == dom, F.lit(n))
    long = base.select(
        "_id",
        pick.alias("_dom"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("script"),
                        F.col(f"_c_{n}").alias("c"),
                    )
                    for n in names
                ]
            )
        ).alias("_s"),
    ).select("_id", "_dom", F.col("_s.script").alias("script"), F.col("_s.c").alias("c"))
    tot = base.agg(F.sum("_len").cast("bigint").alias("_tot"))
    return (
        long.groupBy("script")
        .agg(
            F.sum(F.when(F.col("_dom") == F.col("script"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_dominant"),
            F.sum("c").cast("bigint").alias("n_chars"),
        )
        .where((F.col("n_chars") > 0) | (F.col("n_docs_dominant") > 0))
        .crossJoin(F.broadcast(tot))
        .select(
            "script",
            "n_docs_dominant",
            "n_chars",
            F.when(
                F.col("_tot") > 0,
                F.expr("n_chars * 1000000 div _tot"),
            )
            .cast("bigint")
            .alias("char_share_ppm"),
        )
    )


def gram_uniqueness(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_word_len: int = 30,
) -> DataFrame:
    """Cross-document gram uniqueness — per document, what fraction of
    its DISTINCT word n-grams appear in no other document. The
    order-free complement of :func:`ngram_novelty` (which credits the
    FIRST document in corpus order; here a gram shared by any two docs
    counts for neither) and the memorization/boilerplate axis
    :func:`repetition_stats` cannot see: repetition is within-doc,
    uniqueness is against the corpus (low uniqueness = templated/
    syndicated content even when each doc looks clean in isolation). Words are 2..``max_word_len``-char ``[a-z]+``
    runs; documents with fewer than ``n`` words produce no row
    (novelty undefined). One row per document: ``(id, n_grams,
    n_unique, novelty_ppm)`` — ``n_unique`` counts grams with corpus
    document-frequency exactly 1, so every number is an exact count.

    Scale shape: per-doc DISTINCT gram sets explode to (doc, gram)
    pairs; corpus doc-frequency is ONE gram-keyed aggregate over those
    pairs, and the score join is pairs ⋈ df on the SAME gram key — the
    shuffle partitioning is reused, then one doc-keyed aggregate. No
    pair ever meets another doc's pairs (this is novelty, not
    similarity — no quadratic candidate set exists)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: (F.length(t) >= 2) & (F.length(t) <= max_word_len),
    )
    pairs = (
        df.select(F.col(id_col).alias("id"), toks.alias("_tk"))
        .where(F.size("_tk") >= int(n))
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(_tk) - {int(n)} + 1),"
                        f" i -> concat_ws(' ', slice(_tk, i, {int(n)})))"
                    )
                )
            ).alias("gram"),
        )
    )
    cf = pairs.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("_df")
    )
    return (
        pairs.join(cf, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .select(
            "id",
            "n_grams",
            "n_unique",
            F.expr("n_unique * 1000000 div n_grams")
            .cast("bigint")
            .alias("novelty_ppm"),
        )
    )


def rake_keywords(
    df: DataFrame,
    text_col: str,
    stopwords: list[str] | None = None,
    top_n: int = 50,
    min_occurrences: int = 2,
    max_word_len: int = 30,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) at corpus scale:
    candidate phrases are maximal stopword-free token runs; each
    word scores degree/frequency (degree = Σ lengths of phrases
    containing it — co-occurrence reach; frequency = occurrence
    count), and a phrase scores the sum of its words' scores. Word
    scores are quantized once (``degree·10⁶ div freq``) so phrase
    scores are exact integer sums — engine-reproducible, no doubles.
    Output the ``top_n`` phrases with ≥ ``min_occurrences``
    occurrences: ``(phrase, n_words, n_occurrences, score_ppm,
    kw_rank)``, ties broken by phrase ascending.

    The stopword-boundary split is pure array algebra (stopwords map
    to a sentinel, join, split, trim — no lookarounds, portable to any
    regex engine); default stopword list is the module's English set.

    Scale shape: phrases explode map-side; word freq/degree is ONE
    word-keyed aggregate over (word, phrase-length) pairs; scores join
    back on the SAME word key (partitioning reused); the rank window
    runs over the min-occurrence-pruned distinct-phrase table only."""
    if top_n <= 0 or min_occurrences < 1:
        raise ValueError("top_n and min_occurrences must be positive")
    sw = stopwords if stopwords is not None else STOPWORDS["en"]
    sw_arr = F.array(*[F.lit(w) for w in sw])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: (F.length(t) >= 1) & (F.length(t) <= max_word_len),
    )
    marked = F.transform(
        toks,
        lambda t: F.when(F.array_contains(sw_arr, t), F.lit("§")).otherwise(t),
    )
    phrases = (
        df.select(marked.alias("_mk"))
        .select(
            F.explode(
                F.filter(
                    F.transform(
                        F.split(F.concat_ws(" ", F.col("_mk")), "§"),
                        lambda p: F.trim(p),
                    ),
                    lambda p: p != F.lit(""),
                )
            ).alias("phrase")
        )
    )
    occ = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    # (word, phrase length) pairs over ALL occurrences for freq/degree
    wp = phrases.select(
        F.size(F.split(F.col("phrase"), " ")).cast("bigint").alias("_plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("_w"),
    )
    ws = wp.groupBy("_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("_freq"),
        F.sum("_plen").cast("bigint").alias("_deg"),
    ).select(
        "_w",
        F.expr("_deg * 1000000 div _freq").cast("bigint").alias("_wscore"),
    )
    # score each DISTINCT phrase from its word multiset
    pw = occ.select(
        "phrase",
        "n_occurrences",
        F.size(F.split(F.col("phrase"), " ")).cast("bigint").alias("n_words"),
        F.explode(F.split(F.col("phrase"), " ")).alias("_w"),
    )
    scored = (
        pw.join(ws, "_w")
        .groupBy("phrase", "n_words", "n_occurrences")
        .agg(F.sum("_wscore").cast("bigint").alias("score_ppm"))
        .where(F.col("n_occurrences") >= int(min_occurrences))
    )
    w = Window.orderBy(F.col("score_ppm").desc(), F.col("phrase").asc())
    return (
        scored.withColumn("kw_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("kw_rank") <= int(top_n))
        .select(
            "phrase", "n_words", "n_occurrences", "score_ppm", "kw_rank"
        )
    )
