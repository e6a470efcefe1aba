"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen — no Python in
the hot path), designed to run over a ~100 TB ``documents`` table: every
function is a narrow per-row map, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
