"""WARC source — the Common Crawl ingestion format.

A WARC file is a sequence of records, each ``WARC/1.x\\r\\n`` +
name:value headers + blank line + content block + two CRLFs; Common
Crawl publishes raw crawls (``.warc``, HTTP payloads), extracted text
(``.wet``, ``conversion`` records — the form text pipelines actually
ingest), and metadata (``.wat``). This reader is built on Spark's own
text source with the INTER-RECORD FRAMING as the line separator, so
record splitting, distribution, and (for uncompressed files) input
splits all come from the battle-tested text reader — no custom
InputFormat — and header parsing is JVM ``regexp_extract`` expressions
(no per-record Python).

Constraints, stated:

- **Charset**: the text source decodes UTF-8, so this reader targets
  TEXT payloads (WET conversion records, WAT JSON, warcinfo); binary
  HTTP payloads in raw ``.warc`` survive structurally (headers parse,
  content is carried) but bytes outside UTF-8 are replaced —
  byte-exact binary payloads would need a binary InputFormat.
- **Delimiter collision**: real WARC readers frame records by
  ``Content-Length``; a line-separator reader cannot. The separator
  here is the full inter-record boundary ``\\r\\n\\r\\nWARC/1.`` (the
  record-terminating double CRLF plus the next version line), not the
  bare version line — so a payload merely *mentioning* ``WARC/1.0``
  (pages about the WARC format) no longer splits. A payload that
  embeds a verbatim WARC record with CRLF framing (e.g. a warcinfo
  block quoting records) still splits at the embedded boundary: the
  leading fragment keeps its headers but loses its tail, and the
  embedded fragment parses as its own record. Fragments produced by a
  split *mid-payload* carry no ``WARC-Type`` header and are dropped by
  the validity filter below. For byte-exact framing of adversarial
  input, use a Content-Length-framed custom reader instead.
- **Versions**: WARC/1.0 and WARC/1.1 both frame (the separator pins
  only the ``1.`` major); pre-1.0 crawls (WARC/0.x) do not.
- **Gzip**: ``.gz`` inputs work the way Spark always handles them —
  per-file decompression (a file is one task; Common Crawl ships
  thousands of ~1 GB members, so file-level parallelism is the unit
  there anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: record boundary: terminating double-CRLF + the next record's version
#: line prefix (version-neutral across WARC/1.0 and 1.1)
_DELIM = "\r\n\r\nWARC/1."

#: what a fragment then starts with: the version-line remnant — the
#: whole line for the file's first record, the minor-version digit for
#: every subsequent one
_VERSION_REMNANT = r"^(WARC/1\.\d{1,2}|\d{1,2})\r\n"


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("conversion", "response"),
) -> DataFrame:
    """Read WARC records as
    ``(record_type, target_uri, warc_date, record_id, content_length,
    content)``.

    ``record_types``: keep only these WARC-Types (default: the two that
    carry documents — WET ``conversion`` and raw ``response``); ``None``
    keeps everything including ``warcinfo``/``request``/``metadata``.
    ``content`` is the raw content block (for ``response`` records it
    still begins with the HTTP response head; :func:`strip_http_headers`
    splits that off). ``content_length`` is the declared header value —
    byte length, which may differ from ``length(content)`` after UTF-8
    replacement; trailing record separators (CRLF CRLF) are trimmed.

    Validity filter: a fragment whose header section carries no
    ``WARC-Type`` is not a record — it is the payload tail of a
    delimiter collision (see module docstring) — and is dropped even
    when ``record_types=None``; every real record type is required to
    carry WARC-Type by the spec."""
    raw = (
        spark.read.option("lineSep", _DELIM)
        .text(path)
        .where(F.length(F.trim("value")) > 0)
    )
    frag = F.regexp_replace(F.col("value"), _VERSION_REMNANT, "")
    parts = F.split(frag, r"\r\n\r\n", 2)
    hdr = F.element_at(parts, 1)
    body = F.element_at(parts, 2)

    def header(name: str):
        return F.nullif(
            F.regexp_extract(hdr, rf"(?m)^{name}:\s*(.*?)\s*$", 1), F.lit("")
        )

    out = raw.select(
        F.lower(F.coalesce(header("WARC-Type"), F.lit(""))).alias("record_type"),
        F.regexp_replace(
            F.coalesce(header("WARC-Target-URI"), F.lit("")), r"^<|>$", ""
        ).alias("target_uri"),
        header("WARC-Date").alias("warc_date"),
        F.regexp_replace(
            F.coalesce(header("WARC-Record-ID"), F.lit("")), r"^<|>$", ""
        ).alias("record_id"),
        header("Content-Length").cast("bigint").alias("content_length"),
        F.regexp_replace(
            F.coalesce(body, F.lit("")), r"(\r\n)+$", ""
        ).alias("content"),
    ).where(F.col("record_type") != "")
    if record_types is not None:
        out = out.where(F.col("record_type").isin([t.lower() for t in record_types]))
    return out


def strip_http_headers(content: F.Column) -> F.Column:
    """For ``response`` records: drop the HTTP head (status line +
    headers up to the first blank line), leaving the entity body. A
    content block with no blank line (or a non-HTTP block) is returned
    unchanged."""
    parts = F.split(content, r"\r\n\r\n", 2)
    return F.when(
        F.size(parts) >= 2, F.element_at(parts, 2)
    ).otherwise(content)


def warc_to_documents(
    spark: SparkSession,
    path: str,
    min_chars: int = 1,
) -> DataFrame:
    """WET/WARC → the engine's ``documents`` shape: one row per document
    record with ``(doc_id, text, source, n_chars)`` — ``doc_id`` the
    WARC-Record-ID, ``source`` the target URI's host. Response records
    get their HTTP head stripped; empty/short texts dropped. The output
    plugs directly into the curation/dedup operator family."""
    recs = read_warc(spark, path)
    text = F.when(
        F.col("record_type") == "response",
        strip_http_headers(F.col("content")),
    ).otherwise(F.col("content"))
    return (
        recs.select(
            F.col("record_id").alias("doc_id"),
            text.alias("text"),
            F.regexp_extract(
                "target_uri", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .where(F.col("n_chars") >= min_chars)
    )
