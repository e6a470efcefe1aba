"""Streaming corpus curation: the stateless slice of the curation
pipeline as one transform that runs IDENTICALLY on batch and streaming
DataFrames.

Normalization, length filtering and PII redaction are pure per-row maps —
no state, no watermark, no shuffle — so the same function curates a
static corpus or a live document feed (`readStream` → `curate_docs` →
`writeStream`); corpus-global stages (cross-document dedup,
decontamination against a benchmark set) stay batch-side by design, since
they need the whole corpus. `tests/test_streaming.py` proves the
stream==batch equivalence on a file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extensions.curation import pii_redact
from ..extensions.text import normalize_text, token_count


def curate_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 10_000,
) -> DataFrame:
    """normalize → token-length filter → PII redaction. Emits
    ``(id_col, redacted, n_emails, n_ipv4, n_longnums)`` for every
    surviving document; too-short/too-long documents are dropped."""
    clean = docs.withColumn(text_col, normalize_text(F.col(text_col)))
    kept = clean.where(
        token_count(F.col(text_col)).between(min_tokens, max_tokens)
    )
    return pii_redact(kept, text_col=text_col, id_col=id_col)
