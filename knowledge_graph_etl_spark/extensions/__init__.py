from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)
from .similarity import cosine, cosine_topk, ivf_topk, lsh_topk
from .text import (
    add_text_features,
    fingerprint,
    langid,
    punct_ratio,
    quality_score,
    simhash64_table,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "add_text_features",
    "cosine",
    "cosine_topk",
    "exact_dedup",
    "fingerprint",
    "ivf_topk",
    "langid",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "punct_ratio",
    "quality_score",
    "simhash64_table",
    "simhash_pairs",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
]
