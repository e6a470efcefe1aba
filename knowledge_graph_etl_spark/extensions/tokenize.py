"""Byte-pair-encoding tokenizer: sample-trained merges, distributed
encoding.

Token COUNTING for budget/packing purposes is served by the cheap
JVM-side ``text.tokens`` (whitespace) — this module adds the real
subword path a training pipeline needs for exact token budgets and
sequence packing: classic BPE (Sennrich et al. 2016 / GPT-2 shape —
word-internal merges over an end-of-word-marked symbol sequence).

Division of labor, the way production tokenizer pipelines actually run:

* **training is a driver-side fold over a bounded SAMPLE** —
  :func:`bpe_train` aggregates word frequencies distributed (one
  map-side-combinable count), collects only the top-``max_words``
  (bounded rows, not the corpus), and runs the merge loop in pure
  Python. Merge learning is inherently sequential (each merge depends
  on the counts AFTER the previous one) and converges on a corpus
  sample — no one trains BPE on 100 TB;
* **encoding is an Arrow-batched map** — :func:`bpe_encode` broadcasts
  the merge ranks and applies them per word with an LRU word cache
  (Zipf makes the cache hit rate ~word-frequency mass), no shuffle.

Not SQL-expressible (iterative merge application), so verification is
pytest against hand-checkable corpora and structural invariants, like
the real multimodal decode paths.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

_EOW = "\x01"  # end-of-word marker (SOH control char: never in tokenized text)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus's word-frequency
    distribution. Deterministic: pair counts tie-break lexicographically,
    and the word table is the ``max_words`` most frequent words (count
    desc, word asc) — same corpus, same merges, on any run.

    Scale shape: the ONLY distributed work is one tokenize+count
    aggregate (map-side combinable, uniform word keys); the driver
    collects ``max_words`` bounded rows. The merge loop is
    O(num_merges × vocab) pure Python on that bounded table."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    rows = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + (_EOW,): int(r["c"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank-first — the canonical BPE
    encode loop (greedy by merge priority, not left-to-right). The
    end-of-word marker STAYS on the word-final token (Sennrich
    convention): ``''.join(tokens).replace(_EOW, ' ')`` reconstructs the
    tokenized text exactly, which downstream packing/detokenization
    needs. A word whose marker merged into nothing keeps it as a fused
    suffix (the trailing bare marker is folded into the last symbol)."""
    symbols = list(word) + [_EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    if len(symbols) >= 2 and symbols[-1] == _EOW:
        symbols[-2:] = [symbols[-2] + _EOW]
    return [s for s in symbols if s]


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with the learned merges, returning
    ``(id_col, bpe_tokens array<string>, n_bpe_tokens)``. Arrow-batched
    ``mapInPandas`` over a broadcast rank table with a per-executor LRU
    word cache — a pure map, no shuffle; at 100 TB the cost is the
    per-unique-word encode, amortized by Zipf through the cache."""
    import pandas as pd

    spark = docs.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    base = docs.select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks")
    )

    def run(batches):
        r = bc.value

        @lru_cache(maxsize=65536)
        def enc(w: str) -> tuple[str, ...]:
            return tuple(_encode_word(w, r))

        for pdf in batches:
            ids, toks, counts = [], [], []
            for rid, words in zip(pdf["__id"], pdf["__toks"]):
                out: list[str] = []
                for w in words:
                    out.extend(enc(w))
                ids.append(rid)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {"__id": ids, "bpe_tokens": toks, "n_bpe_tokens": counts}
            )

    id_dtype = docs.schema[id_col].dataType.simpleString()
    return base.mapInPandas(
        run,
        schema=(
            f"__id {id_dtype}, bpe_tokens array<string>, n_bpe_tokens bigint"
        ),
    ).withColumnRenamed("__id", id_col)
