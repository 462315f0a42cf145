"""BPE tokenizer training and application.

Completes the tokenizer story (token counting -> vocabulary coverage
curve -> train merges -> encode): `train_bpe` learns byte-pair-encoding
merges the way Sennrich et al. 2016 do — over the corpus WORD-FREQUENCY
table, not the raw text, because pair statistics only depend on (word,
count).  That makes the distributed part exactly one term-keyed
aggregate; the merge loop itself runs driver-side over a bounded
``top_words``-row dict (a real tokenizer trains on ~10^5-10^6 distinct
words however big the corpus is — at 100 TB the frequency table is the
only thing that scales, and it is capped by construction).

`bpe_encode` applies the learned merges corpus-side.  Merge application
is an inherently iterative per-word procedure no relational operator
expresses, so this is the documented Arrow-batch pandas-UDF slow path
(never per-row Python): the merge ranks ride the closure (n_merges
entries), and a per-batch word->encoding memo collapses the work to one
application per DISTINCT word per batch — Zipf makes that a small
fraction of token volume.

Training is deterministic: ties in pair count break lexicographically.
No SQL oracle exists for an iterative trainer (driver contract allows
omitting oracle_sql for iterative algorithms); pytest pins the merge
sequence and encodings against an independent pure-Python reference
(tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import sql_tokens

END = "</w>"  # end-of-word marker (Sennrich et al. 2016)


def word_counts(docs: DataFrame, top_words: int = 50_000) -> DataFrame:
    """(word, cnt): corpus word-frequency table capped to the top
    ``top_words`` by (cnt DESC, word ASC) — one partial-agg shuffle plus
    a TakeOrdered cut; the cap is what bounds the driver collect in
    `train_bpe` at any corpus size."""
    return (
        docs.select(F.explode(sql_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(top_words)
    )


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + cnt
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_counts(
    counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic BPE merge loop over a (word, count) iterable: repeatedly
    merge the most frequent adjacent symbol pair (tie: lexicographically
    smallest pair, so training is fully deterministic), up to
    ``n_merges`` or until no pair repeats.  Returns
    [(left, right, pair_count), ...] in merge order."""
    vocab = {tuple(w) + (END,): c for w, c in counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = _pair_stats(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        vocab = {_merge_word(s, (a, b)): c for s, c in vocab.items()}
    return merges


def train_bpe(
    docs: DataFrame, n_merges: int = 200, top_words: int = 50_000
) -> DataFrame:
    """Distributed word count -> driver-side merge loop -> merges table
    (rank, left, right, pair_count).  The only corpus-sized work is the
    word-frequency aggregate; the collect is bounded by ``top_words``."""
    rows = word_counts(docs, top_words).collect()
    merges = train_bpe_from_counts(
        ((r["word"], r["cnt"]) for r in rows), n_merges
    )
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (i + 1, a, b, c)
            for i, (a, b, c) in enumerate(merges)
        ],
        "rank long, left string, right string, pair_count long",
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (standard BPE inference:
    always merge the lowest-ranked applicable pair first)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame, merges: Sequence[tuple[str, str]]
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): corpus token counts under the
    trained tokenizer.  One Arrow-batched pandas UDF over the word
    arrays — per-batch word memo, merge ranks in the closure."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}

    @pandas_udf("long")
    def n_bpe(words: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def doc_tokens(ws) -> int:
            total = 0
            for w in ws:
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        return words.map(doc_tokens)

    d = docs.select("doc_id", sql_tokens().alias("_words"))
    return d.select(
        "doc_id",
        F.size("_words").cast("long").alias("n_words"),
        n_bpe("_words").alias("n_bpe_tokens"),
    )
