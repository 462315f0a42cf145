"""The composed C4-style cleaning pipeline — every stage already exists
as an operator in this package; this module chains them into the ONE
declarative plan a user actually materializes before training:

    quality gate -> repetition gate -> benchmark decontamination
                 -> near-dup removal -> deterministic split

Plan shape at 100 TB: the quality/repetition gates are scan-stage
expressions (zero shuffle), decontamination and dedup each contribute
one broadcast anti-join (eval n-gram set / cluster-loser set — both
small by construction), and the split is a map-side hash.  The corpus
is scanned once and never shuffled.

Split leakage note: because near-dup losers are dropped FIRST, every
surviving duplicate cluster is just its representative, so the plain
per-doc split here is already leakage-safe — cluster_safe_split is for
pipelines that keep duplicates (e.g. epoch-weighted mixtures over
sources with intentional repetition).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontaminate import contamination_hits
from .dedup import deduped_corpus
from .sampling import with_split
from .text import with_tokens


def clean_corpus(
    docs: DataFrame,
    bench: DataFrame,
    pairs: DataFrame,
    min_tokens: int = 15,
    max_dup_2gram: float = 0.08,
    decon_ngram: int = 4,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> DataFrame:
    """Materialize the cleaned, decontaminated, deduped, split corpus.

    `bench` is the eval set to scrub against; `pairs` any (a, b)
    near-dup pair source (minhash_lsh_verified at scale,
    ngram_jaccard_pairs for the oracle).  Thresholds are corpus-tuned
    by the caller; defaults drop the short-doc and repetitive tails.
    """
    d = with_tokens(docs)
    n_tok = F.size("tokens")
    g2 = F.expr(
        "CASE WHEN size(tokens) < 2 THEN array()"
        " ELSE transform(sequence(0, size(tokens) - 2),"
        " i -> concat_ws(' ', slice(tokens, i + 1, 2))) END"
    )
    n_g2 = F.size(g2)
    dup2 = F.round(
        F.when(
            n_g2 > 0,
            (n_g2 - F.size(F.array_distinct(g2))).cast("double") / n_g2,
        ).otherwise(F.lit(0.0)),
        4,
    )
    gated = d.where(
        (n_tok >= min_tokens) & (dup2 <= F.lit(float(max_dup_2gram)))
    ).drop("tokens")
    bad = contamination_hits(gated, bench, n=decon_ngram).select("doc_id")
    decon = gated.join(F.broadcast(bad), "doc_id", "left_anti")
    deduped = deduped_corpus(decon, pairs)
    return with_split(deduped, weights)
