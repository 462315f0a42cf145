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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decontaminate import benchmark_ngrams
from .dedup import deduped_corpus, shingles
from .sampling import with_split
from .text import bind_col, ngram_array, sql_tokens, with_tokens


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
    # gate signals behind bind_col barriers (text.bind_col): tokens, the
    # 2-gram array, and the three gate scalars each evaluate ONCE per
    # row — without the barriers, filter pushdown inlines the whole
    # tokenize+zip_with chain into the predicate once per reference
    # (guide §2.3/§4.4; measured 9.9s -> 2.1s for this scan at sf1.0)
    d = bind_col(docs, "tokens", sql_tokens())
    d = bind_col(d, "_g2", ngram_array(2))
    d = bind_col(
        d,
        "_gate",
        F.struct(
            F.size("tokens").alias("n_tok"),
            F.size("_g2").alias("n_g2"),
            F.size(F.array_distinct("_g2")).alias("nd_g2"),
        ),
    )
    n_g2 = F.col("_gate.n_g2")
    dup2 = F.round(
        F.when(
            n_g2 > 0,
            (n_g2 - F.col("_gate.nd_g2")).cast("double") / n_g2,
        ).otherwise(F.lit(0.0)),
        4,
    )
    gated = d.where(
        (F.col("_gate.n_tok") >= min_tokens)
        & (dup2 <= F.lit(float(max_dup_2gram)))
    ).drop("_g2", "_gate")
    # contamination detection reuses the barrier-bound tokens column
    # (contamination_hits would re-tokenize); same grams, same hits
    grams = shingles(gated, decon_ngram).select(
        "doc_id", F.explode("shingles").alias("g")
    )
    bad = (
        grams.join(F.broadcast(benchmark_ngrams(bench, decon_ngram)), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").cast("long").alias("n_hits"))
        .where(F.col("n_hits") >= 1)
        .select("doc_id")
    )
    gated = gated.drop("tokens")
    decon = gated.join(F.broadcast(bad), "doc_id", "left_anti")
    deduped = deduped_corpus(decon, pairs)
    return with_split(deduped, weights)


# Gopher rule thresholds (Rae et al. 2021 Table A1, restricted to the
# signals this engine computes map-side; the top-n-gram dominance rule
# needs a per-doc mode aggregation and is layered separately via
# text.top_ngram_share when wanted).  (rule_name, default) pairs are the
# single source of truth for the driver oracle.
GOPHER_DEFAULTS = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_tok_len": 3.0,
    "max_mean_tok_len": 10.0,
    "min_stopword_ratio": 0.01,
    "min_alnum_ratio": 0.5,
    "max_dup_line_frac": 0.30,
    "max_dup_5gram_frac": 0.15,
}


def gopher_filter(docs: DataFrame, **overrides) -> DataFrame:
    """Gopher-style composite quality filter: (doc_id, keep, reasons).

    `reasons` is a comma-joined, fixed-order list of every rule the
    document fails (empty string when it passes all) — the audit trail a
    pipeline logs so filtering decisions are explainable; `keep` is
    reasons == ''.  Rules: token-count bounds, mean token length
    window, stopword floor, alphanumeric-character floor, duplicate-line
    and duplicate-5-gram ceilings (thresholds overridable by keyword;
    defaults in GOPHER_DEFAULTS).

    Everything is array arithmetic inside the scan's codegen stage —
    zero shuffles at any corpus size, same shape as
    `text.repetition_stats`.  Comparisons run on the UNROUNDED ratios
    (single IEEE divisions of exact integer counts — bit-identical in
    the DuckDB oracle, driver entry gopher_filter)."""
    return _with_gopher_reasons(docs, overrides).select(
        "doc_id",
        (F.col("reasons") == "").alias("keep"),
        "reasons",
    )


def _with_gopher_reasons(docs: DataFrame, overrides: dict) -> DataFrame:
    p = dict(GOPHER_DEFAULTS)
    unknown = set(overrides) - set(p)
    if unknown:
        raise ValueError(f"unknown gopher_filter thresholds: {sorted(unknown)}")
    p.update(overrides)

    from .text import STOPWORDS, ngram_array

    d = with_tokens(docs)
    n_tok = F.size("tokens").cast("double")
    alnum = F.length(F.concat_ws("", F.col("tokens"))).cast("double")
    mean_len = alnum / F.greatest(n_tok, F.lit(1.0))
    stop_sql = ",".join(repr(s) for s in STOPWORDS)
    stop_ratio = F.size(
        F.expr(f"filter(tokens, t -> array_contains(array({stop_sql}), t))")
    ).cast("double") / F.greatest(n_tok, F.lit(1.0))
    alnum_ratio = alnum / F.greatest(F.length("text").cast("double"), F.lit(1.0))

    def dup_frac(arr) -> Column:
        n = F.size(arr).cast("double")
        nd = F.size(F.array_distinct(arr)).cast("double")
        return F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0))

    lines = F.split(F.col("text"), "\n")
    rules = [
        ("too_short", n_tok < p["min_tokens"]),
        ("too_long", n_tok > p["max_tokens"]),
        (
            "tok_len",
            (mean_len < p["min_mean_tok_len"])
            | (mean_len > p["max_mean_tok_len"]),
        ),
        ("no_stopwords", stop_ratio < p["min_stopword_ratio"]),
        ("symbols", alnum_ratio < p["min_alnum_ratio"]),
        ("dup_lines", dup_frac(lines) > p["max_dup_line_frac"]),
        ("dup_5grams", dup_frac(ngram_array(5)) > p["max_dup_5gram_frac"]),
    ]
    reasons = F.array_join(
        F.filter(
            F.array(*[F.when(cond, F.lit(name)) for name, cond in rules]),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return d.withColumn("reasons", reasons)


def gopher_corpus(docs: DataFrame, **overrides) -> DataFrame:
    """The corpus minus Gopher-rule failures — the keep predicate is
    inlined on the scan (pure filter, no join, zero shuffles)."""
    return (
        _with_gopher_reasons(docs, overrides)
        .where(F.col("reasons") == "")
        .select(*docs.columns)
    )
