"""CCNet-style perplexity filtering over a hashed-bigram language model.

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data") scores every document's perplexity under a language
model trained on a trusted reference corpus (Wikipedia in the paper) and
splits the corpus into head / middle / tail quality tiers at the tercile
cuts — low perplexity means reference-like text.  CCNet uses a KenLM
5-gram model; this engine's Spark-native stand-in is a HASHED BIGRAM
model with Laplace smoothing (the hashing trick shared with
pipeline/importance.py — feature hashing makes the model a fixed B-row
table whatever the vocabulary, the same move DSIR makes):

    p(w_i | w_{i-1}) = (c_bi(b2(w_{i-1} w_i)) + 1)
                       / (c_uni(b1(w_{i-1})) + B2)

    log_ppl(doc) = -(1/n) * Σ ln p        ppl = exp(log_ppl)

Spark-first shape (mirrors importance.py, same scale argument):
  * model training = two explode+groupBy passes over the REFERENCE
    corpus; map-side partial aggregation collapses each to ≤B rows, so
    both count tables broadcast.
  * scoring = explode the corpus bigrams, TWO broadcast joins (bigram
    bucket → c_bi, context bucket → c_uni), groupBy(doc_id) — the only
    corpus-sized shuffle keys on doc_id (uniform).
  * tiering: production derives the cuts with approxQuantile (one cheap
    driver-side pass, `ppl_cuts`); `ppl_tiers` takes the cut values
    explicitly so the assignment itself is a pure scan-stage CASE (and
    oracle-portable with pinned cuts).

The bucket hash is the md5-portable recipe (importance.bucket_of), so
the WHOLE computation — hash, smoothing, ln, exp — runs verbatim in the
DuckDB oracle; ppl is rounded to 4 decimals (libm last-ulp guard, the
DSIR convention).  Hash collisions make the model approximate in the
same way DSIR's buckets are — that is the documented trade of the
hashing trick, not a bug; B controls it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .importance import bucket_of
from .text import with_tokens

UNI_BUCKETS = 1024
BI_BUCKETS = 4096


def _unigrams(docs: DataFrame) -> DataFrame:
    return with_tokens(docs).select(
        "doc_id", F.explode("tokens").alias("g")
    )


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, ctx, g): bigram occurrences with their context word —
    zip_with over the two shifted token views (the measured-fast shape
    from importance._grams)."""
    d = with_tokens(docs)
    pairs = F.expr(
        "CASE WHEN size(tokens) < 2 THEN array()"
        " ELSE zip_with(slice(tokens, 1, size(tokens) - 1),"
        " slice(tokens, 2, size(tokens) - 1),"
        " (a, b) -> struct(a AS ctx, concat(a, ' ', b) AS g)) END"
    )
    e = d.select("doc_id", F.explode(pairs).alias("p"))
    return e.select("doc_id", F.col("p.ctx").alias("ctx"), F.col("p.g").alias("g"))


def bigram_model(
    reference: DataFrame,
    uni_buckets: int = UNI_BUCKETS,
    bi_buckets: int = BI_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """(uni, bi) hashed count tables of the reference corpus — at most
    `uni_buckets` and `bi_buckets` rows respectively (feature hashing:
    model size is fixed whatever the vocabulary), both broadcastable.

    Deliberately TWO lazy aggregates, not one shared pass (round-6
    measurement): both land as broadcast-exchange subtrees of the ONE
    scoring job and execute in parallel with the corpus scan, so a
    "fused" eager one-pass variant (tagged explode + driver collect)
    measured ~8% SLOWER — it serializes model building in front of the
    job instead of hiding it inside it."""
    uni = (
        _unigrams(reference)
        .select(bucket_of(F.col("g"), uni_buckets, salt="ppl1"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    bi = (
        _bigrams(reference)
        .select(bucket_of(F.col("g"), bi_buckets, salt="ppl2"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cb"))
    )
    return uni, bi


def ppl_score(
    docs: DataFrame,
    reference: DataFrame,
    uni_buckets: int = UNI_BUCKETS,
    bi_buckets: int = BI_BUCKETS,
) -> DataFrame:
    """(doc_id, n_bigrams, ppl): per-document perplexity under the
    hashed-bigram reference model, rounded to 4.  Documents with fewer
    than two tokens have no bigrams — their ppl is NULL (no evidence
    either way; CCNet drops such fragments at an earlier length gate)."""
    uni, bi = bigram_model(reference, uni_buckets, bi_buckets)
    grams = _bigrams(docs).select(
        "doc_id",
        bucket_of(F.col("ctx"), uni_buckets, salt="ppl1").alias("ub"),
        bucket_of(F.col("g"), bi_buckets, salt="ppl2").alias("bb"),
    )
    lp = (
        grams.join(
            F.broadcast(bi.withColumnRenamed("bucket", "bb")), "bb", "left"
        )
        .join(F.broadcast(uni.withColumnRenamed("bucket", "ub")), "ub", "left")
        .select(
            "doc_id",
            (
                F.log((F.coalesce("cb", F.lit(0)) + 1).cast("double"))
                - F.log(
                    (F.coalesce("cu", F.lit(0)) + bi_buckets).cast("double")
                )
            ).alias("lp"),
        )
    )
    per_doc = lp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").alias("_slp"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(-F.col("_slp") / F.col("n_bigrams").cast("double")), 4
            ).alias("ppl"),
        )
    )


def ppl_cuts(
    scored: DataFrame, probabilities: tuple[float, float] = (1 / 3, 2 / 3)
) -> tuple[float, float]:
    """The head/middle and middle/tail perplexity cut values — one
    approxQuantile pass (driver-side, two doubles back; the scale path:
    never a global sort).  CCNet uses the terciles."""
    lo, hi = scored.where(F.col("ppl").isNotNull()).approxQuantile(
        "ppl", list(probabilities), 0.001
    )
    return float(lo), float(hi)


def ppl_tiers(
    scored: DataFrame, head_cut: float, tail_cut: float
) -> DataFrame:
    """(doc_id, n_bigrams, ppl, tier): CCNet's head/middle/tail split at
    EXPLICIT cut values — a pure scan-stage CASE (zero shuffles beyond
    the score itself); bigram-less docs tier as 'tail' (no evidence of
    reference-likeness).  head = most reference-like (lowest ppl)."""
    return scored.select(
        "doc_id",
        "n_bigrams",
        "ppl",
        F.when(F.col("ppl").isNull(), F.lit("tail"))
        .when(F.col("ppl") <= F.lit(float(head_cut)), F.lit("head"))
        .when(F.col("ppl") <= F.lit(float(tail_cut)), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("tier"),
    )
