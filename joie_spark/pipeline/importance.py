"""DSIR-style importance weighting for targeted data selection.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) ranks raw-corpus documents by how much more likely
they are under a small TARGET distribution (the domain you want more
of) than under the RAW distribution, using hashed n-gram bag-of-words
models:

  - features: word unigrams + bigrams, hashed into B buckets,
  - per-bucket probabilities from Laplace-smoothed counts,
  - per-doc log importance weight  sum_g [ ln p_target(b(g)) -
    ln p_raw(b(g)) ]  over the doc's gram OCCURRENCES,
  - select the top documents by weight.

Spark-first shape (the corpus is scanned twice, shuffled never):

1. **Bucket distributions** — one explode+groupBy over each side; the
   result is exactly B rows per side (B ~ 1e3-1e5), so map-side partial
   aggregation collapses everything before the shuffle and the
   log-ratio table is trivially broadcastable.
2. **Per-doc weights** — explode the corpus grams, broadcast-join the
   B-row ratio table, groupBy(doc_id) sum.  The only corpus-sized
   shuffle is keyed by doc_id (uniform, no hot keys).
3. **Selection** — deterministic top-k by MEAN log weight (sum/n_grams;
   the raw sum is also emitted but monotonically favours long documents
   — the mean is the length-debiased rank DSIR's resampling step
   approximates), doc_id tiebreak; orderBy+limit compiles to
   TakeOrderedAndProject, never a global sort.

The bucket hash is the md5-portable recipe shared with
`sampling._uniform`, so the ENTIRE computation — hash, smoothing, ln —
runs verbatim in the DuckDB oracle (driver entries ``dsir_weights`` /
``dsir_select``).  Weights are rounded to 4 decimals: ln is the one
transcendental in the engine's oracle surface, and last-ulp libm
differences must not fail the value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import with_tokens


def _grams(docs: DataFrame, ns: tuple[int, ...] = (1, 2)) -> DataFrame:
    """(doc_id, g): word n-gram occurrences (not distinct), JVM-side —
    the shared zip_with-chain gram shape (text.ngram_sql; n=1 is the
    token array itself)."""
    from .text import ngram_sql

    d = with_tokens(docs)
    parts = [ngram_sql(n) for n in ns]
    grams = parts[0] if len(parts) == 1 else f"concat({', '.join(parts)})"
    return d.select("doc_id", F.explode(F.expr(grams)).alias("g"))


def bucket_of(
    col: Column, n_buckets: int, salt: str = "dsir", portable: bool = True
) -> Column:
    """Deterministic bucket in [0, n_buckets).

    portable=True (default, every driver-oracled entry): top 60 bits of
    md5(salt ':' gram) mod B — identical expression in DuckDB
    (('0x' || substr(md5(..), 1, 15))::BIGINT % B).
    portable=False: pmod(xxhash64(salt ':' gram), B) — the JVM-native
    production hash (same fast/portable split as dedup._hash64_sql; the
    fast path gets rows-only driver checks, its statistics are pinned to
    the portable twin by the pipeline pytests)."""
    tagged = F.concat(F.lit(salt + ":"), col)
    if portable:
        h = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
        return (h % n_buckets).alias("bucket")
    return F.pmod(F.xxhash64(tagged), F.lit(n_buckets)).alias("bucket")


def bucket_counts(
    docs: DataFrame,
    n_buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    portable: bool = True,
) -> DataFrame:
    """(bucket, c): hashed-gram occurrence counts — B rows, the
    bag-of-hashed-ngrams model of one side."""
    return (
        _grams(docs, ns)
        .select(bucket_of(F.col("g"), n_buckets, portable=portable))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def bucket_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    portable: bool = True,
) -> DataFrame:
    """(bucket, log_ratio): ln p_target(b) - ln p_raw(b) with add-one
    (Laplace) smoothing over the B-bucket vocabulary, for ALL B buckets
    (unseen buckets get the smoothed floor on both sides).  B rows —
    always broadcastable."""
    t = bucket_counts(target, n_buckets, ns, portable=portable)
    r = bucket_counts(raw, n_buckets, ns, portable=portable)
    return _log_ratio_from_counts(t, r, raw.sparkSession, n_buckets)


def _log_ratio_from_counts(
    t: DataFrame, r: DataFrame, spark, n_buckets: int
) -> DataFrame:
    """bucket_log_ratio's tail over precomputed (bucket, c) count tables
    — lets importance_weights derive the raw-side counts from its own
    persisted gram pass instead of re-tokenizing the pool."""
    full = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(t.withColumnRenamed("c", "ct"), "bucket", "left")
        .join(r.withColumnRenamed("c", "cr"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    # smoothing totals: a single-partition window over the B-row frame —
    # bounded by construction (exactly n_buckets rows whatever the corpus
    # size), so the "all data to one partition" shape is safe here and
    # avoids a BroadcastNestedLoopJoin scalar attach
    wall = Window.partitionBy()
    full = full.withColumn("_tt", F.sum("ct").over(wall)).withColumn(
        "_tr", F.sum("cr").over(wall)
    )
    lt = F.log((F.col("ct") + 1).cast("double")) - F.log(
        (F.col("_tt") + n_buckets).cast("double")
    )
    lr = F.log((F.col("cr") + 1).cast("double")) - F.log(
        (F.col("_tr") + n_buckets).cast("double")
    )
    return full.select("bucket", (lt - lr).alias("log_ratio"))


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    portable: bool = True,
) -> DataFrame:
    """(doc_id, n_grams, log_w, avg_log_w): per-document DSIR importance
    weight over `docs` (the raw pool), targeting `target`'s hashed-gram
    distribution.  `log_w` is the paper's sum over occurrences;
    `avg_log_w` (= log_w / n_grams, 0.0 for gram-less docs) is the
    length-debiased variant selection uses.  Rounded to 4 decimals for
    oracle portability (see module docstring)."""
    # The pool's hashed gram pass runs ONCE: (doc_id, bucket) is
    # persisted and feeds both the raw-side model counts and the per-doc
    # weight aggregation — unpersisted, the tokenize+gram+hash scan of
    # the pool ran twice (model + scoring).  Release handle:
    # result._joie_persisted (at 100 TB the same structure writes the
    # bucketed gram table once).
    from pyspark.storagelevel import StorageLevel

    pool_buckets = (
        _grams(docs, ns)
        .select("doc_id", bucket_of(F.col("g"), n_buckets, portable=portable))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = bucket_counts(target, n_buckets, ns, portable=portable)
    r = pool_buckets.groupBy("bucket").agg(
        F.count("*").cast("long").alias("c")
    )
    ratio = _log_ratio_from_counts(t, r, docs.sparkSession, n_buckets)
    per_doc = (
        pool_buckets
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("log_ratio").alias("_lw"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce("_lw", F.lit(0.0)), 4).alias("log_w"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.col("_lw") / F.col("n_grams").cast("double"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("avg_log_w"),
        )
    )
    out._joie_persisted = pool_buckets  # release handle
    return out


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    portable: bool = True,
) -> DataFrame:
    """The k raw-pool documents most target-like by mean log importance
    weight (deterministic: avg_log_w DESC, doc_id ASC tiebreak).
    orderBy+limit -> TakeOrderedAndProject: each partition ships only
    its local top-k to the driver-side heap, never a global sort."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = importance_weights(docs, target, n_buckets, ns, portable=portable)
    out = (
        docs.join(w, "doc_id")
        .orderBy(F.col("avg_log_w").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "source", "n_grams", "log_w", "avg_log_w")
    )
    out._joie_persisted = w._joie_persisted  # shared pool gram cache
    return out
