"""Vocabulary construction and per-document keyword extraction.

The tokenizer-prep side of a training-data pipeline: before training a
BPE/unigram tokenizer over a 100 TB corpus you build a word-frequency
table and decide the vocabulary size from its cumulative coverage curve
(`vocab_coverage`); per-document salient-term extraction (`tfidf_topk`)
is the classic TF-IDF ranking used for corpus exploration, topic
labelling, and weak supervision.

Both are pure DataFrame plans — explode + partial-aggregated groupBys,
one term-keyed equi-join, and a window only over provably tiny frames
(the top-V vocabulary rows, or one document's distinct terms).  No
Python UDFs anywhere; every expression has identical semantics in the
DuckDB oracle (driver entries vocab_coverage / tfidf_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import term_df, with_tokens


def _scalar(df: DataFrame):
    """A 1-row/1-column aggregate as a true scalar subquery Column
    (``DataFrame.scalar()``, Spark 4) — the engine evaluates the
    subquery once and inlines the value into the main plan.  No join of
    any kind (the previous ``crossJoin(broadcast(..))`` lowered to
    BroadcastNestedLoopJoin and tripped the no-cross-join plan audit;
    a constant-key equi-join folds straight back to nested-loop)."""
    return df.scalar()


def vocab_coverage(docs: DataFrame, v: int = 100) -> DataFrame:
    """Top-``v`` vocabulary by collection frequency with cumulative
    token coverage: (rank, term, cf, df, coverage).

    ``coverage`` at rank r is the fraction of ALL token occurrences in
    the corpus covered by the top r terms — the curve a tokenizer
    designer reads to pick a vocab size.  Deterministic order: cf DESC,
    term ASC.

    Scale shape: the term aggregate is one term-keyed shuffle with
    map-side partial aggregation (term_df); the top-V cut lowers to
    TakeOrderedAndProject (each partition ships only its local top V);
    the running-sum window then runs over exactly V rows on the driver
    side of the limit — a single-partition window is fine there because
    V is a user constant (~30k for a real tokenizer), never corpus-sized.
    The corpus-wide token total is a 1-row aggregate broadcast into the
    projection."""
    tdf = term_df(docs)
    total = _scalar(tdf.agg(F.sum("cf").cast("double").alias("_total")))
    top = tdf.orderBy(F.desc("cf"), "term").limit(v)
    w = Window.orderBy(F.desc("cf"), "term")
    return (
        top.select(
            F.row_number().over(w).cast("long").alias("rank"),
            "term",
            "cf",
            "df",
            F.round(
                F.sum("cf").over(w).cast("double") / total, 4
            ).alias("coverage"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int = 3, min_df: int = 1) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF: (doc_id, rank, term, tf,
    df, score) — score = tf * ln((N + 1) / (df + 1)), rounded to 4
    decimals, ranked score DESC then term ASC (the rounded score is the
    ranking key so the order is reproducible across engines).

    ``min_df`` drops hapax/noise terms from the IDF table before the
    join when > 1 — at 100 TB the long tail of df=1 terms dominates the
    vocabulary row count and a keyword extractor never wants them.

    Scale shape: tf is an explode + (doc_id, term)-keyed groupBy
    (map-side partial agg, no hot keys — a key is one document's one
    term); df is derived FROM the tf table by a term-keyed count, so
    the corpus is tokenized exactly once; the tf-to-df equi-join
    shuffles on term where the df side carries one row per term (AQE
    splits any skewed probe partitions); the final top-k window
    partitions by doc_id, bounded by one document's distinct-term
    count.  N (total docs) is a 1-row broadcast scalar.

    tf is persisted MEMORY_AND_DISK: it feeds both the probe side and
    the df aggregate, and Spark's exchange reuse does not fire across
    the broadcast boundary (verified on the executed plan), so an
    unpersisted tf re-runs the tokenize+explode+aggregate pass once per
    consumer.  Release handle: result._joie_persisted (the shared
    convention).  At 100 TB the same structure writes tf to storage
    once."""
    from pyspark.storagelevel import StorageLevel

    d = with_tokens(docs)
    tf = (
        d.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if min_df > 1:
        df_t = df_t.where(F.col("df") >= min_df)
    n_docs = _scalar(
        docs.agg(F.countDistinct("doc_id").cast("double").alias("_n"))
    )
    scored = tf.join(df_t, "term").withColumn(
        "score",
        F.round(
            F.col("tf").cast("double")
            * F.log(
                (n_docs + F.lit(1.0))
                / (F.col("df").cast("double") + F.lit(1.0))
            ),
            4,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )
    out._joie_persisted = tf  # release handle (freed on GC otherwise)
    return out
