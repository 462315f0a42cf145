"""Benchmark decontamination for training-data pipelines.

A training corpus must not contain its evaluation set.  The standard
published recipe (GPT-3 appendix C, and its descendants) flags a
training document as contaminated when it shares at least one word
n-gram with any benchmark/eval document, then drops the flagged docs
before training.

Spark-first shape — the corpus is NEVER shuffled:

- The benchmark side is small by construction (eval sets are thousands
  of documents, not billions), so its distinct n-gram set is broadcast.
- Detection is one scan over the corpus: n-grams are generated JVM-side
  (the same ``transform(sequence(...))`` expression as
  :func:`joie_spark.pipeline.dedup.shingles` — whole-stage codegen, no
  Python), exploded, and broadcast-hash-joined against the benchmark
  set.  The per-doc aggregation shuffles only the HIT rows (a tiny
  fraction of the corpus), never the corpus itself.
- The purge is a broadcast anti-join of the (small) contaminated-id set
  against the corpus — identical scale shape to
  :func:`joie_spark.pipeline.dedup.deduped_corpus` and the engine's
  tombstone filter.

At 100 TB with a 50k-doc benchmark this is one map-side pass plus two
broadcast joins; ``min_hits`` > 1 loosens the rule for short n / noisy
tokenization without changing the plan.

All expressions are SQL-portable: the DuckDB oracle evaluates the
identical tokenizer + n-gram recipe (driver entries ``decon_hits`` /
``decon_corpus``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles
from .text import sql_tokens


def benchmark_ngrams(bench: DataFrame, n: int = 4) -> DataFrame:
    """Distinct word n-grams of the benchmark set — the broadcast side.

    One column ``g``.  Size is O(benchmark tokens), independent of the
    training-corpus size.
    """
    sh = shingles(bench.withColumn("tokens", sql_tokens()), n)
    return sh.select(F.explode("shingles").alias("g")).distinct()


def contamination_hits(
    docs: DataFrame, bench: DataFrame, n: int = 4, min_hits: int = 1
) -> DataFrame:
    """(doc_id, n_hits): training docs sharing >= min_hits distinct
    n-grams with any benchmark document.

    ``docs`` is the training pool (must not itself contain the benchmark
    rows — the caller splits).  The benchmark n-gram set is broadcast,
    so the corpus scan is map-side; only hit rows reach the groupBy.
    """
    grams = shingles(docs.withColumn("tokens", sql_tokens()), n).select(
        "doc_id", F.explode("shingles").alias("g")
    )
    hits = grams.join(F.broadcast(benchmark_ngrams(bench, n)), "g")
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("g").cast("long").alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )


def decontaminated_corpus(
    docs: DataFrame, bench: DataFrame, n: int = 4, min_hits: int = 1
) -> DataFrame:
    """The training corpus minus contaminated documents — what the
    pipeline actually materializes.  Broadcast anti-join of the (small)
    contaminated-id set; the corpus keeps its scan partitioning."""
    bad = contamination_hits(docs, bench, n, min_hits).select("doc_id")
    return docs.join(F.broadcast(bad), "doc_id", "left_anti")
