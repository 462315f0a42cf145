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


# ---------------------------------------------------------------------------
# semantic (embedding-space) decontamination


def semantic_hits(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    tau: float = 0.8,
    n_bits: int = 8,
    dim: int = 64,
    probe_hamming: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Embedding-space contamination: corpus vectors whose cosine vs ANY
    eval-set vector ≥ `tau` → (vec_id, eval_id, cos) with the best
    (max-cos, min-eval_id) witness per corpus vector.  The semantic
    complement of the n-gram recipe above — catches paraphrased or
    reformatted eval leakage that shares no exact n-gram.

    Spark-first shape (the corpus is never shuffled against itself):
    both sides get a hyperplane-LSH signature in the scan projection;
    the EVAL side (benchmark-sized by construction) explodes into its
    multi-probe bucket set (identity + every signature within Hamming ≤
    `probe_hamming`) and is BROADCAST; candidates are a signature
    equi-join, verified by exact cosine.  Recall is the LSH collision
    bound — near-identical vectors (the contamination case) agree on
    almost every hyperplane, and multi-probe covers the flipped-bit
    remainder; raise probe_hamming for more recall at linear probe-set
    cost.  `portable=True` swaps the xxhash64-derived hyperplanes for
    the md5-parity portable set (pipeline/ann.py) so the whole pipeline
    is DuckDB-oracle-checkable (driver entry sem_decon_hits)."""
    from . import ann

    if not 0 < tau <= 1:
        raise ValueError("tau must be in (0, 1]")
    if portable:
        H = ann.portable_hyperplane_components(n_bits, dim)
        sig_sql = ann.portable_signature_sql(
            H, "embedding", "CAST(element_at({v}, {i}) AS DOUBLE)"
        )
        sig = F.expr(sig_sql)
    else:
        sig = ann.hyperplane_signature("embedding", n_bits=n_bits, dim=dim)

    masks = [0] + [1 << i for i in range(n_bits)]
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        ]
    c = corpus_emb.select(
        F.col("vec_id"), F.col("embedding"), sig.cast("long").alias("sig")
    )
    e = eval_emb.select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("eval_embedding"),
        sig.cast("long").alias("esig"),
    ).select(
        "eval_id",
        "eval_embedding",
        F.explode(
            F.array(*[F.expr(f"esig ^ {m}") for m in masks])
        ).alias("sig"),
    )
    cand = c.join(F.broadcast(e), "sig")
    cos = ann.cosine_expr(F.col("embedding"), F.col("eval_embedding"))
    verified = cand.select(
        "vec_id", "eval_id", cos.alias("cos_raw")
    ).where(F.col("cos_raw") >= float(tau))
    best = (
        verified.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("cos_raw"), (-F.col("eval_id")).alias("nei"))
            ).alias("b")
        )
        .select(
            "vec_id",
            (-F.col("b.nei")).cast("long").alias("eval_id"),
            F.round("b.cos_raw", 4).alias("cos"),
        )
    )
    return best.orderBy("vec_id")


def semantic_decontaminated(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    tau: float = 0.8,
    **kw,
) -> DataFrame:
    """The corpus minus semantic hits — broadcast anti-join of the
    (small) flagged-id set, same purge shape as decontaminated_corpus."""
    bad = semantic_hits(corpus_emb, eval_emb, tau=tau, **kw).select("vec_id")
    return corpus_emb.join(F.broadcast(bad), "vec_id", "left_anti")
