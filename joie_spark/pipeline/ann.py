"""Approximate-nearest-neighbour search over embedding columns.

  * brute-force cosine top-k: the exact baseline — a JVM-side fold for
    the dot product (F.aggregate over zip_with), then
    TakeOrderedAndProject for top-k.  O(N) per query but fully
    distributed; correct reference for the bucketed variants.
  * LSH-bucketed (random hyperplane signs): each vector gets a P-bit
    signature from sign(dot(v, h_p)) with deterministic pseudo-random
    hyperplanes derived from xxhash64 — candidates share the signature
    bucket, turning full scans into a bucket equi-join at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Sequential left-fold dot product in float64 (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(F.col("embedding"), q)
    return (
        emb.select("vec_id", F.round(sim, 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplane_signature(vec: str | Column, n_bits: int = 16, dim: int = 64) -> Column:
    """Deterministic random-hyperplane signature.

    Hyperplane p's component j is a pseudo-random ±1 derived from
    xxhash64(p, j) — reproducible across runs/cluster sizes with no
    stored model.  sign(dot(v, h_p)) gives bit p."""
    bits = []
    for p in range(n_bits):
        comps = F.array(
            *[
                F.when(
                    F.xxhash64(F.lit(f"{p}:{j}")) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                for j in range(dim)
            ]
        )
        d = F.aggregate(
            F.zip_with(vec, comps, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_bucketed_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, n_bits: int = 8
) -> DataFrame:
    """Bucketed ANN: restrict the exact scan to vectors sharing the query's
    hyperplane bucket.  Recall < 1 by construction (approximate); at scale
    the bucket column is a partition key so the scan prunes."""
    dim = len(query_vec)
    sigs = emb.withColumn(
        "bucket", hyperplane_signature(F.col("embedding"), n_bits, dim)
    )
    qdf = emb.sparkSession.createDataFrame([(query_vec,)], "qv array<double>")
    qsig = qdf.select(
        hyperplane_signature(F.col("qv"), n_bits, dim).alias("b")
    ).collect()[0]["b"]
    cand = sigs.where(F.col("bucket") == qsig)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(F.col("embedding"), q)
    return (
        cand.select("vec_id", F.round(sim, 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
