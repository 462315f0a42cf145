"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (arXiv:2303.09540): cluster the corpus
embeddings with a k-means coarse quantizer, then search for semantic
duplicates ONLY within each cluster — pairwise cost drops from O(n²) to
Σ|cell|², and the cell id is the shuffle key, so each cluster's pair
search is one co-partitioned self-join.  Within a cluster the reference
implementation sorts members by similarity-to-centroid and drops every
member that has cosine ≥ eps with ANY member earlier in that order
(kept or not) — keeping the LOW-centroid-similarity extreme of each
duplicate group, which the paper found preserves the most information.
That greedy is purely pairwise (no connected components, no iteration),
so it maps to one relational predicate:

    drop b  ⇔  ∃ a in the same cell with
               (cc(a), a) < (cc(b), b)  and  cos(a, b) ≥ eps

where cc(x) = cosine(x, centroid of x's cell), ascending, ties by
vec_id.  No window function needed — the tuple order IS the sort.

Scale shape (100 TB):
  * centroids: trained driver-side on a deterministic sample (the
    shared `_kmeans_core`, same as IVF ANN) — k grows with the corpus
    (the paper uses k ≈ 100k for 100M points) so cells stay bounded and
    the per-cell self-join never degenerates toward n².
  * assignment: one Arrow-batched pandas UDF pass (numpy matmul per
    batch), or the portable-SQL argmax twin for oracle checking.
  * pair search: equi-join on `cell` — a single shuffle keyed by cell;
    the ordering + threshold predicates evaluate scan-side after the
    hash match, inside whole-stage codegen (F.aggregate dot folds).
  * drops are a tiny distinct set → broadcast anti-join; the corpus is
    never shuffled (same contract as dedup.deduped_corpus).

Reference parity note: joie itself has no embedding ops — this is part
of the training-data-pipeline surface the task brief adds on top of the
reference's operator set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import (
    dot_expr,
    make_ivf_assign_udf,
    norm_expr,
    portable_argmax_case,
    portable_dot_sql,
)

_SPARK_ELEM = "CAST(element_at({v}, {i}) AS DOUBLE)"


def with_cells_and_ccos(
    emb: DataFrame, C: np.ndarray, portable: bool = False
) -> DataFrame:
    """(vec_id, embedding, cell, ccr): k-means cell id plus the member's
    cosine to its own centroid, rounded to 4 (the order key — rounding
    makes the order reproducible across engines, same contract as every
    cosine this pipeline emits).

    Fast path: Arrow-batched argmax UDF for the cell, then one JVM-side
    fold against `element_at` into the centroid literal matrix.
    Portable path: the IVF recipe — left-assoc dot chains per centroid
    (portable_dot_sql) + first-index-wins argmax CASE — every step
    reproducible in DuckDB.  Centroids are unit-norm (kmeans_centroids
    guarantees it), so cosine(e, C[cell]) = dot / |e|."""
    n_cells = C.shape[0]
    if portable:
        d_cols = [
            F.expr(portable_dot_sql(C[c], "embedding", _SPARK_ELEM)).alias(f"_d{c}")
            for c in range(n_cells)
        ]
        m = emb.select("vec_id", "embedding", *d_cols).withColumn(
            "cell", F.expr(portable_argmax_case(n_cells, "_d{i}"))
        )
        dcell = F.expr(
            "CASE "
            + " ".join(f"WHEN cell = {c} THEN _d{c}" for c in range(n_cells))
            + " END"
        )
    else:
        m = emb.withColumn("cell", make_ivf_assign_udf(C)(F.col("embedding")))
        c_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in row]) for row in C]
        )
        dcell = dot_expr(F.col("embedding"), F.element_at(c_lit, F.col("cell") + 1))
    # the row's norm is projected ONCE here so the pair join downstream
    # can compute cosine as dot/(na*nb) — bit-identical arithmetic to
    # cosine_expr (same sqrt-of-fold, same product, same division) but
    # the two O(d) norm folds run n times instead of once per PAIR
    nrm = norm_expr(F.col("embedding"))
    ccr = F.round(dcell / nrm, 4)
    return m.select(
        "vec_id", "embedding", "cell", ccr.alias("ccr"), nrm.alias("nrm")
    )


def semdedup_drops(
    emb: DataFrame,
    C: np.ndarray,
    threshold: float = 0.95,
    portable: bool = False,
) -> DataFrame:
    """The dropped members: (vec_id, cell, witness) — `witness` is the
    smallest earlier-ordered vec_id whose cosine with this member is
    ≥ threshold (the explainability trail: WHY was this row dropped).

    One equi-join on cell; the (ccr, vec_id) tuple order and the rounded
    cosine threshold are post-match predicates.  Deterministic across
    runs, cluster sizes, and engines (both the order key and the cosine
    compare at 4 decimals).

    Join parallelism (guide §2.5): `cell` alone has only k distinct
    values — with the paper-small k of the test corpora every pair
    evaluation lands on ≤ k tasks however many cores exist.  The b side
    is therefore salted with pmod(vec_id, S) and the a side replicated
    across all S salts: the pair set is untouched (pair (a,b) appears
    exactly at salt pmod(b, S)) but the Σ|cell|² dot-product work spreads
    over k·S tasks.  Per-pair cosine reuses the per-row norms projected
    by with_cells_and_ccos (dot/(na·nb) — bit-identical to cosine_expr)."""
    n_salts = 16
    m = with_cells_and_ccos(emb, C, portable=portable)
    a = m.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("ea"),
        "cell",
        F.col("ccr").alias("cca"),
        F.col("nrm").alias("na"),
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("salt"),
    )
    b = m.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
        "cell",
        F.col("ccr").alias("ccb"),
        F.col("nrm").alias("nb"),
        F.pmod(F.col("vec_id"), F.lit(n_salts)).cast("int").alias("salt"),
    )
    cos = F.round(dot_expr(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4)
    pairs = a.join(b, ["cell", "salt"]).where(
        (F.struct(F.col("cca"), F.col("a")) < F.struct(F.col("ccb"), F.col("b")))
        & (cos >= F.lit(float(threshold)))
    )
    return pairs.groupBy("b").agg(
        F.max("cell").alias("cell"), F.min("a").alias("witness")
    ).select(F.col("b").alias("vec_id"), "cell", "witness")


def semdedup_corpus(
    emb: DataFrame,
    C: np.ndarray,
    threshold: float = 0.95,
    portable: bool = False,
) -> DataFrame:
    """The semantically deduplicated corpus: input rows minus the
    dropped members — drops are duplicate-group-sized (tiny relative to
    the corpus), so this is a broadcast anti-join; the corpus itself is
    never shuffled."""
    drops = semdedup_drops(emb, C, threshold, portable=portable).select("vec_id")
    return emb.join(F.broadcast(drops), "vec_id", "left_anti")
