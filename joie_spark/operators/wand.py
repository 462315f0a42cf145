"""Block-max WAND top-k over the compressed posting blocks.

Distributed adaptation of block-max WAND (Ding & Suel 2011, public
algorithm; the reference has no scoring at all — SURVEY.md §2.7): the
sequential heap-threshold loop does not map onto a shuffle-based engine,
so we use the same *soundness* invariant (a block whose score upper bound
is below the current k-th best score cannot contribute a top-k document)
in two phases:

  phase 1  rank candidate blocks by ub(block) = Σ_t idf_t · max_part_t
           (block-max metadata written at build time), exact-score the
           top-P blocks → threshold θ = k-th best exact score.
  phase 2  decode & exact-score only blocks with ub ≥ θ; global top-k.

Pruning is by upper bound, so results are rank-identical to the
exhaustive path (tested).  Because blocks share global doc-range
boundaries (block_id = doc_id // docs_per_block), the per-block ub is a
plain groupBy-sum — no interval overlap logic, no skew (a hot term's
postings spread over ~n_docs/docs_per_block blocks).

Scoring is bit-identical to the oracle: numpy float64 elementwise ops use
the same IEEE semantics as the scalar expression, and per-doc sums fold
in ascending term_id order.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import TURN_BITS, delta_decode, varint_decode
from ..oracle import B, K1, bm25_idf
from .query import RESULT_SCHEMA, Index

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("packed", T.LongType()),
        T.StructField("term_id", T.LongType()),
        T.StructField("contrib", T.DoubleType()),
    ]
)


def _decode_score_udf(idf_by_term: dict[int, float], avgdl: float):
    c1 = K1 + 1.0
    omb = 1.0 - B

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for term_id, docids, tfs, dls in zip(
                pdf["term_id"], pdf["docids"], pdf["tfs"], pdf["dls"]
            ):
                packed = delta_decode(bytes(docids))
                tf = varint_decode(bytes(tfs)).astype(np.float64)
                dl = varint_decode(bytes(dls)).astype(np.float64)
                idf = idf_by_term[int(term_id)]
                # same expression shape as oracle.bm25_term (bit-identical)
                contrib = idf * (tf * c1) / (tf + K1 * (omb + (B * dl) / avgdl))
                outs.append(
                    pd.DataFrame(
                        {
                            "packed": packed.astype(np.int64),
                            "term_id": np.full(len(packed), int(term_id), dtype=np.int64),
                            "contrib": contrib,
                        }
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"packed": [], "term_id": [], "contrib": []}
            )

    return run


def _blocks_for(ix: Index, qids: list[int]) -> DataFrame:
    nb = ix.stats["n_buckets"]
    buckets = sorted({t % nb for t in qids})
    return ix.blocks.where(
        F.col("bucket").isin(buckets) & F.col("term_id").isin([int(t) for t in qids])
    )


# Stored block maxima and query-time scores use DIFFERENT float
# associations — the build computes idf·(num/denom) per row while every
# scorer computes (idf·num)/denom (the oracle's exact shape) — so a
# stored bound can round up to a few ulps BELOW a real score.  When the
# k-th best score (θ) IS that block's max row, `ub >= θ` is false by one
# ulp and the block holding a genuine top-k row gets pruned (caught by a
# hypothesis pagination test at k=3 on a hot term).  ULP_GUARD pads every
# bound by 2^-48 relative (~3.6e-15 — 16 float64 eps, safely above the
# ≤4-ulp association discrepancy; zero effect on pruning power).
ULP_GUARD = 1.0 + 2.0**-48


def _avgdl_drift(ix: Index):
    """Soundness correction for blocks encoded under an older avgdl,
    times the ULP_GUARD association pad (above).

    A block's stored max_part was computed with enc_avgdl; after an
    incremental append the live avgdl differs.  For any (tf, dl),
    contribution(avgdl') ≤ contribution(avgdl) · max(1, avgdl'/avgdl)
    (the denominator term K1·B·dl/avgdl shrinks by at most that factor),
    so scaling stored bounds by max(1, avgdl_now/enc_avgdl) keeps the
    WAND upper bound valid — exactly 1 for freshly built or compacted
    indexes, slightly loose between append and compaction."""
    return F.greatest(
        F.lit(1.0), F.lit(float(ix.stats["avgdl"])) / F.col("enc_avgdl")
    ) * F.lit(ULP_GUARD)


def _score_blocks(
    ix: Index,
    blocks: DataFrame,
    idf: dict[int, float],
    k: int,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    decoded = blocks.select("term_id", "docids", "tfs", "dls").mapInPandas(
        _decode_score_udf(idf, ix.stats["avgdl"]), DECODED_SCHEMA
    )
    per_doc = decoded.groupBy("packed").agg(
        F.sort_array(F.collect_list(F.struct("term_id", "contrib"))).alias("cs")
    )
    score = F.aggregate(
        F.col("cs"), F.lit(0.0), lambda acc, x: acc + x["contrib"]
    )
    scored = per_doc.select(
        F.shiftright(F.col("packed"), TURN_BITS).alias("doc_id"),
        (F.col("packed") % (1 << TURN_BITS)).cast("int").alias("turn_idx"),
        score.alias("score"),
    )
    # deleted-doc deny-list, fused like doc_filter: applied in BOTH phases
    # (probe θ and final), so θ is a k-th best score over LIVE docs and
    # the pruning argument is unchanged (operators/delete.py)
    scored = ix.exclude_tombstones(scored)
    if doc_filter is not None:
        scored = scored.join(doc_filter, "doc_id", "left_semi")
    return scored.orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("turn_idx")
    ).limit(k)


def wand_topk(
    ix: Index,
    words: list[str],
    k: int = 10,
    probe_blocks: int = 8,
    where_doc: str | None = None,
) -> DataFrame:
    """Disjunctive (keyword-OR) BM25 top-k with block-max pruning.

    Returns the same rows as the exhaustive scorer (rank-identical); at
    scale only ~probe_blocks + surviving blocks are ever decoded.

    `where_doc` fuses a document filter into BOTH phases (the analogue of
    the reference's fused DocumentFilter, engine/src/query/filter.rs:7-34).
    Soundness: θ is the k-th best FILTERED score over the probe blocks, so
    θ ≤ the global filtered k-th best; every doc's score is ≤ its block's
    ub, hence no filtered top-k doc lives in a pruned (ub < θ) block."""
    lut = ix.lookup_terms(words)
    qids = sorted({tid for tid, _df in lut.values()})
    if not qids:
        return ix.spark.createDataFrame([], RESULT_SCHEMA)
    n_docs = ix.stats["N"]
    idf = {tid: bm25_idf(n_docs, df) for tid, df in lut.values()}
    doc_filter = (
        ix.doc_meta.where(where_doc).select("doc_id") if where_doc else None
    )

    blocks = _blocks_for(ix, qids).cache()
    try:
        idf_map = F.map_from_arrays(
            F.array([F.lit(int(t)).cast("long") for t in qids]),
            F.array([F.lit(idf[t]) for t in qids]),
        )
        ub = blocks.groupBy("block_id").agg(
            F.sum(
                F.element_at(idf_map, F.col("term_id"))
                * F.col("max_part")
                * _avgdl_drift(ix)
            ).alias("ub")
        )

        # phase 1: exact-score the highest-ub blocks → threshold θ
        probe_ids = [
            r["block_id"]
            for r in ub.orderBy(F.desc("ub"), F.asc("block_id"))
            .limit(probe_blocks)
            .collect()
        ]
        if not probe_ids:
            return ix.spark.createDataFrame([], RESULT_SCHEMA)
        probe = _score_blocks(
            ix,
            blocks.where(F.col("block_id").isin(probe_ids)),
            idf,
            k,
            doc_filter=doc_filter,
        ).collect()
        theta = probe[-1]["score"] if len(probe) >= k else float("-inf")

        # phase 2: only blocks whose upper bound can beat θ
        survivors = ub.where(F.col("ub") >= theta).select("block_id")
        final_blocks = blocks.join(survivors, "block_id", "left_semi")
        return _score_blocks(ix, final_blocks, idf, k, doc_filter=doc_filter)
    finally:
        blocks.unpersist()


def pruning_stats(ix: Index, words: list[str], k: int = 10, probe_blocks: int = 8) -> dict:
    """Diagnostics: how many candidate blocks the θ-pruning removed."""
    lut = ix.lookup_terms(words)
    qids = sorted({tid for tid, _ in lut.values()})
    if not qids:
        return {"total_blocks": 0, "survivors": 0}
    n_docs = ix.stats["N"]
    idf = {tid: bm25_idf(n_docs, df) for tid, df in lut.values()}
    blocks = _blocks_for(ix, qids)
    idf_map = F.map_from_arrays(
        F.array([F.lit(int(t)).cast("long") for t in qids]),
        F.array([F.lit(idf[t]) for t in qids]),
    )
    ub = blocks.groupBy("block_id").agg(
        F.sum(
            F.element_at(idf_map, F.col("term_id"))
            * F.col("max_part")
            * _avgdl_drift(ix)
        ).alias("ub")
    )
    probe_ids = [
        r["block_id"]
        for r in ub.orderBy(F.desc("ub"), F.asc("block_id")).limit(probe_blocks).collect()
    ]
    probe = _score_blocks(
        ix, blocks.where(F.col("block_id").isin(probe_ids)), idf, k
    ).collect()
    theta = probe[-1]["score"] if len(probe) >= k else float("-inf")
    total = ub.count()
    surv = ub.where(F.col("ub") >= theta).count()
    return {"total_blocks": total, "survivors": surv, "theta": theta}
