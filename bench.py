"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Also times a full engine cycle on the documents table (index build +
warm BM25 query batch) since index-build throughput and query QPS are the
north-rule metrics; scaling evidence across two parallelism levels lives
in scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# Headlines measure the SCALE paths only (VERDICT r1): the sampled
# pairwise oracles (ngram_jaccard, embedding_neardup) stay as correctness
# queries but out of the bench — a 100 TB pipeline runs the LSH variants.
# scripts/plan_audit.py asserts none of these plans contain a cross join.
HEADLINE = [
    "bm25_topk",
    "term_df_top100",
    "phrase_adjacency",
    "and_intersect",
    "minhash_lsh_verified",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "quality_score",
    "pricing_summary",
    "join_revenue_topk",
]

ENGINE_QUERIES = [
    '"fast table" OR scan',
    "table AND fast OR scan",
    "group order AND batch",
    '"slow fast" OR "row scan"',
    "window OR spark OR query OR stream",
]
# 20 DISTINCT queries for the batch job (duplicates would overstate QPS)
ENGINE_BATCH = ENGINE_QUERIES + [
    "fast OR slow",
    "table AND row",
    "scan OR batch OR group",
    '"row scan" AND table',
    "query AND window",
    "stream OR group",
    "spark AND query OR window",
    '"fast table" AND scan',
    "order OR batch",
    "row AND scan AND table",
    "window AND stream",
    "slow OR row OR scan",
    '"slow fast" AND row',
    "group AND order",
    "spark OR stream OR batch",
]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from joie_spark.engine import Engine
    from joie_spark.session import get_spark

    spark = get_spark("joie-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    timings: dict[str, float] = {}
    qmap = entrymod.queries()
    # steady-state warmup: one cheap query absorbs the session's one-time
    # costs (parquet footer reads, codegen compilation, python worker
    # spin-up) so the first timed headline doesn't carry them
    qmap["quality_score"](spark, SF_DIR).count()
    for name in HEADLINE:
        t0 = time.time()
        df = qmap[name](spark, SF_DIR)
        df.count() if name not in ("bm25_topk",) else df.collect()
        timings[name] = round(time.time() - t0, 3)

    # engine cycle: build over documents-as-transcripts, then warm QPS
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    transcripts = docs.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("doc").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    ix_dir = tempfile.mkdtemp(prefix="joie_bench_ix_")
    try:
        n_turns = transcripts.count()
        t0 = time.time()
        eng = Engine.build(
            spark, transcripts, ix_dir,
            n_buckets=max(CPUS, 8), docs_per_block=64, block_chunks=1,
        )
        build_sec = time.time() - t0
        timings["engine_build"] = round(build_sec, 3)

        # warm-up then the timed batch: the whole query set in ONE
        # search_many job (per-query driver latency amortized — the
        # engine's throughput story; see Engine.search_many)
        batch = ENGINE_BATCH
        eng.search_many(ENGINE_QUERIES, k=10).collect()
        t0 = time.time()
        n_rows = len(eng.search_many(batch, k=10).collect())
        query_sec = time.time() - t0
        assert n_rows > 0
        timings["engine_query_batch"] = round(query_sec, 3)
        # latency reference: one single query through Engine.search
        t0 = time.time()
        eng.search(ENGINE_QUERIES[0], k=10).collect()
        single_sec = time.time() - t0
        # incremental ingest: append a 10% delta (fresh conv_ids) as one
        # generation — the daily-delta shape (operators/append.py)
        delta = transcripts.limit(n_turns // 10).withColumn(
            "conv_id", F.concat(F.lit("app-"), F.col("conv_id"))
        )
        n_delta = delta.count()
        t0 = time.time()
        eng.append(delta)
        append_sec = time.time() - t0
        timings["engine_append"] = round(append_sec, 3)
        engine_metrics = {
            "build_turns_per_sec": round(n_turns / build_sec, 1),
            "query_qps": round(len(batch) / query_sec, 3),
            "single_query_sec": round(single_sec, 3),
            "append_turns_per_sec": round(n_delta / append_sec, 1),
            "batch_size": len(batch),
            "n_turns": n_turns,
        }
    finally:
        shutil.rmtree(ix_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                "engine": engine_metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
