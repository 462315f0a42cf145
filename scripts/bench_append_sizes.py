"""Append latency vs delta size (VERDICT r3 item 5).

append_index pays a fixed cost per generation (~6 manifest-committed
stages: turns/doc_meta/term_dict/postings/blocks/stats, each one Spark
job chain) plus marginal per-row work.  This script measures that curve:
sequential appends of growing deltas onto one index, min-of-1 (each
append is once-only by nature — the interesting number is the trend, and
the fixed-vs-marginal split is visible from the curve's intercept).

Output: one JSON line per delta size + a summary; paste into
BENCH/APPEND_LATENCY.md.  Run: python scripts/bench_append_sizes.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SIZES = [250, 500, 2500, 5000]


def main() -> None:
    from pyspark.sql import functions as F

    from joie_spark.engine import Engine
    from joie_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "bench-append", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    transcripts = docs.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("doc").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    ).cache()
    n = transcripts.count()
    ix = tempfile.mkdtemp(prefix="joie_append_bench_")
    out = []
    try:
        t0 = time.time()
        eng = Engine.build(
            spark, transcripts, ix,
            n_buckets=max(cpus, 8), docs_per_block=64, block_chunks=1,
        )
        build_sec = round(time.time() - t0, 3)
        for gi, size in enumerate(SIZES):
            delta = transcripts.limit(min(size, n)).withColumn(
                "conv_id", F.concat(F.lit(f"g{gi}-"), F.col("conv_id"))
            )
            nd = delta.count()
            t0 = time.time()
            eng.append(delta)
            sec = round(time.time() - t0, 3)
            out.append(
                {
                    "delta_turns": nd,
                    "append_sec": sec,
                    "turns_per_sec": round(nd / sec, 1),
                }
            )
            print(json.dumps(out[-1]), flush=True)
        # sanity: the index still answers after all generations
        assert eng.search("fast OR table", k=5).count() > 0
        print(
            json.dumps(
                {
                    "metric": "append_latency_curve",
                    "base_turns": n,
                    "build_sec": build_sec,
                    "build_turns_per_sec": round(n / build_sec, 1),
                    "curve": out,
                    "cpus": cpus,
                    "sf_dir": SF_DIR,
                }
            )
        )
    finally:
        shutil.rmtree(ix, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
