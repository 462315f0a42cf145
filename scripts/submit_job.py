"""Cluster entry point: build an index and run queries, submitted via

    spark-submit --py-files joie_spark.zip scripts/submit_job.py \
        --input <transcripts parquet> --index <index dir> \
        [--query '<query>'] [--cores N]

This is the deployment shape the north rule names: the driver script plus
the packaged library shipped to executors with --py-files.  On a real
cluster drop the local master (pass --master/--deploy-mode to
spark-submit as usual); everything else is identical.

Packaging + smoke run: scripts/run_submit.sh
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default='"crystal kingdom" AND roll')
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    # imports resolve from the --py-files zip on executors
    from pyspark.sql import SparkSession

    from joie_spark.engine import Engine

    spark = SparkSession.builder.appName("joie-submit").getOrCreate()
    eng = Engine.build(spark, args.input, args.index, collect_metrics=False)
    rows = eng.search(args.query, k=args.k).collect()
    print(
        json.dumps(
            {
                "query": args.query,
                "results": [
                    {"doc_id": r["doc_id"], "turn_idx": r["turn_idx"], "score": r["score"]}
                    for r in rows
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
