"""Quick controlled scaling probe: CPU-bound Spark control stage vs the
real index build, one JVM per (level, kind), printed as JSON lines.

Usage: python scripts/probe_scaling.py --cores 8 --kind control|build
       python scripts/probe_scaling.py            # orchestrates both
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("JOIE_BENCH_CONVS", "20000"))


def corpus_path() -> str:
    path = os.path.join(REPO, ".cache", f"corpus_bench_{N_CONVS}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from joie_spark.corpus import spark_write_corpus
        from joie_spark.session import get_spark

        spark = get_spark("corpus-gen", master="local[32]", shuffle_partitions=32)
        spark_write_corpus(spark, path, N_CONVS)
        spark.stop()
    return path


def run(cores: int, kind: str) -> dict:
    from joie_spark.session import get_spark

    spark = get_spark(
        f"probe-{kind}-{cores}", master=f"local[{cores}]", shuffle_partitions=64
    )
    out: dict = {"cores": cores, "kind": kind}
    if kind == "control":
        # pure-JVM CPU-bound: hash 400M longs, full shuffle-free agg
        t0 = time.time()
        spark.range(0, 400_000_000, 1, 64).selectExpr(
            "sum(xxhash64(id, id) % 1000000) as s"
        ).collect()
        out["jvm_sec"] = round(time.time() - t0, 2)
        # python pandas-UDF CPU-bound control (the tokenizer's shape)
        from pyspark.sql import functions as F

        @F.pandas_udf("double")
        def burn(x: pd.Series) -> pd.Series:
            import numpy as np

            v = x.to_numpy(dtype=np.float64)
            acc = np.zeros_like(v)
            for _ in range(300):
                acc = np.sqrt(acc + v * 1.000001)
            return pd.Series(acc)

        t0 = time.time()
        spark.range(0, 12_000_000, 1, 64).select(
            F.sum(burn(F.col("id").cast("double")))
        ).collect()
        out["pyudf_sec"] = round(time.time() - t0, 2)
    else:
        from joie_spark.engine import Engine
        from joie_spark.sources.tables import Manifest

        src = corpus_path()
        ix = tempfile.mkdtemp(prefix=f"probe_{cores}_", dir="/dev/shm")
        try:
            t0 = time.time()
            Engine.build(
                spark, src, ix, n_buckets=64, docs_per_block=64,
                block_chunks=1, collect_metrics=False,
            )
            out["build_sec"] = round(time.time() - t0, 2)
            man = Manifest.load(ix)
            out["stage_secs"] = {
                e["stage"]: e["seconds"]
                for e in man.entries
                if e.get("seconds") is not None
            }
        finally:
            shutil.rmtree(ix, ignore_errors=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--kind", default="control")
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run(args.cores, args.kind)))
        return
    corpus_path()
    for kind in ("control", "build"):
        for cores in (8, 32, 8, 32):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores", str(cores),
                 "--kind", kind],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            print(p.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()
