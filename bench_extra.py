"""Extra benchmarks for optimization work (guide §1.4): isolate single
headline queries with the noop sink, capture .explain("formatted"), and
print per-rep timings.  bench.py itself is FROZEN for measurement — this
file exists so optimization evidence (before/after numbers, plan dumps)
can be produced without touching it.

Usage:
    python bench_extra.py QUERY [QUERY...] [--reps N] [--explain DIR]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py semdedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>.txt explain dumps")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from joie_spark.session import get_spark

    spark = get_spark("joie-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qmap = entrymod.queries()
    if not args.no_warm:
        qmap["quality_score"](spark, SF_DIR).count()

    out: dict[str, list[float]] = {}
    for _rep in range(args.reps):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            if getattr(df, "_joie_persisted", None) is not None:
                df._joie_persisted.unpersist()
            spark.sparkContext.setJobDescription(None)
    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in args.queries:
            df = qmap[name](spark, SF_DIR)
            p = os.path.join(args.explain, f"{name}.txt")
            with open(p, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            if getattr(df, "_joie_persisted", None) is not None:
                df._joie_persisted.unpersist()
    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": CPUS,
        "mins": {k: min(v) for k, v in out.items()},
        "spread": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
