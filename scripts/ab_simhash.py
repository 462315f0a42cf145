"""A/B: SWAR-packed simhash64 vs the unpacked 64-column reference form.

VERDICT r3 item 1: the r3 bench showed simhash_pairs SLOWER after the
SWAR packing that was supposed to halve it, on a single unreplicated run.
This script times both aggregation forms on the SAME data in the SAME
JVM, interleaved min-of-N, materializing through the noop sink (count()
would prune the signature column away) — so the packing claim gets a
measured number instead of host noise.

Run: python scripts/ab_simhash.py [reps]   → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from joie_spark.pipeline.dedup import _simhash64_reference, simhash64
    from joie_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "ab-simhash", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    docs = docs.cache()
    n = docs.count()

    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # equality check first (also warms both plans)
    a = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in _simhash64_reference(docs).collect()}
    assert a == b, "SWAR and reference signatures diverge!"

    t_swar: list[float] = []
    t_ref: list[float] = []
    for _ in range(reps):
        t_swar.append(run(simhash64(docs)))
        t_ref.append(run(_simhash64_reference(docs)))
    print(
        json.dumps(
            {
                "n_docs": n,
                "sf_dir": SF_DIR,
                "cpus": cpus,
                "reps": reps,
                "swar_min_sec": min(t_swar),
                "ref_min_sec": min(t_ref),
                "swar_all": t_swar,
                "ref_all": t_ref,
                "winner": "swar" if min(t_swar) <= min(t_ref) else "reference",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
