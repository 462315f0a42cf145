"""Two-cluster-size scaling evidence (north rule: ≥0.8 throughput scaling
efficiency from N to 4N executors).

No real cluster exists in this sandbox, so per the task brief we run the
SAME job on the SAME input at two parallelism levels — local[8] and
local[32] — in separate subprocesses (a JVM can't change its master), and
report build/query throughput at both plus
eff = (throughput_4N / throughput_N) / 4.

Writes BENCH/BASELINE.md.  Usage:
    python scripts/bench_scaling.py            # full run (both levels)
    python scripts/bench_scaling.py --cores 8  # single level, prints JSON
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("JOIE_BENCH_CONVS", "150000"))
QUERIES = [
    "roll OR dice OR game",
    "the OR check OR turn",
    '"crystal kingdom"',
    '"roll for insight" OR dice',
    "roll AND dice",
    '"crystal kingdom" AND roll',
    "(roll OR dice) AND game",
    "kingdom",
    "venimus OR dice",
    "check AND turn AND game",
]


def corpus_path() -> str:
    from joie_spark.corpus import write_corpus

    path = os.path.join(REPO, ".cache", f"corpus_bench_{N_CONVS}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        n = write_corpus(path, N_CONVS)
        print(f"generated bench corpus: {n} turns", file=sys.stderr)
    return path


def run_level(cores: int) -> dict:
    from joie_spark.engine import Engine
    from joie_spark.session import get_spark
    from joie_spark.sources.tables import Manifest, dir_bytes

    spark = get_spark(
        f"joie-scale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )
    src = corpus_path()
    n_turns = spark.read.parquet(src).count()
    ix = tempfile.mkdtemp(prefix=f"joie_scale_{cores}_")
    try:
        t0 = time.time()
        eng = Engine.build(
            spark, src, ix, n_buckets=cores * 2, docs_per_block=64, block_chunks=1
        )
        build_sec = time.time() - t0

        eng.search(QUERIES[0], k=10).collect()  # warm up
        t0 = time.time()
        for q in QUERIES:
            eng.search(q, k=10).collect()
        query_sec = time.time() - t0

        man = Manifest.load(ix)
        post = next(e for e in man.entries if e["stage"] == "postings")
        return {
            "cores": cores,
            "n_turns": n_turns,
            "build_sec": round(build_sec, 2),
            "build_turns_per_sec": round(n_turns / build_sec, 1),
            "postings_per_sec": post["postings_per_sec"],
            "postings_rows": post["rows"],
            "index_bytes": dir_bytes(ix),
            "query_sec": round(query_sec, 2),
            "query_qps": round(len(QUERIES) / query_sec, 3),
        }
    finally:
        shutil.rmtree(ix, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    if args.cores:
        print(json.dumps(run_level(args.cores)))
        return

    corpus_path()  # pre-generate so both levels read identical files
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(results[cores]), file=sys.stderr)

    r8, r32 = results[8], results[32]
    eff_build = (r32["build_turns_per_sec"] / r8["build_turns_per_sec"]) / 4
    eff_query = (r32["query_qps"] / r8["query_qps"]) / 4

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers + scaling evidence

Corpus: deterministic synthetic transcripts (FIXTURES.md §1), seed 42,
{r8['n_turns']} turns ({N_CONVS} conversations); identical parquet input
for both levels.  Query set: {len(QUERIES)} mixed keyword/phrase/boolean
queries, warm.

Sandbox stand-in for N vs 4N executors (task brief): same job at
local[8] vs local[32] in separate JVMs.

| metric | local[8] (N) | local[32] (4N) | scaling eff |
|---|---|---|---|
| index build (s) | {r8['build_sec']} | {r32['build_sec']} | |
| build turns/sec | {r8['build_turns_per_sec']} | {r32['build_turns_per_sec']} | **{eff_build:.3f}** |
| postings/sec (stage) | {r8['postings_per_sec']} | {r32['postings_per_sec']} | |
| query batch (s, {len(QUERIES)} q) | {r8['query_sec']} | {r32['query_sec']} | |
| query QPS | {r8['query_qps']} | {r32['query_qps']} | **{eff_query:.3f}** |
| postings rows | {r8['postings_rows']} | {r32['postings_rows']} | (equal = determinism) |
| index bytes | {r8['index_bytes']} | {r32['index_bytes']} | |

Efficiency = (throughput_4N / throughput_N) / 4; north-rule gate ≥ 0.8
applies to the cluster deployment — local-mode numbers share one JVM,
one disk and Python worker pools, so they understate true multi-executor
scaling; they are evidence of shuffle-parallel structure, not a cluster
measurement.

Raw JSON:
```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
        )
    print(json.dumps({"eff_build": eff_build, "eff_query": eff_query}))


if __name__ == "__main__":
    main()
