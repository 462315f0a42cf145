"""SparkSession factory tuned for the engine.

Design target is a 1000-executor cluster over 10^12 turns; locally we run
`local[N]`.  Everything scale-relevant is expressed via configuration that
holds on a real cluster: AQE on (runtime coalescing + skew-join
mitigation), Arrow transfers for the pandas-UDF tokenizer, sane shuffle
partitioning, and broadcast joins for the small dimensions (term
dictionary lookups for a query's handful of terms).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "joie-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    # shuffle scratch on tmpfs: this sandbox's virtio disk serializes
    # concurrent shuffle writes (threads pile up in write0/munmap — measured
    # 3-6x stage slowdowns with heavy run-to-run variance).  On a real
    # cluster this is the usual "spark.local.dir on local NVMe" guidance.
    local_dir = os.environ.get("JOIE_LOCAL_DIR", "/dev/shm/joie-spark-local")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = None

    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # local mode runs all executor threads in the driver JVM: size the
        # heap for the parallelism level or 32 threads thrash GC in 8g
        .config(
            "spark.driver.memory",
            os.environ.get("JOIE_DRIVER_MEM", f"{max(8, cpus * 2)}g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` below every
        # explode; predicate pushdown then inlines the generator's FULL
        # expression tree (tokenize + shingle building here) into that
        # filter and pushes it below exchanges — re-running the expensive
        # array construction per row in the PRE-shuffle stage, which for a
        # freshly-read small table is far less parallel than the stage the
        # explode runs in.  The pipeline operators explode computed arrays
        # everywhere (shingles, n-grams, tokens), and the inferred filter's
        # only benefit (dropping empty-array rows before the shuffle) is
        # noise for text corpora.  Measured on contamination_hits at sf0.1
        # local[32]: 6.5s -> 0.75s min-of-4 interleaved.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
        if local_dir.startswith("/dev/shm"):
            # scratch is RAM: lz4-compressing shuffle blocks only burns CPU
            # (measured ~800 task-s per heavy stage)
            b = b.config("spark.shuffle.compress", "false").config(
                "spark.shuffle.spill.compress", "false"
            )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
