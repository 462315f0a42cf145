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
REPS = int(os.environ.get("SPARK_GRAFT_REPS", 3))

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
    "top_ngram_share",
    "pack_sequences",
    "substring_dedup_corpus",
    "decon_corpus",
    "clean_corpus_lsh",
    "gopher_filter",
    "web_clean_corpus",
    "dsir_select_fast",
    "tfidf_topk",
    "bpe_encode",
    "semdedup",
    "ppl_score",
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
    spreads: dict[str, list[float]] = {}
    qmap = entrymod.queries()
    # steady-state warmup: one cheap query absorbs the session's one-time
    # costs (parquet footer reads, codegen compilation, python worker
    # spin-up) so the first timed headline doesn't carry them
    qmap["quality_score"](spark, SF_DIR).count()

    # min-of-N INTERLEAVED reps (VERDICT r3): this host has documented
    # 1-5x contention spikes; a single run per query cannot distinguish a
    # real regression from a noisy window.  Interleaving (all queries rep
    # 1, then all rep 2, ...) decorrelates a contention burst from any one
    # query; min is the standard noise-floor estimator (same as
    # scripts/bench_scaling.py).
    # materialize via the noop sink, not .count(): count() lets Catalyst
    # prune every projected column, so a query like quality_score would be
    # timed WITHOUT computing its scores (measurement honesty, r4)
    def run_query(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for _rep in range(REPS):
        for name in HEADLINE:
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            run_query(df) if name not in ("bm25_topk",) else df.collect()
            spreads.setdefault(name, []).append(round(time.time() - t0, 3))
            # operators that persist an intermediate (pack_sequences'
            # pid-stamped counts, dedup's shingle cache) expose a release
            # handle — free it so reps don't accumulate cached frames
            if getattr(df, "_joie_persisted", None) is not None:
                df._joie_persisted.unpersist()
    for name in HEADLINE:
        timings[name] = min(spreads[name])

    # write-once ANN (VERDICT r3 item 4): materialize the bucket-
    # partitioned table ONCE (the one-time cost a production deployment
    # amortizes over all queries), then time the partition-pruned probe
    # query — vs ann_lsh_bucketed above, which re-signatures the corpus
    # per query (the ad-hoc shape)
    import joie_spark.pipeline.ann as ann_mod

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    mat = tempfile.mkdtemp(prefix="joie_bench_ann_")
    try:
        ann_mod.materialize_lsh_buckets(emb.where("vec_id != 0"), mat, n_bits=8)
        for _rep in range(REPS):
            t0 = time.time()
            ann_mod.lsh_bucketed_topk_materialized(
                spark, mat, qv, k=10, probe_hamming=1
            ).collect()
            spreads.setdefault("ann_lsh_materialized", []).append(
                round(time.time() - t0, 3)
            )
        timings["ann_lsh_materialized"] = min(spreads["ann_lsh_materialized"])
    finally:
        shutil.rmtree(mat, ignore_errors=True)

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
        # engine's throughput story; see Engine.search_many).  Two
        # variants, interleaved min-of-REPS:
        #   engine_query_batch         auto plan (decode-all shortcut at
        #                              this block count — the RIGHT plan
        #                              here)
        #   engine_query_batch_pruned  direct_threshold=0 forces the
        #                              3-phase probe/θ block-max WAND
        #                              machinery, so the pruned path's
        #                              constant factors are a MEASURED
        #                              number at this scale, not an
        #                              extrapolation (VERDICT r3 item 2)
        batch = ENGINE_BATCH
        eng.search_many(ENGINE_QUERIES, k=10).collect()
        for _rep in range(REPS):
            t0 = time.time()
            n_rows = len(eng.search_many(batch, k=10).collect())
            spreads.setdefault("engine_query_batch", []).append(
                round(time.time() - t0, 3)
            )
            assert n_rows > 0
            t0 = time.time()
            n_rows_p = len(
                eng.search_many(
                    batch, k=10, direct_threshold=0, probe_blocks=8
                ).collect()
            )
            spreads.setdefault("engine_query_batch_pruned", []).append(
                round(time.time() - t0, 3)
            )
            assert n_rows_p == n_rows
        query_sec = min(spreads["engine_query_batch"])
        timings["engine_query_batch"] = query_sec
        timings["engine_query_batch_pruned"] = min(
            spreads["engine_query_batch_pruned"]
        )
        # decode-fraction evidence for the pruned path (untimed pass —
        # the stats collection adds a count job)
        pruning: dict = {}
        diag = eng.search_many(
            batch, k=10, direct_threshold=0, probe_blocks=8,
            stats_out=pruning,
        )
        diag.collect()
        if getattr(diag, "_joie_persisted", None) is not None:
            diag._joie_persisted.unpersist()
        # latency reference: one single query through Engine.search
        for _rep in range(REPS):
            t0 = time.time()
            eng.search(ENGINE_QUERIES[0], k=10).collect()
            spreads.setdefault("engine_single_query", []).append(
                round(time.time() - t0, 3)
            )
        single_sec = min(spreads["engine_single_query"])
        # round-5 surface: conversation collapse (scores the full match
        # set + one doc_id groupBy) and keyset pagination (page 2 via
        # the page-1 cursor — must cost ~page-1 work, not OFFSET work)
        p1 = eng.search_after(ENGINE_QUERIES[1], None, k=10).collect()  # warm
        cursor = (p1[-1]["doc_id"], p1[-1]["turn_idx"], p1[-1]["score"])
        for _rep in range(REPS):
            t0 = time.time()
            eng.search_collapsed(ENGINE_QUERIES[1], k=10).collect()
            spreads.setdefault("engine_query_collapsed", []).append(
                round(time.time() - t0, 3)
            )
            t0 = time.time()
            n_p2 = len(eng.search_after(ENGINE_QUERIES[1], cursor, k=10).collect())
            spreads.setdefault("engine_query_page2", []).append(
                round(time.time() - t0, 3)
            )
            assert n_p2 > 0
        timings["engine_query_collapsed"] = min(spreads["engine_query_collapsed"])
        timings["engine_query_page2"] = min(spreads["engine_query_page2"])
        # doc-level BM25 (search_docs): same match scan + a per-doc
        # aggregation — should price like collapse, not like a rebuild
        eng.search_docs(ENGINE_QUERIES[1], k=10).collect()  # warm
        for _rep in range(REPS):
            t0 = time.time()
            n_sd = len(eng.search_docs(ENGINE_QUERIES[1], k=10).collect())
            spreads.setdefault("engine_query_docs", []).append(
                round(time.time() - t0, 3)
            )
            assert n_sd > 0
        timings["engine_query_docs"] = min(spreads["engine_query_docs"])
        # stopword-phrase A/B (VERDICT r4 item 2): '"the dup"' has an
        # extreme df spread in this corpus (the ~3.9k vs dup 250).  The
        # seed leg FORCES the broadcast semi-join on (floor 0 — the
        # default path routes around it below PHRASE_SEED_MIN_HOT_DF,
        # justified by BENCH/PHRASE_SEED.md's crossover); the noseed twin
        # (ratio ∞) measures the unpruned scan — so this pair tracks the
        # mechanism's constant factors at sf0.1, not the routing default.
        import joie_spark.operators.query as _qmod

        stopword_q = '"the dup"'
        n_hits = len(eng.search(stopword_q, k=10).collect())  # warm + sanity
        for _rep in range(REPS):
            _sav = (_qmod.PHRASE_SEED_DF_RATIO, _qmod.PHRASE_SEED_MIN_HOT_DF)
            _qmod.PHRASE_SEED_MIN_HOT_DF = 0
            t0 = time.time()
            n1 = len(eng.search(stopword_q, k=10).collect())
            spreads.setdefault("engine_phrase_stopword", []).append(
                round(time.time() - t0, 3)
            )
            _qmod.PHRASE_SEED_DF_RATIO = float("inf")
            t0 = time.time()
            n2 = len(eng.search(stopword_q, k=10).collect())
            _qmod.PHRASE_SEED_DF_RATIO, _qmod.PHRASE_SEED_MIN_HOT_DF = _sav
            spreads.setdefault("engine_phrase_stopword_noseed", []).append(
                round(time.time() - t0, 3)
            )
            assert n1 == n2 == n_hits
        timings["engine_phrase_stopword"] = min(spreads["engine_phrase_stopword"])
        timings["engine_phrase_stopword_noseed"] = min(
            spreads["engine_phrase_stopword_noseed"]
        )
        # highlight path (VERDICT r4 item 6): the whole batch with snippet
        # generation — joie's signature output (reference README.md:5);
        # highlighting stays post-top-k (plan audit highlight_after_topk)
        eng.search_many_highlighted(batch[:5], k=10).collect()  # warm
        for _rep in range(REPS):
            t0 = time.time()
            n_hl = len(eng.search_many_highlighted(batch, k=10).collect())
            spreads.setdefault("engine_query_batch_highlighted", []).append(
                round(time.time() - t0, 3)
            )
            assert n_hl > 0
        timings["engine_query_batch_highlighted"] = min(
            spreads["engine_query_batch_highlighted"]
        )
        # maintenance lifecycle, min-of-2 reps: append a 10% delta (fresh
        # conv_ids), tombstone 10% of the ORIGINAL conversations (one
        # metadata transaction — the target set stays a DataFrame), then
        # compact (physical purge + generation + dictionary collapse).
        # Each op mutates the index, so reps restore a pristine snapshot
        # of the built index first (a single-shot number here invited
        # false cross-round regression reads — these ops have ±30% rep
        # noise on this host, same as every other entry).
        delta = transcripts.limit(n_turns // 10).withColumn(
            "conv_id", F.concat(F.lit("app-"), F.col("conv_id"))
        )
        n_delta = delta.count()
        snap = ix_dir + "_snap"
        shutil.copytree(ix_dir, snap)
        for _rep in range(2):
            shutil.rmtree(ix_dir)
            shutil.copytree(snap, ix_dir)
            eng = Engine(spark, ix_dir)
            t0 = time.time()
            eng.append(delta)
            spreads.setdefault("engine_append", []).append(
                round(time.time() - t0, 3)
            )
            targets = (
                eng.index.doc_meta.select("conv_id")
                .where(F.col("conv_id").startswith("doc-"))
                .orderBy("conv_id")
                .limit(n_turns // 10)
            )
            t0 = time.time()
            eng.delete(targets)
            spreads.setdefault("engine_delete", []).append(
                round(time.time() - t0, 3)
            )
            t0 = time.time()
            eng.compact()
            spreads.setdefault("engine_compact", []).append(
                round(time.time() - t0, 3)
            )
        shutil.rmtree(snap, ignore_errors=True)
        append_sec = min(spreads["engine_append"])
        delete_sec = min(spreads["engine_delete"])
        compact_sec = min(spreads["engine_compact"])
        timings["engine_append"] = round(append_sec, 3)
        timings["engine_delete"] = round(delete_sec, 3)
        timings["engine_compact"] = round(compact_sec, 3)
        n_post = len(eng.search_many(batch[:5], k=10).collect())
        assert n_post > 0  # the index still answers after the lifecycle
        engine_metrics = {
            "build_turns_per_sec": round(n_turns / build_sec, 1),
            "query_qps": round(len(batch) / query_sec, 3),
            "single_query_sec": round(single_sec, 3),
            "append_turns_per_sec": round(n_delta / append_sec, 1),
            "delete_turns_per_sec": round((n_turns // 10) / delete_sec, 1),
            "batch_size": len(batch),
            "n_turns": n_turns,
            "pruning": pruning,
        }
    finally:
        shutil.rmtree(ix_dir, ignore_errors=True)
        shutil.rmtree(ix_dir + "_snap", ignore_errors=True)

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
                "reps": REPS,
                "spread": spreads,
                "engine": engine_metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
