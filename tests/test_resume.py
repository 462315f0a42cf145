"""Checkpoint/resume: kill the build mid-way, resume, and require the
final index to equal an uninterrupted build (north rule: resumable from
per-partition checkpoints with lineage)."""

import pytest

from joie_spark.operators.build import build_index
from joie_spark.sources.tables import Manifest


def _blocks_set(spark, d):
    rows = spark.read.parquet(d + "/blocks").collect()
    return {
        (r["term_id"], r["block_id"], bytes(r["docids"]), bytes(r["tfs"]), r["n"])
        for r in rows
    }


def test_kill_and_resume_equals_uninterrupted(spark, t1_rows, tmp_path):
    df = spark.createDataFrame(t1_rows)

    d_full = str(tmp_path / "full")
    build_index(spark, df, d_full, n_buckets=8, docs_per_block=8, block_chunks=4)

    d_resume = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, df, d_resume, n_buckets=8, docs_per_block=8,
            block_chunks=4, fail_after_block_chunk=2,
        )
    # partial state: some block chunks committed, not all
    man = Manifest.load(d_resume)
    done_chunks = [e for e in man.entries if e["stage"] == "blocks"]
    assert 0 < len(done_chunks) < 4

    build_index(spark, df, d_resume, n_buckets=8, docs_per_block=8, block_chunks=4)

    assert _blocks_set(spark, d_full) == _blocks_set(spark, d_resume)

    # earlier stages were not redone on resume (exactly one commit each)
    man = Manifest.load(d_resume)
    for stage in ("turns", "term_dict", "stats", "postings"):
        assert sum(1 for e in man.entries if e["stage"] == stage) == 1, stage


def test_manifest_records_lineage_metrics(spark, t1_index_dir):
    man = Manifest.load(t1_index_dir)
    stages = {e["stage"] for e in man.entries}
    assert {"turns", "term_dict", "stats", "postings", "blocks", "build"} <= stages
    turns = next(e for e in man.entries if e["stage"] == "turns")
    assert turns["turns_per_sec"] > 0 and turns["bytes"] > 0
    post = next(e for e in man.entries if e["stage"] == "postings")
    assert post["postings_per_sec"] > 0
    blk = next(e for e in man.entries if e["stage"] == "blocks")
    assert blk["avg_postings_per_block"] > 0
