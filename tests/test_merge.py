"""Shard merge: merging two half-corpus shards must produce an index
identical to a single build over the whole corpus; salted == unsalted
posting-list aggregation on the skewed corpus."""

from pyspark.sql import functions as F

from joie_spark.operators.build import build_index
from joie_spark.operators.merge import (
    merge_indexes,
    salted_posting_lists,
    unsalted_posting_lists,
)


def test_merge_two_shards_equals_full_build(spark, t1_rows, t1_index_dir, tmp_path):
    convs = sorted({r["conv_id"] for r in t1_rows})
    half = set(convs[: len(convs) // 2])
    rows_a = [r for r in t1_rows if r["conv_id"] in half]
    rows_b = [r for r in t1_rows if r["conv_id"] not in half]

    d_a, d_b, d_m = (str(tmp_path / x) for x in ("a", "b", "merged"))
    build_index(spark, spark.createDataFrame(rows_a), d_a, n_buckets=8,
                docs_per_block=8, block_chunks=1)
    build_index(spark, spark.createDataFrame(rows_b), d_b, n_buckets=8,
                docs_per_block=8, block_chunks=1)
    merge_indexes(spark, [d_a, d_b], d_m, n_buckets=8, docs_per_block=8,
                  block_chunks=2)

    def snapshot(d):
        dict_rows = {
            (r["term"], r["term_id"], r["df"], r["cf"])
            for r in spark.read.parquet(d + "/term_dict").collect()
        }
        post_rows = {
            (r["term_id"], r["doc_id"], r["turn_idx"], r["tf"], tuple(r["positions"]))
            for r in spark.read.parquet(d + "/postings").collect()
        }
        return dict_rows, post_rows

    # merged == the reference full build (t1_index_dir was built over all rows
    # with the same bucket/block params)
    assert snapshot(d_m) == snapshot(t1_index_dir)


def test_merge_rejects_overlapping_shards(spark, t1_rows, t1_index_dir, tmp_path):
    import pytest

    d_dup = str(tmp_path / "dup")
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, [t1_index_dir, t1_index_dir], d_dup)


def test_salted_equals_unsalted_on_skewed_postings(spark, t1_index_dir):
    postings = spark.read.parquet(t1_index_dir + "/postings")
    # low threshold so the hot stemmed stopwords take the salted path
    salted = {
        r["term_id"]: [tuple(p) for p in r["plist"]]
        for r in salted_posting_lists(postings, n_salts=4, hot_df_threshold=50).collect()
    }
    unsalted = {
        r["term_id"]: [tuple(p) for p in r["plist"]]
        for r in unsalted_posting_lists(postings).collect()
    }
    assert salted == unsalted
    # and the fixture actually exercised the hot path
    n_hot = postings.groupBy("term_id").count().where(F.col("count") >= 50).count()
    assert n_hot > 0
