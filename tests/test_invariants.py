"""North-rule invariants: per-turn text equality under stable
(conv_id, turn_idx) ordering, and determinism of id assignment across
parallelism levels (the sandbox stand-in for N vs 4N executors)."""

from pyspark.sql import functions as F


def test_per_turn_text_equality(spark, t1_rows, t1_index_dir):
    """Every input turn appears in the turns store with byte-identical
    text under its (conv_id, turn_idx) key (BASELINE.json input_hint)."""
    turns = spark.read.parquet(t1_index_dir + "/turns")
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in turns.select("conv_id", "turn_idx", "text").collect()
    }
    assert len(got) == len(t1_rows)
    for row in t1_rows:
        assert got[(row["conv_id"], row["turn_idx"])] == row["text"]


def test_doc_ids_dense_over_sorted_convs(spark, t1_rows, t1_index_dir):
    turns = spark.read.parquet(t1_index_dir + "/turns")
    pairs = {
        (r["conv_id"], r["doc_id"])
        for r in turns.select("conv_id", "doc_id").distinct().collect()
    }
    convs = sorted({r["conv_id"] for r in t1_rows})
    want = {(c, i + 1) for i, c in enumerate(convs)}
    assert pairs == want


def test_term_ids_match_oracle(spark, t1_index_dir, t1_oracle):
    term_dict = spark.read.parquet(t1_index_dir + "/term_dict")
    got = {r["term"]: r["term_id"] for r in term_dict.collect()}
    assert got == t1_oracle.term_id


def test_df_stats_match_oracle(spark, t1_index_dir, t1_oracle):
    term_dict = spark.read.parquet(t1_index_dir + "/term_dict")
    got = {r["term_id"]: r["df"] for r in term_dict.collect()}
    assert got == t1_oracle.df


def test_id_assignment_parallelism_independent(spark, t1_rows):
    """doc_id/term_id assignment must be a function of the data, not the
    partitioning: same results at 2 and 16 partitions."""
    from joie_spark.operators.build import assign_dense_ids

    df = spark.createDataFrame(t1_rows)
    a = {
        tuple(r)
        for r in assign_dense_ids(df.repartition(2), "conv_id", "doc_id").collect()
    }
    b = {
        tuple(r)
        for r in assign_dense_ids(df.repartition(16), "conv_id", "doc_id").collect()
    }
    assert a == b


def test_postings_sorted_within_files(spark, t1_index_dir):
    """Files are written sorted (term_id, doc_id, turn_idx) — the on-disk
    contract that makes parquet min/max skipping effective
    (builder.rs:99-102 analogue)."""
    post = spark.read.parquet(t1_index_dir + "/postings")
    bad = (
        post.withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag(F.struct("term_id", "doc_id", "turn_idx")).over(
                __import__("pyspark").sql.window.Window.partitionBy("f").orderBy(
                    F.monotonically_increasing_id()
                )
            ),
        )
        .where(
            F.col("prev").isNotNull()
            & (F.struct("term_id", "doc_id", "turn_idx") < F.col("prev"))
        )
        .count()
    )
    assert bad == 0


def test_block_decode_roundtrip(spark, t1_index_dir, t1_oracle):
    """Decoding the compressed blocks reproduces the exact posting lists."""
    import numpy as np

    from joie_spark.functions.codec import delta_decode, unpack_id, varint_decode

    blocks = spark.read.parquet(t1_index_dir + "/blocks").collect()
    got: dict[int, list[tuple[int, int]]] = {}
    for b in blocks:
        packed = delta_decode(bytes(b["docids"]))
        docs, turns = unpack_id(np.asarray(packed))
        tfs = varint_decode(bytes(b["tfs"]))
        assert len(tfs) == b["n"] == len(packed)
        got.setdefault(b["term_id"], []).extend(
            (int(d), int(t)) for d, t in zip(docs, turns)
        )
    want_by_id = {tid: sorted(keys) for tid, keys in t1_oracle.postings.items()}
    for tid, lst in got.items():
        assert sorted(lst) == sorted(want_by_id[tid])
    assert set(got) == set(want_by_id)
