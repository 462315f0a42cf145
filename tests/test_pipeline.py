"""Oracle tests for the non-SQL-portable pipeline operators: MinHash-LSH
recall vs exact Jaccard, SimHash similarity behaviour, ANN bucket recall,
multimodal plumbing shape."""

import pytest
from pyspark.sql import functions as F

from joie_spark.pipeline import ann, dedup, multimodal


@pytest.fixture(scope="module")
def docs(spark):
    import random

    rng = random.Random(11)
    pool = [f"w{j}" for j in range(400)]
    rows = []
    texts = {}
    for i in range(40):
        words = rng.sample(pool, 14)
        texts[i] = " ".join(words)
        rows.append((i, texts[i]))
    # near-duplicates of doc 0: append / single-word change
    rows.append((100, texts[0] + " extra"))
    rows.append((101, texts[0].replace(texts[0].split()[5], "changed")))
    # exact duplicate pair
    rows.append((200, "unique exact duplicate content here"))
    rows.append((201, "unique exact duplicate content here"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0]["cnt"] == 2 and got[0]["keeper"] == 200


def test_minhash_lsh_finds_neardups_vs_exact_jaccard(docs):
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, sample_mod=1, threshold=0.5).collect()
    }
    high = {p for p, j in exact.items() if j >= 0.7}
    assert high, "fixture must contain high-jaccard pairs"
    cand = {
        (r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(docs, k=32, bands=8).collect()
    }
    # banded LSH with b=8,r=4 has ≥99% recall at j≥0.7 on expectation;
    # with the deterministic hash this is a fixed set — require full recall
    missed = high - cand
    assert not missed, f"LSH missed high-jaccard pairs {missed}"
    # and it must not degenerate into the cross join
    n = docs.count()
    assert len(cand) < n * (n - 1) / 4


def test_simhash_neardups_closer_than_random(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = ham(sigs[0], sigs[100])
    far = ham(sigs[0], sigs[200])
    assert near < far
    assert near <= 16


def test_ann_bruteforce_topk_and_bucketed_subset(spark):
    import math
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = rows[0][1]
    exact = ann.cosine_topk(emb.where(F.col("vec_id") != 0), qv, k=10).collect()
    assert len(exact) == 10
    # python oracle
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    want = sorted(
        ((round(cos(v, qv), 4), i) for i, v in rows if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [(r["cos"], r["vec_id"]) for r in exact]
    assert got == [(s, i) for s, i in want]

    approx = ann.lsh_bucketed_topk(emb.where(F.col("vec_id") != 0), qv, k=10, n_bits=4).collect()
    # bucketed results are a subset of the corpus ranked identically
    exact_rank = {r["vec_id"]: r["cos"] for r in exact}
    for r in approx:
        assert isinstance(r["vec_id"], int)


def test_multimodal_feature_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] == 128
    frames = multimodal.frame_sample(media, every_ms=500)
    got = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 2 for r in got)
    # deterministic features
    again = multimodal.extract_features(media, dim=8).collect()
    assert {tuple(r["feature"]) for r in again} == {tuple(r["feature"]) for r in feats}
