"""Deterministic split / stratified sampling (pipeline/sampling.py):
stability across partitioning (the property RNG sampling lacks),
weight validation, proportions, and the zero-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from joie_spark.pipeline import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_split_stable_across_partitioning(docs):
    a = {r["doc_id"]: r["split"] for r in sampling.with_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.with_split(docs.repartition(13)).collect()
    }
    assert a == b  # membership never moves with partitioning / re-runs
    assert set(a.values()) == {"train", "val", "test"}


def test_split_proportions_and_exhaustive(docs):
    counts = (
        sampling.with_split(docs).groupBy("split").count().collect()
    )
    got = {r["split"]: r["count"] for r in counts}
    assert sum(got.values()) == 600  # every row assigned exactly once
    assert 0.80 <= got["train"] / 600 <= 0.97  # ~0.90 at n=600


def test_split_weights_validated(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.with_split(docs, weights=(("train", 0.5), ("val", 0.1)))


def test_split_disjoint_under_salt_change(docs):
    a = {r["doc_id"]: r["split"] for r in sampling.with_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.with_split(docs, salt="v2").collect()
    }
    assert a != b  # a new salt re-deals the assignment


def test_stratified_fractions(docs):
    got = sampling.stratified_sample(
        docs, 0.2, strata="lang", fractions={"de": 0.6}
    )
    counts = {r["lang"]: r["count"] for r in got.groupBy("lang").count().collect()}
    assert 0.4 <= counts["de"] / 200 <= 0.8  # ~0.6
    for lang in ("en", "fr"):
        assert 0.1 <= counts[lang] / 200 <= 0.32  # ~0.2
    # subset of the corpus, deterministic on re-run
    again = sampling.stratified_sample(
        docs, 0.2, strata="lang", fractions={"de": 0.6}
    )
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_flat_sample_fraction(docs):
    got = sampling.stratified_sample(docs, 0.25).count()
    assert 0.15 * 600 <= got <= 0.35 * 600


def test_sampling_plan_is_map_side(docs):
    """Scale shape: split assignment and sampling are pure scan-stage
    expressions — no Exchange (shuffle) anywhere in the plan."""
    for df in (
        sampling.with_split(docs),
        sampling.stratified_sample(docs, 0.2, strata="lang"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_cluster_safe_split_keeps_neardups_together(docs, spark):
    """Near-dup pairs must never straddle the train/val boundary: all
    members of a cluster (incl. transitive chains) share one split, and
    docs outside any cluster keep their plain with_split assignment."""
    pairs = spark.createDataFrame([(0, 1), (1, 2), (10, 11)], "a long, b long")
    got = {
        r["doc_id"]: r["split"]
        for r in sampling.cluster_safe_split(docs, pairs).collect()
    }
    assert len(got) == 600
    assert got[0] == got[1] == got[2]  # transitive chain, one split
    assert got[10] == got[11]
    plain = {r["doc_id"]: r["split"] for r in sampling.with_split(docs).collect()}
    clustered = {0, 1, 2, 10, 11}
    assert all(got[d] == plain[d] for d in got if d not in clustered)
    # cluster representative (min id) anchors the hash
    assert got[0] == plain[0] and got[10] == plain[10]


def test_mixture_sample_epochs(docs):
    """Epoch semantics: floor(e) full copies + a deterministic fraction
    getting one more; e=0 drops the source; epoch is the 0-based copy
    index so trainers can interleave."""
    got = sampling.mixture_sample(
        docs, {"en": 2.5, "de": 0.5, "fr": 0.0}, source_col="lang"
    )
    rows = got.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], r["epoch"]))
    assert "fr" not in by_lang
    # en: every doc has epochs 0 and 1; ~half additionally 2
    en_epochs = {}
    for d, ep in by_lang["en"]:
        en_epochs.setdefault(d, set()).add(ep)
    assert all({0, 1} <= eps for eps in en_epochs.values())
    n_third = sum(1 for eps in en_epochs.values() if 2 in eps)
    assert 0.3 * 200 <= n_third <= 0.7 * 200
    # de: no full copy, ~half the docs once at epoch 0
    assert all(ep == 0 for _, ep in by_lang["de"])
    assert 0.3 * 200 <= len(by_lang["de"]) <= 0.7 * 200
    # deterministic on re-run
    again = sampling.mixture_sample(
        docs, {"en": 2.5, "de": 0.5, "fr": 0.0}, source_col="lang"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mixture_sample_validates(docs):
    with pytest.raises(ValueError, match=">= 0"):
        sampling.mixture_sample(docs, {"en": -1.0}, source_col="lang")


def test_mixture_sample_plan_is_map_side(docs):
    df = sampling.mixture_sample(docs, {"en": 2.5}, source_col="lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
