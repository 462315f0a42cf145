"""Block-max WAND must be rank-identical to the exhaustive scorer (and
therefore to the oracle), and must actually prune blocks."""

import pytest

from joie_spark.operators import wand


@pytest.mark.parametrize(
    "words",
    [
        ["roll", "dice"],
        ["roll", "dice", "game", "kingdom"],
        ["venimus"],               # rare term
        ["the"],                   # hot term (many blocks)
        ["zzznope", "dice"],       # OOV mixed in
    ],
)
def test_wand_rank_identical_to_exhaustive(words, t1_engine, t1_oracle):
    got = [
        (r["doc_id"], r["turn_idx"], r["score"])
        for r in wand.wand_topk(t1_engine.index, words, k=10).collect()
    ]
    want = t1_oracle.search(" OR ".join(words), k=10)
    assert got == want


def test_wand_empty_for_all_oov(t1_engine):
    assert wand.wand_topk(t1_engine.index, ["zzznope"], k=10).collect() == []


def test_wand_prunes_blocks(t1_engine):
    # rare term (high idf) + hot term: the k=1 threshold comes from a
    # venimus-bearing block, so blocks holding only 'the' are pruned
    st = wand.pruning_stats(t1_engine.index, ["venimus", "the"], k=1, probe_blocks=1)
    assert st["total_blocks"] > 0
    assert st["survivors"] < st["total_blocks"]

    # and pruning is always sound (never drops below zero / above total)
    st2 = wand.pruning_stats(t1_engine.index, ["the", "roll"], k=5, probe_blocks=2)
    assert 0 < st2["survivors"] <= st2["total_blocks"]
