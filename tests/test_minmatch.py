"""minimum_should_match (plans/parser.py MinShould → PMinMatch): at
least m of k keywords per turn — pinned to the oracle, to its OR/AND
degenerate forms, and bit-identical across the single (postings) and
batch (bitmask popcount) paths."""

import pytest

from joie_spark.plans.parser import MinShould

WORDS = ("roll", "dice", "game", "kingdom")


def _topk(df):
    return [(r["doc_id"], r["turn_idx"], r["score"]) for r in df.collect()]


def _matches(df):
    return {(r["doc_id"], r["turn_idx"]) for r in df.collect()}


@pytest.mark.parametrize("m", [2, 3, 4])
def test_minmatch_rank_identity(m, t1_engine, t1_oracle):
    b = t1_engine.builder().keywords(*WORDS, min_match=m)
    expr = MinShould(WORDS, m)
    assert _matches(b.matches()) == t1_oracle._eval(expr), m
    assert _topk(b.top_k(10)) == t1_oracle.search_expr(expr, k=10), m


def test_minmatch_monotone_and_nonempty(t1_oracle):
    """Fixture sanity: each floor strictly between OR and AND sizes."""
    sets = [len(t1_oracle._eval(MinShould(WORDS, m))) for m in (1, 2, 3, 4)]
    assert sets[0] > sets[1] > 0
    assert sets[1] >= sets[2] >= sets[3]


def test_minmatch_m1_equals_or(t1_engine):
    a = _topk(t1_engine.builder().keywords(*WORDS, min_match=1).top_k(10))
    b = _topk(t1_engine.builder().keywords(*WORDS).top_k(10))
    assert a == b


def test_minmatch_full_equals_and(t1_engine):
    """m=len(words): same matches AND same scores as the boolean AND of
    the words (both score all query terms)."""
    a = t1_engine.builder().keywords(*WORDS, min_match=len(WORDS))
    k1 = t1_engine.builder().keywords(WORDS[0])
    for w in WORDS[1:]:
        k1 = k1.and_(t1_engine.builder().keywords(w))
    assert _matches(a.matches()) == _matches(k1.matches())
    assert _topk(a.top_k(10)) == _topk(k1.top_k(10))


def test_minmatch_oov_counts_as_absent(t1_engine, t1_oracle):
    """OOV words can never contribute to the floor; a floor above the
    live-word count is empty."""
    words = ("roll", "zzzzunseenzzz", "dice")
    b2 = t1_engine.builder().keywords(*words, min_match=2)
    expr = MinShould(words, 2)
    assert _matches(b2.matches()) == t1_oracle._eval(expr)
    b3 = t1_engine.builder().keywords(*words, min_match=3)
    assert b3.matches().count() == 0


def test_minmatch_batch_bit_identical(t1_engine):
    """The batch path evaluates the floor as a bitmask popcount —
    bit-identical to the single-query path, incl. forced pruning."""
    bs = [
        t1_engine.builder().keywords(*WORDS, min_match=2),
        t1_engine.builder().keywords(*WORDS, min_match=3),
    ]
    for kw in ({}, {"direct_threshold": 0, "probe_blocks": 4}):
        batch = t1_engine.search_many_built(bs, k=10, **kw).collect()
        per_q = {}
        for r in batch:
            per_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["turn_idx"], r["score"])
            )
        for qid, b in enumerate(bs):
            assert per_q.get(qid, []) == _topk(b.top_k(10)), (qid, kw)


def test_minmatch_percolate_parity(spark, t1_rows, t1_engine, t1_oracle):
    from joie_spark.operators.percolate import percolate

    expr = MinShould(WORDS, 2)
    df = spark.createDataFrame(t1_rows)
    got = {
        (r["conv_id"], r["turn_idx"])
        for r in percolate(df, [expr]).collect()
    }
    by_doc = {d: c for c, d in t1_oracle.doc_of_conv.items()}
    want = {(by_doc[d], t) for d, t in t1_oracle._eval(expr)}
    assert got == want


def test_minmatch_rejects_bad_args(t1_engine):
    with pytest.raises(ValueError):
        t1_engine.builder().keywords("a", "b", min_match=3)
    with pytest.raises(ValueError):
        t1_engine.builder().keywords("crystal kingdom", "roll", min_match=2).matches()


def test_minmatch_composes(t1_engine, t1_oracle):
    from joie_spark.plans.parser import And, Literal

    b = (
        t1_engine.builder()
        .keywords(*WORDS, min_match=2)
        .and_(t1_engine.builder().keywords("the"))
    )
    expr = And(MinShould(WORDS, 2), Literal("the"))
    assert _topk(b.top_k(10)) == t1_oracle.search_expr(expr, k=10)
