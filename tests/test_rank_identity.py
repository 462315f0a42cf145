"""The correctness gate (FIXTURES.md §3-4): the Spark engine's BM25 top-k
must be rank-identical — exact docID sequence AND bit-identical float64
scores — to the single-node oracle on the frozen query set, and boolean
match sets must be exactly equal."""

import pytest

from joie_spark.corpus import HOT_TERMS

# q01..q12 per FIXTURES.md §4 (rare/OOV terms chosen from the corpus spec:
# rare tail lemmas are the _lemmas()[1] list; 'baranis' is one of them)
FROZEN_QUERIES = {
    "q01_hot_keyword": "the",
    "q02_rare_keyword": "venimus",
    "q03_oov": "zzzzunseenzzz",
    "q04_two_term_or": "roll OR dice",
    "q05_k_term_or": "roll OR dice OR game OR kingdom",
    "q06_two_phrase_and": '"crystal kingdom" AND "roll for insight"',
    "q07_nested": '(roll OR "crystal kingdom") AND dice',
    "q08_phrase": '"crystal kingdom"',
    "q09_bare_phrase": "roll for insight",
    "q10_filtered": "roll OR dice",  # + role filter, see test below
    "q11_precedence": "roll AND dice OR game",
    "q12_phrase_dup_terms": '"crystal crystal kingdom"',
}


@pytest.mark.parametrize("qid", sorted(FROZEN_QUERIES))
def test_match_set_equality(qid, t1_engine, t1_oracle):
    q = FROZEN_QUERIES[qid]
    got = {
        (r["doc_id"], r["turn_idx"])
        for r in t1_engine.match_set(q).collect()
    }
    want = t1_oracle.match_set(q)
    assert got == want, f"{qid}: spark={len(got)} oracle={len(want)}"


@pytest.mark.parametrize("qid", sorted(FROZEN_QUERIES))
def test_topk_rank_identical(qid, t1_engine, t1_oracle):
    q = FROZEN_QUERIES[qid]
    got = [
        (r["doc_id"], r["turn_idx"], r["score"])
        for r in t1_engine.search(q, k=10).collect()
    ]
    want = t1_oracle.search(q, k=10)
    assert got == want, f"{qid}\n spark={got}\n oracle={want}"


def test_filtered_query_rank_identical(t1_engine, t1_oracle):
    q = FROZEN_QUERIES["q10_filtered"]
    got = [
        (r["doc_id"], r["turn_idx"], r["score"])
        for r in t1_engine.search(q, k=10, where="role = 'user'").collect()
    ]
    want = t1_oracle.search(q, k=10, turn_filter=lambda t: t.role == "user")
    assert got == want


def test_doc_filtered_query_rank_identical(t1_engine, t1_oracle):
    """DocumentFilter analogue (engine/src/query/filter.rs:7-34): SQL
    predicate on the doc_meta table vs oracle doc-level predicate."""
    got = [
        (r["doc_id"], r["turn_idx"], r["score"])
        for r in t1_engine.search(
            "roll OR dice", k=10, where_doc="n_turns >= 10"
        ).collect()
    ]
    want = t1_oracle.search(
        "roll OR dice", k=10, doc_filter=lambda m: m["n_turns"] >= 10
    )
    assert got == want
    assert got, "doc filter should keep some matches on t1"


def test_unoptimized_plan_same_results(t1_engine, t1_oracle):
    # fast paths (keyword fusion, intersecting-phrase flattening) must not
    # change semantics (parser.rs:91-122 are rewrites, not semantics)
    for q in ('"crystal kingdom" AND "roll for insight"', "roll OR dice"):
        a = [tuple(r) for r in t1_engine.search(q, k=10, optimize=True).collect()]
        b = [tuple(r) for r in t1_engine.search(q, k=10, optimize=False).collect()]
        assert a == b


def test_phrase_near_miss_excluded(t1_oracle):
    # near-miss turns contain the terms non-adjacently; the corpus plants
    # "crystal bright kingdom" / "kingdom of crystal" at ci%13==0, ti=0
    matches = t1_oracle.match_set('"crystal kingdom"')
    near_miss_keys = {
        (t.doc_id, t.turn_idx)
        for t in t1_oracle.turns.values()
        if "crystal bright kingdom" in t.text
    }
    assert near_miss_keys, "corpus should contain near-miss turns"
    assert not (matches & near_miss_keys)


def test_hot_terms_are_hot(t1_oracle):
    # corpus contract: each hot term in >10% of turns (skew-path fixture)
    n = t1_oracle.n_turns
    for w in HOT_TERMS[:5]:
        tid = t1_oracle.term_id.get(w) or t1_oracle.term_id.get(w[:-1])
        from joie_spark.stemmer import stem

        tid = t1_oracle.term_id[stem(w)]
        assert t1_oracle.df[tid] > 0.10 * n


def test_phrase_rarest_seed_rank_identity(t1_engine, t1_oracle, monkeypatch):
    """VERDICT r4 item 2: rarest-term-first phrase seeding (query.py
    _phrase_candidates) must be invisible in results — forcing the seed
    ON for every phrase (ratio 1.0) and OFF (ratio ∞) must both equal
    the oracle, including stopword-phrases where the seed engages for
    real ('the X' shapes) and dup-term phrases."""
    import joie_spark.operators.query as Q

    queries = [
        '"crystal kingdom"',
        '"roll for insight"',
        '"the crystal"',
        '"crystal crystal kingdom"',
        '"crystal kingdom" AND "roll for insight"',
    ]
    for q in queries:
        want_match = t1_oracle.match_set(q)
        want_top = t1_oracle.search(q, k=10)
        for ratio in (1.0, float("inf")):
            monkeypatch.setattr(Q, "PHRASE_SEED_DF_RATIO", ratio)
            # ratio 1.0 must actually engage the seed on the tiny corpus
            monkeypatch.setattr(Q, "PHRASE_SEED_MIN_HOT_DF", 0)
            got_match = {
                (r["doc_id"], r["turn_idx"])
                for r in t1_engine.match_set(q).collect()
            }
            assert got_match == want_match, (q, ratio)
            got_top = [
                (r["doc_id"], r["turn_idx"], r["score"])
                for r in t1_engine.search(q, k=10).collect()
            ]
            assert got_top == want_top, (q, ratio)
