"""Snippet highlighting parity: the Spark post-top-k highlighter must
produce the oracle's ranges/parts (keywords.rs/phrase.rs/highlight.rs
semantics) for every returned row."""

from joie_spark.oracle import collapse_ranges, highlight_parts, highlight_phrase
from joie_spark.plans.parser import Literal, parse_query
from joie_spark.tokenizer import tokenize_terms


def _oracle_parts(oracle, key, query):
    expr = parse_query(query)

    def lits(e):
        if isinstance(e, Literal):
            return [e.text]
        return lits(e.lhs) + lits(e.rhs)

    turn = oracle.turns[key]
    ranges = []
    for lit in lits(expr):
        phrase = [oracle.term_id.get(t, 0) for t in tokenize_terms(lit)]
        ranges.extend(highlight_phrase(turn, phrase))
    ranges.sort(key=lambda r: r[0])
    return highlight_parts(turn.text, collapse_ranges(ranges))


def _spark_parts(engine, query, k=5):
    out = {}
    for r in engine.search_highlighted(query, k=k).collect():
        out[(r["doc_id"], r["turn_idx"])] = [(p["kind"], p["text"]) for p in r["parts"]]
    return out


import pytest


@pytest.mark.parametrize(
    "query",
    [
        '"crystal kingdom"',
        '"roll for insight" OR dice',
        "roll AND dice",
        '"crystal crystal kingdom"',  # duplicate-term phrase
    ],
)
def test_highlight_parity(query, t1_engine, t1_oracle):
    got = _spark_parts(t1_engine, query)
    assert got, f"no results for {query}"
    for key, parts in got.items():
        want = _oracle_parts(t1_oracle, key, query)
        assert parts == want, f"{key}: {parts} != {want}"
    # every highlighted row must contain at least one highlight part
    for parts in got.values():
        assert any(kind == "highlight" for kind, _ in parts)


def test_batch_highlights_match_per_query(t1_engine):
    """search_many_highlighted == per-query search_highlighted rows
    (same hits, same parts, keyed by query_id) in one pass."""
    queries = ['"crystal kingdom"', "roll AND dice", "roll OR dice"]
    got = {}
    for r in t1_engine.search_many_highlighted(queries, k=5).collect():
        got[(r["query_id"], r["doc_id"], r["turn_idx"])] = (
            r["score"],
            [(p["kind"], p["text"]) for p in r["parts"]],
        )
    want = {}
    for qid, q in enumerate(queries):
        for r in t1_engine.search_highlighted(q, k=5).collect():
            want[(qid, r["doc_id"], r["turn_idx"])] = (
                r["score"],
                [(p["kind"], p["text"]) for p in r["parts"]],
            )
    assert got == want and got


def test_batch_highlights_order_contract(t1_engine):
    rows = t1_engine.search_many_highlighted(["roll OR dice", "the"], k=4).collect()
    keys = [(r["query_id"], -r["score"], r["doc_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)


def test_highlight_reconstructs_text(t1_engine, t1_oracle):
    got = _spark_parts(t1_engine, '"crystal kingdom"')
    for (doc, turn), parts in got.items():
        text = next(
            t.text for k, t in t1_oracle.turns.items() if k == (doc, turn)
        )
        assert "".join(p for _, p in parts) == text
