"""significant_terms (engine.py — the ES significant_terms aggregation,
JLH score) pinned to a pure-Python recomputation over the oracle index,
and count() (the ES _count shape) pinned to the oracle match sets."""

import pytest

from joie_spark.plans.parser import parse_query


def _py_significant(oracle, query, k=20, min_fg_df=2):
    matches = oracle._eval(parse_query(query))
    n_match = len(matches)
    assert n_match > 0, "weak fixture: query matches nothing"
    fg: dict[int, int] = {}
    for key in matches:
        for tid in set(oracle.turns[key].terms):
            fg[tid] = fg.get(tid, 0) + 1
    term_of = {tid: t for t, tid in oracle.term_id.items()}
    rows = []
    for tid, f in fg.items():
        if f < min_fg_df:
            continue
        fg_pct = f / n_match
        bg = oracle.df[tid]
        bg_pct = bg / oracle.n_turns
        if fg_pct <= bg_pct:
            continue
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        rows.append((term_of[tid], f, bg, score))
    rows.sort(key=lambda r: (-round(r[3], 6), r[0]))
    return rows[:k]


@pytest.mark.parametrize("query", ["roll", '"crystal kingdom"', "roll OR dice"])
def test_significant_terms_matches_python(query, t1_engine, t1_oracle):
    got = [
        (r["term"], r["fg_df"], r["bg_df"], r["score"])
        for r in t1_engine.significant_terms(query, k=15).collect()
    ]
    want = _py_significant(t1_oracle, query, k=15)
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(round(w[3], 6), abs=2e-6)


def test_significant_terms_query_terms_rank_high(t1_engine):
    """The query's own (stemmed) term must appear in its significant
    list — it is maximally overrepresented by construction (ES keeps
    them too)."""
    terms = [r["term"] for r in t1_engine.significant_terms("roll", k=15).collect()]
    assert "roll" in terms
    # and the background-positive rule held everywhere
    for r in t1_engine.significant_terms("roll", k=50).collect():
        assert r["fg_df"] >= 2
        assert r["fg_df"] <= r["bg_df"]


def test_significant_terms_builder_query(t1_engine, t1_oracle):
    """QueryBuilder input (full algebra) works: within() match set."""
    b = t1_engine.builder().keywords("roll", "dice")
    got = {r["term"] for r in t1_engine.significant_terms(b, k=10).collect()}
    want = {w[0] for w in _py_significant(t1_oracle, "roll OR dice", k=10)}
    assert got == want


@pytest.mark.parametrize(
    "query", ["roll", "roll AND dice", '"crystal kingdom"', "zzzzunseenzzz"]
)
def test_count_matches_oracle(query, t1_engine, t1_oracle):
    got = t1_engine.count(query)
    matches = t1_oracle.match_set(query)
    assert got["n_turns"] == len(matches)
    assert got["n_docs"] == len({d for d, _ in matches})


def test_count_with_filters(t1_engine, t1_oracle):
    got = t1_engine.count("roll", where="role = 'user'")
    matches = {
        key
        for key in t1_oracle.match_set("roll")
        if t1_oracle.turns[key].role == "user"
    }
    assert got["n_turns"] == len(matches)
    assert got["n_docs"] == len({d for d, _ in matches})
