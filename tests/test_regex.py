"""Regex term queries (plans/parser.py Regex → Index.expand_regex →
PKeywords) — builder-only surface beyond the reference grammar, pinned
rank-identical to the pure-Python oracle and internally consistent with
prefix() and spelled-out keyword ORs."""

import pytest

from joie_spark.plans.parser import And, AndNot, Literal, Prefix, Regex

PATTERNS = [
    "ro.*",        # literal prefix → pushdown-eligible
    ".*ing",       # leading wildcard → full dictionary scan
    "d(i|u)ce",    # alternation
    "rolls?",      # optional suffix — prefix derivation must drop the 's'
    "roll|dice",   # top-level alternation — no sound literal prefix
    "zzz.*",       # matches nothing
]


def _topk(df):
    return [(r["doc_id"], r["turn_idx"], r["score"]) for r in df.collect()]


def _matches(df):
    return {(r["doc_id"], r["turn_idx"]) for r in df.collect()}


@pytest.mark.parametrize("pat", PATTERNS)
def test_regex_rank_identity(pat, t1_engine, t1_oracle):
    b = t1_engine.builder().regex(pat)
    expr = Regex(pat)
    assert _matches(b.matches()) == t1_oracle._eval(expr), pat
    assert _topk(b.top_k(10)) == t1_oracle.search_expr(expr, k=10), pat


def test_regex_expansion_matches_oracle_ids(t1_engine, t1_oracle):
    """Engine and oracle share the dense id space, so expansions must
    agree id-for-id; matching is anchored (whole-term) — 'oll' must NOT
    match 'roll'."""
    got = sorted(tid for tid, _ in t1_engine.index.expand_regex("ro.*"))
    assert got == t1_oracle.expand_regex("ro.*")
    assert got, "fixture too weak: no ro- terms"
    assert t1_engine.index.expand_regex("oll") == []  # anchored


def test_regex_prefix_equivalence(t1_engine):
    """`ro.*` is exactly prefix('ro') — same expansion, same ranking."""
    a = _topk(t1_engine.builder().regex("ro.*").top_k(10))
    b = _topk(t1_engine.builder().prefix("ro").top_k(10))
    assert a == b


def test_regex_equals_spelled_out_or(t1_engine, t1_oracle):
    """The MultiTermQuery rewrite contract: a regex scores exactly like
    the keyword OR of its expansion."""
    terms = [
        t
        for t, tid in t1_oracle.term_id.items()
        if tid in set(t1_oracle.expand_regex("d(i|u)ce"))
    ]
    assert terms
    a = _topk(t1_engine.builder().regex("d(i|u)ce").top_k(10))
    b = _topk(t1_engine.builder().keywords(*terms).top_k(10))
    # keywords() re-tokenizes (stems) its words, regex never does — only
    # compare when the expansion is stem-stable
    from joie_spark.tokenizer import tokenize_terms

    if all(tokenize_terms(t) == [t] for t in terms):
        assert a == b


def test_regex_expansion_cap_keeps_df_heaviest(t1_engine):
    full = t1_engine.index.expand_regex("ro.*")
    assert len(full) >= 2
    capped = t1_engine.index.expand_regex("ro.*", max_expansions=1)
    best = max(full, key=lambda p: (p[1], -p[0]))
    assert capped == [best]


def test_regex_case_folds_and_rejects_empty(t1_engine):
    a = _matches(t1_engine.builder().regex("RO.*").matches())
    b = _matches(t1_engine.builder().regex("ro.*").matches())
    assert a == b
    with pytest.raises(ValueError):
        t1_engine.builder().regex("  ")
    with pytest.raises(ValueError):
        t1_engine.index.expand_regex("")


def test_regex_composes(t1_engine, t1_oracle):
    b = (
        t1_engine.builder().regex("ro.*")
        & t1_engine.builder().phrase("crystal kingdom")
    )
    expr = And(Regex("ro.*"), Literal("crystal kingdom"))
    assert _topk(b.top_k(10)) == t1_oracle.search_expr(expr, k=10)
    b2 = t1_engine.builder().regex("ro.*") - t1_engine.builder().keywords("dice")
    expr2 = AndNot(Regex("ro.*"), Literal("dice"))
    assert _matches(b2.matches()) == t1_oracle._eval(expr2)


def test_regex_batch_bit_identical(t1_engine):
    """Regex rides the batch path (shared expansion → PKeywords → blocks
    scan) bit-identically to the single-query builder path, including
    duplicate patterns costing one dictionary scan."""
    bs = [
        t1_engine.builder().regex("ro.*"),
        t1_engine.builder().regex("d(i|u)ce").and_(
            t1_engine.builder().keywords("roll")
        ),
        t1_engine.builder().regex("ro.*"),  # duplicate pattern
    ]
    batch = t1_engine.search_many_built(bs, k=10).collect()
    per_q = {}
    for r in batch:
        per_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["turn_idx"], r["score"])
        )
    for qid, b in enumerate(bs):
        assert per_q.get(qid, []) == _topk(b.top_k(10)), qid
    assert per_q[0] == per_q[2]


def test_prefix_rejects_colon(t1_engine):
    """':' can never appear in a dictionary term; refusing it keeps the
    're:<pattern>' expansion namespace collision-free (see lower())."""
    with pytest.raises(ValueError):
        t1_engine.builder().prefix("re:x")


def test_literal_prefix_soundness():
    """The derived prefix must never exclude a pattern match."""
    import re

    from joie_spark.operators.query import _regex_literal_prefix

    cases = {
        "ro.*": "ro",
        "rolls?": "roll",     # 's' optional
        "rol+": "rol",        # '+' keeps its char
        "roll|dice": "",      # top-level alternation
        "d(i|u)ce": "d",      # grouped alternation after literal
        "(ro|di)ce": "",
        "ro[l]+": "ro",
        "roll{0,1}": "rol",   # '{' can zero out its char
        r"roll\d?": "roll",
        ".*ing": "",
    }
    for pat, want in cases.items():
        assert _regex_literal_prefix(pat) == want, pat
        # soundness: sample strings matching the pattern start with it
        rx = re.compile(pat)
        for probe in ("roll", "rolls", "rol", "dice", "duce", "roce",
                      "dice", "king", "rolling", "roll1"):
            if rx.fullmatch(probe):
                assert probe.startswith(_regex_literal_prefix(pat)), (pat, probe)


def test_regex_pushdown_prefix_derivation(t1_engine):
    """A literal pattern prefix adds a startswith predicate (pushed to
    the dictionary scan); correctness is unchanged either way."""
    got = t1_engine.index.expand_regex("ro[l]+")
    # same result as the unprefixed scan path (leading wildcard)
    via_wild = [
        (tid, df)
        for tid, df in t1_engine.index.expand_regex(".*")
        if tid in {t for t, _ in got}
    ]
    assert sorted(got) == sorted(via_wild)
