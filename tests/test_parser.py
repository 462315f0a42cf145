import pytest

from joie_spark.plans.parser import And, Literal, Or, QueryParseError, parse_query


def test_adjacent_idents_join_to_phrase():
    assert parse_query("crystal kingdom") == Literal("crystal kingdom")


def test_quoted_literal():
    assert parse_query('"roll for insight"') == Literal("roll for insight")


def test_and_binds_looser_than_or():
    # joie grammar quirk (parser.rs:155-181): a AND b OR c = And(a, Or(b,c))
    assert parse_query("a AND b OR c") == And(
        Literal("a"), Or(Literal("b"), Literal("c"))
    )
    assert parse_query("a OR b AND c") == And(
        Or(Literal("a"), Literal("b")), Literal("c")
    )


def test_left_assoc():
    assert parse_query("a AND b AND c") == And(
        And(Literal("a"), Literal("b")), Literal("c")
    )
    assert parse_query("a OR b OR c") == Or(
        Or(Literal("a"), Literal("b")), Literal("c")
    )


def test_parens_and_operators():
    assert parse_query("(a OR b) AND c") == And(
        Or(Literal("a"), Literal("b")), Literal("c")
    )
    assert parse_query("a && b") == And(Literal("a"), Literal("b"))
    assert parse_query("a || b") == Or(Literal("a"), Literal("b"))


def test_keywords_must_match_exactly():
    # "And" (mixed case) is an ident, and idents join into a phrase
    assert parse_query("a And b") == Literal("a And b")


def test_errors():
    with pytest.raises(QueryParseError):
        parse_query("")
    with pytest.raises(QueryParseError):
        parse_query("(a OR b")
    with pytest.raises(QueryParseError):
        parse_query('"unterminated')
