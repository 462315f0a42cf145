"""Query-language frontend: lexer + parser producing the boolean AST.

Mirrors the reference grammar exactly (engine/src/query/parser.rs:14-30
lexer, :155-181 grammar), including its two quirks:

  * **AND binds looser than OR** (`expression = and; and = and AND or / or;
    or = or OR atom / atom`) — the opposite of SQL convention.  So
    ``a AND b OR c`` parses as ``And(a, Or(b, c))``.
  * adjacent bare words join into ONE phrase literal
    (`literal = quoted / ident+`, parser.rs:174-177): ``crystal kingdom``
    is the phrase "crystal kingdom", not two keywords.

Every literal is planned as a phrase query (parser.rs:87-90), with the
reference's rewrites (mirrored in joie_spark.operators.query):
AND(lit,lit) → flattened intersecting-phrase pass (parser.rs:91-105);
OR(lit,lit) with single-term sides → 2-term keyword union
(parser.rs:112-122).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Expr:
    pass


@dataclass(frozen=True)
class Literal(Expr):
    text: str  # raw phrase text; tokenized by the engine at plan time


@dataclass(frozen=True)
class And(Expr):
    lhs: Expr
    rhs: Expr


@dataclass(frozen=True)
class Or(Expr):
    lhs: Expr
    rhs: Expr


@dataclass(frozen=True)
class AndNot(Expr):
    """Boolean difference: turns matching ``lhs`` and NOT matching
    ``rhs`` (the Lucene prohibited-clause rule: negation is only legal
    against a positive clause — a bare NOT would be a corpus-wide scan
    by definition).  ``rhs`` terms do not participate in BM25 scoring.
    Beyond-reference extension — builder-only."""

    lhs: Expr
    rhs: Expr


@dataclass(frozen=True)
class Prefix(Expr):
    """Wildcard term query `text*`: matches every dictionary term that
    starts with ``text`` (lowercased verbatim — NOT stemmed/tokenized,
    the Lucene rule: wildcard patterns are never analyzed, a stemmer
    would corrupt the user's prefix).  Beyond-reference extension —
    builder-only, the string grammar stays exactly the reference's
    (engine/src/query/parser.rs:155-181)."""

    text: str


@dataclass(frozen=True)
class Fuzzy(Expr):
    """Fuzzy term query `text~`: matches every dictionary term within
    ``max_edits`` Levenshtein distance of ``text`` (lowercased verbatim —
    like Prefix, fuzzy patterns are never analyzed/stemmed).  Beyond-
    reference extension — builder-only."""

    text: str
    max_edits: int = 1


@dataclass(frozen=True)
class MinShould(Expr):
    """minimum_should_match (the Lucene/ES BooleanQuery knob): a turn
    matches when at least ``m`` of the ``words`` occur in it (each word
    tokenized/stemmed like any literal).  m=1 is the ordinary OR,
    m=len(words) the ordinary AND — the interesting middle ground is
    recall-with-precision over long keyword lists.  All matched words
    score (standard BooleanQuery scoring).  Beyond-reference extension —
    builder-only."""

    words: tuple[str, ...]
    m: int


@dataclass(frozen=True)
class Regex(Expr):
    """Regex term query: matches every dictionary term the pattern
    FULLY matches (Lucene RegexpQuery semantics: anchored to the whole
    term; lowercased verbatim — like Prefix, patterns are never
    analyzed/stemmed).  Keep patterns in the RE2-safe common subset
    (literals, classes, ``.*+?|()[]{}``) — no backrefs/lookaround — so
    the same pattern means the same thing in Spark (Java regex), DuckDB
    (RE2) and Python.  Beyond-reference extension — builder-only."""

    pattern: str


@dataclass(frozen=True)
class Near(Expr):
    """Proximity query: single words ``lhs`` and ``rhs`` co-occur in one
    turn within ``slop`` token positions (|p_r − p_l| ≤ slop; ordered ⇒
    0 < p_r − p_l ≤ slop).  Words tokenize/stem like any literal.
    Beyond-reference extension — builder-only."""

    lhs: str
    rhs: str
    slop: int = 3
    ordered: bool = False


@dataclass(frozen=True)
class Within(Expr):
    """k-term unordered proximity (the Lucene SpanNearQuery / surround
    ``W(a, b, c)`` shape, generalizing :class:`Near` past two terms):
    a turn matches when some choice of one position per word spans at
    most ``window`` token positions (max − min ≤ window).  Equivalently
    — and this is how both evaluation paths compute it without
    enumerating the k-way cross product — ∃ anchor position p drawn
    from ANY of the words such that EVERY word has a position in
    [p, p+window]: the anchor ranges over candidate span minima, so the
    two forms accept exactly the same turns.  Words tokenize/stem like
    any literal; all of them participate in BM25 scoring (standard
    BooleanQuery rule).  Words that stem to the same dictionary term
    collapse into one requirement.  Beyond-reference extension —
    builder-only."""

    words: tuple[str, ...]
    window: int = 8


class QueryParseError(ValueError):
    pass


_KEYWORDS_AND = {"AND", "and", "&&"}
_KEYWORDS_OR = {"OR", "or", "||"}


def _lex(q: str) -> list[tuple[str, str]]:
    """Tokens: (kind, value); kind ∈ {IDENT, QUOTED, AND, OR, LP, RP}.

    Mirrors the logos lexer (parser.rs:14-30): quoted strings keep their
    raw inner text (escapes are NOT unescaped — the reference passes the
    raw slice through, parser.rs:16); idents are maximal runs of
    characters other than whitespace, quotes and parens; AND/OR keyword
    tokens only when the whole run matches exactly.
    """
    toks: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == "(":
            toks.append(("LP", c))
            i += 1
        elif c == ")":
            toks.append(("RP", c))
            i += 1
        elif c == '"':
            j = i + 1
            while j < n:
                if q[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if q[j] == '"':
                    break
                j += 1
            if j >= n:
                raise QueryParseError(f"unterminated quote at {i}")
            toks.append(("QUOTED", q[i + 1 : j]))
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '"()':
                j += 1
            word = q[i:j]
            if word in _KEYWORDS_AND:
                toks.append(("AND", word))
            elif word in _KEYWORDS_OR:
                toks.append(("OR", word))
            else:
                toks.append(("IDENT", word))
            i = j
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.pos = 0

    def peek(self) -> str | None:
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def expect(self, kind: str) -> str:
        if self.peek() != kind:
            raise QueryParseError(f"expected {kind} at token {self.pos}")
        v = self.toks[self.pos][1]
        self.pos += 1
        return v

    # and = and AND or / or    (left-assoc; loosest binding)
    def parse_and(self) -> Expr:
        node = self.parse_or()
        while self.peek() == "AND":
            self.pos += 1
            node = And(node, self.parse_or())
        return node

    # or = or OR atom / atom   (left-assoc)
    def parse_or(self) -> Expr:
        node = self.parse_atom()
        while self.peek() == "OR":
            self.pos += 1
            node = Or(node, self.parse_atom())
        return node

    def parse_atom(self) -> Expr:
        k = self.peek()
        if k == "LP":
            self.pos += 1
            node = self.parse_and()
            self.expect("RP")
            return node
        if k == "QUOTED":
            return Literal(self.expect("QUOTED"))
        if k == "IDENT":
            words = [self.expect("IDENT")]
            while self.peek() == "IDENT":
                words.append(self.expect("IDENT"))
            return Literal(" ".join(words))
        raise QueryParseError(f"unexpected token at {self.pos}: {k}")


def parse_query(q: str) -> Expr:
    toks = _lex(q)
    if not toks:
        raise QueryParseError("empty query")
    p = _Parser(toks)
    node = p.parse_and()
    if p.pos != len(toks):
        raise QueryParseError(f"trailing tokens at {p.pos}")
    return node


def literals(expr: Expr) -> list[str]:
    """All literal phrase texts in the tree (planner helper)."""
    if isinstance(expr, Literal):
        return [expr.text]
    if isinstance(expr, (And, Or)):
        return literals(expr.lhs) + literals(expr.rhs)
    raise TypeError(type(expr))
