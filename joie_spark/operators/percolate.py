"""Percolation: standing queries evaluated against turns map-side.

The index answers "which turns match this query?"; percolation answers
the reverse — "which of my REGISTERED queries match this turn?" — the
Elasticsearch percolator / streaming-alerting shape.  A firehose
deployment runs this next to the ingest: route/flag/alert on incoming
transcript turns the moment they arrive, no index required.

Scale shape: ONE pass — tokenize (the build's own Arrow-batched pandas
UDF, so stemming/segmentation semantics are identical to the index) →
per-turn term→positions map → every registered query's boolean predicate
evaluated as ONE generated SQL expression over that map → explode the
matches.  Zero shuffles at any corpus size or query count (plan-audited:
no Exchange), so it parallelizes perfectly across a 1000-executor
stream and works unchanged on a static DataFrame or a readStream
micro-batch (pure map-side, no state, no watermark needed).

Semantics equal the index path (tests/test_percolate.py pins percolate
== Engine match_set for the full algebra), with one documented
divergence: prefix/fuzzy expansion is exact per turn — the index path's
PREFIX_MAX_EXPANSIONS df-heaviest cap cannot bind here (there is no
global dictionary to cap against), so on vocabularies where the cap
truncates, percolate matches a superset.

Registered-query-set scale: predicates compile into the plan, so the
practical ceiling is plan size (~thousands of standing queries per
stream — the alerting regime).  Percolating MILLIONS of queries is a
different operator (an index over the queries), out of scope like it is
for the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.parser import (
    And,
    AndNot,
    Expr,
    Fuzzy,
    Literal,
    MinShould,
    Near,
    Or,
    Prefix,
    Regex,
    Within,
    parse_query,
)
from ..tokenizer import tokenize_terms

_PM = "_joie_pm"


def _sql_str(s: str) -> str:
    """Spark SQL single-quoted string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _pred_sql(e: Expr) -> str:
    """One query AST → a boolean SQL expression over the per-turn
    term→positions map (the string-keyed analogue of the batch engine's
    _batch_pred_sql, which runs over interned term-id bitmasks)."""
    if isinstance(e, Literal):
        terms = tokenize_terms(e.text)
        if not terms:
            return "false"
        present = " AND ".join(
            f"map_contains_key({_PM}, {_sql_str(t)})" for t in sorted(set(terms))
        )
        if len(terms) == 1:
            return present
        conds = " AND ".join(
            f"array_contains(element_at({_PM}, {_sql_str(t)}), p + {j})"
            for j, t in enumerate(terms[1:], start=1)
        )
        adj = f"exists(element_at({_PM}, {_sql_str(terms[0])}), p -> {conds})"
        return f"({present}) AND {adj}"
    if isinstance(e, Prefix):
        return (
            f"exists(map_keys({_PM}), t -> startswith(t, {_sql_str(e.text.lower())}))"
        )
    if isinstance(e, Fuzzy):
        q = e.text.lower()
        k = int(e.max_edits)
        return (
            f"exists(map_keys({_PM}), t -> length(t) BETWEEN {len(q) - k} "
            f"AND {len(q) + k} AND levenshtein(t, {_sql_str(q)}) <= {k})"
        )
    if isinstance(e, MinShould):
        terms = []
        for w in e.words:
            toks = tokenize_terms(w)
            if len(toks) != 1:
                raise ValueError(
                    "min_match words must each tokenize to one word: "
                    f"{w!r} -> {toks}"
                )
            terms.append(toks[0])
        total = " + ".join(
            f"CAST(map_contains_key({_PM}, {_sql_str(t)}) AS INT)"
            for t in sorted(set(terms))
        )
        return f"({total}) >= {int(e.m)}"
    if isinstance(e, Regex):
        # anchored like Index.expand_regex — whole-term match; per-turn
        # evaluation is exact (no df-heaviest cap can bind here)
        pat = "^(?:" + e.pattern.lower() + ")$"
        return f"exists(map_keys({_PM}), t -> t RLIKE {_sql_str(pat)})"
    if isinstance(e, Near):
        lw = tokenize_terms(e.lhs)
        rw = tokenize_terms(e.rhs)
        if len(lw) != 1 or len(rw) != 1:
            raise ValueError(
                "near() sides must each tokenize to exactly one word: "
                f"{e.lhs!r} -> {lw}, {e.rhs!r} -> {rw}"
            )
        a, b = _sql_str(lw[0]), _sql_str(rw[0])
        cond = (
            f"q > p AND q - p <= {int(e.slop)}"
            if e.ordered
            else f"q != p AND abs(q - p) <= {int(e.slop)}"
        )
        return (
            f"map_contains_key({_PM}, {a}) AND map_contains_key({_PM}, {b})"
            f" AND exists(element_at({_PM}, {a}), p -> "
            f"exists(element_at({_PM}, {b}), q -> {cond}))"
        )
    if isinstance(e, Within):
        terms = []
        for w in e.words:
            toks = tokenize_terms(w)
            if len(toks) != 1:
                raise ValueError(
                    "within() words must each tokenize to exactly one "
                    f"word: {w!r} -> {toks}"
                )
            terms.append(toks[0])
        terms = sorted(set(terms))  # stem-collapsed dupes: one requirement
        present = " AND ".join(
            f"map_contains_key({_PM}, {_sql_str(t)})" for t in terms
        )
        if len(terms) == 1:
            return present
        arrs = ", ".join(f"element_at({_PM}, {_sql_str(t)})" for t in terms)
        covered = " AND ".join(
            f"exists(element_at({_PM}, {_sql_str(t)}), "
            f"q -> q >= p AND q <= p + {int(e.window)})"
            for t in terms
        )
        return (
            f"({present}) AND exists(flatten(array({arrs})), p -> {covered})"
        )
    if isinstance(e, And):
        return f"({_pred_sql(e.lhs)}) AND ({_pred_sql(e.rhs)})"
    if isinstance(e, Or):
        return f"({_pred_sql(e.lhs)}) OR ({_pred_sql(e.rhs)})"
    if isinstance(e, AndNot):
        return f"({_pred_sql(e.lhs)}) AND NOT ({_pred_sql(e.rhs)})"
    raise TypeError(type(e))


def percolate(
    turns: DataFrame,
    queries: list,
    keep: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(query_id, *keep) for every (registered query, turn) match.

    `queries`: strings (parsed with the reference grammar) and/or
    pre-built Expr ASTs (e.g. `builder_obj._expr` for the builder-only
    near/prefix/fuzzy/and_not extensions).  `keep` defaults to every
    input column except the text itself.  Works identically on a static
    DataFrame and a Structured Streaming source (stateless map-side
    plan)."""
    from .build import tokenize_udf

    exprs = [parse_query(q) if isinstance(q, str) else q for q in queries]
    if not exprs:
        raise ValueError("percolate() needs at least one query")
    keep = list(keep) if keep is not None else [
        c for c in turns.columns if c != text_col
    ]
    pm = (
        "map_from_entries(transform(_joie_tok.grouped,"
        " g -> struct(g.term, g.positions)))"
    )
    matched = "filter(array({}), x -> x.m)".format(
        ", ".join(
            f"named_struct('query_id', {i}, 'm', ({_pred_sql(e)}))"
            for i, e in enumerate(exprs)
        )
    )
    return (
        turns.withColumn("_joie_tok", tokenize_udf(F.col(text_col)))
        .withColumn(_PM, F.expr(pm))
        .select(F.explode(F.expr(matched)).alias("_joie_e"), *keep)
        .select(F.col("_joie_e.query_id").alias("query_id"), *keep)
    )


def percolate_stream(
    stream: DataFrame,
    queries: list,
    keep: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """percolate() for a readStream source — the same stateless plan
    (alias kept so streaming callers find it next to ingest.py's
    operators); write with .writeStream in append mode, no watermark
    required."""
    return percolate(stream, queries, keep=keep, text_col=text_col)
