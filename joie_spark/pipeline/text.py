"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side (`pyspark.sql.functions` /
`F.expr`), so they stay inside whole-stage codegen — no Python UDFs.
The SQL-portable tokenizer here (`[a-z0-9]+` over lower(text)) is
deliberately simpler than the engine's UAX#29+stemmer pipeline: it is the
oracle-checkable path (DuckDB can evaluate the identical expression);
the full linguistic pipeline is exercised by the engine's own oracle
tests (tests/test_rank_identity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


def sql_tokens(col: str = "text") -> Column:
    """JVM-side tokenization — identical semantics in DuckDB:
    regexp_extract_all(lower(text), '[a-z0-9]+')."""
    return F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN}', 0)")


def bind_col(df: DataFrame, name: str, col: Column) -> DataFrame:
    """Materialize an expensive expression as a real once-per-row column
    behind a single-element Generate barrier.

    Catalyst's filter pushdown inlines deterministic Project expressions
    into every predicate that references them, so a filter over e.g. a
    duplicate-2-gram ratio re-evaluates the tokenizer + gram chain once
    PER REFERENCE (measured ~10 regexp_extract_all calls per row in the
    cleaning gate's pushed-down filter).  `explode(array(col))` is a
    1:1 Generate whose output column predicates cannot be pushed below
    (and InferFiltersFromGenerate is excluded session-wide), so the
    expression runs exactly once per row.  Row set is unchanged:
    array(col) always has exactly one element, even when col is NULL."""
    return df.select("*", F.explode(F.array(col)).alias(name))


def with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("tokens", sql_tokens())


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counting (whitespace/alnum tokenizer)."""
    return with_tokens(docs).select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct"),
    )


def term_df(docs: DataFrame) -> DataFrame:
    """Global document-frequency / collection-frequency aggregates —
    the df/cf statistics of the index build (SURVEY.md §2.7) over the
    generic documents table."""
    tok = with_tokens(docs).select("doc_id", F.explode("tokens").alias("term"))
    return (
        tok.groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("cf"),
        )
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals: length, mean token length, stopword
    ratio, alnum ratio.  All codegen-friendly; rounded for portability."""
    d = with_tokens(docs)
    n_tok = F.size("tokens").cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.expr(
        f"filter(tokens, t -> array_contains(array({','.join(repr(s) for s in STOPWORDS)}), t))"
    )).cast("double")
    alnum_chars = F.length(F.concat_ws("", F.col("tokens"))).cast("double")
    return d.select(
        "doc_id",
        "lang",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.round(alnum_chars / F.greatest(n_tok, F.lit(1.0)), 4).alias("mean_tok_len"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1.0)), 4).alias("stopword_ratio"),
        F.round(alnum_chars / F.greatest(F.length("text").cast("double"), F.lit(1.0)), 4).alias(
            "alnum_ratio"
        ),
    )


def lang_id_heuristic(docs: DataFrame) -> DataFrame:
    """N-gram-flavoured language-ID heuristic: score = share of tokens in
    an English marker list; predict 'en' above threshold.  Deterministic
    and portable (the real corpus carries a lang column; this is the
    derived signal a pipeline would compute)."""
    markers = ["the", "a", "and", "of", "to", "is", "in", "that"]
    d = with_tokens(docs)
    n_tok = F.size("tokens").cast("double")
    hits = F.size(F.expr(
        f"filter(tokens, t -> array_contains(array({','.join(repr(m) for m in markers)}), t))"
    )).cast("double")
    score = F.round(hits / F.greatest(n_tok, F.lit(1.0)), 4)
    return d.select(
        "doc_id",
        "lang",
        score.alias("en_score"),
        F.when(score >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


# GPT-2-flavoured pretokenizer shape: space-prefixed word runs, digit
# runs, punctuation runs.  Kept backslash-free so the literal is
# byte-identical in Spark SQL (Java regex) and DuckDB (RE2).
BPE_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """Approximate LLM token counting with a BPE-ish pretokenizer regex —
    the budget signal a training-data pipeline computes per document
    (exact BPE merges need a vocab file; the pretokenizer split is the
    portable, deterministic first stage)."""
    toks = F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_raw"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream —
    canonicalization-stable content hash for dedup lineage."""
    d = with_tokens(docs)
    return d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.col("tokens"))).alias("fp"),
    )


def ngram_sql(n: int, tokens_col: str = "tokens") -> str:
    """Token n-grams as space-joined strings — SQL text (shared by every
    gram-producing operator and by importance._grams' concat form).

    n=1 is the token array itself (zero copies).  n>=2 builds the grams
    as a chain of zip_with over n shifted bulk-slice views — measured
    ~10x faster at sf0.1 than the naive transform(sequence -> slice ->
    concat_ws) shape, whose per-position slice() allocates an n-element
    array PER GRAM (that shape made the composed cleaning gate the
    slowest entry in the whole bench before this change).  Values and
    order are identical to the naive shape: position order, single-space
    joins."""
    if n == 1:
        return tokens_col
    m = f"size({tokens_col}) - {n - 1}"
    acc = f"slice({tokens_col}, 1, {m})"
    for i in range(2, n + 1):
        acc = (
            f"zip_with({acc}, slice({tokens_col}, {i}, {m}),"
            f" (a, b) -> concat(a, ' ', b))"
        )
    return f"CASE WHEN size({tokens_col}) < {n} THEN array() ELSE {acc} END"


def ngram_array(n: int, tokens_col: str = "tokens") -> Column:
    """Token n-grams as space-joined strings (array column, codegen)."""
    return F.expr(ngram_sql(n, tokens_col))


def top_ngram_share(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher's *top* n-gram family (Rae et al. 2021 §A1.1): the share of
    a document's n-gram occurrences taken by its single most frequent
    n-gram.  Complements `repetition_stats`'s dup fractions — the dup
    fraction says "many grams repeat", the top share says "ONE gram
    dominates" (a chorus, a nav bar, a spam token).

    The mode is a PER-DOCUMENT statistic, so it needs no shuffle at all
    (round 6; previously explode -> groupBy(doc_id, gram) -> groupBy
    (doc_id) -> join back, i.e. two corpus-sized exchanges): sort the
    doc's own gram array and take the longest equal run with one
    codegen `aggregate` fold — top_count and n_grams are then plain
    scan-stage expressions, the same zero-shuffle shape as
    `repetition_stats`.  Docs with fewer than n tokens emit share 0.0
    rather than vanishing.  Share is count-based (top_count / n_grams):
    ties in the top count do not affect it, so the value is
    deterministic without a gram-name tiebreak."""
    d = with_tokens(docs).withColumn("_g", ngram_array(n))
    # coalesce: a NULL text tokenizes to NULL, and the old explode+join
    # shape emitted (0, 0, 0.0) for such docs — keep that contract
    top = F.coalesce(
        F.expr(
            "aggregate(array_sort(_g),"
            " named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),"
            " (acc, x) -> named_struct("
            "   'prev', x,"
            "   'run', CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END,"
            "   'best', greatest(acc.best,"
            "     CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END)),"
            " acc -> acc.best)"
        ),
        F.lit(0).cast("long"),
    )
    n_grams = F.coalesce(F.size("_g"), F.lit(0)).cast("long")
    d = d.withColumn("_ng", n_grams).withColumn("_top", top)
    return d.select(
        "doc_id",
        F.col("_ng").alias("n_grams"),
        F.col("_top").alias("top_count"),
        F.round(
            F.when(
                F.col("_ng") > 0,
                F.col("_top").cast("double") / F.col("_ng"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_share"),
    )


# C4-style boilerplate marker phrases (Raffel et al. 2020 §2.2: pages
# with these are navigation chrome / legal shells, not prose).  Matched
# as plain substrings of lower(text) — no regex needed, so Spark and the
# DuckDB oracle share exact semantics via contains/instr.
BOILERPLATE_MARKERS = (
    "lorem ipsum",
    "javascript",
    "cookie",
    "privacy policy",
    "terms of use",
)


def web_stats(docs: DataFrame) -> DataFrame:
    """C4-flavoured web-cleaning signals, one map-side pass:

      n_urls / url_char_frac      http(s)://... and www.... runs,
      bullet_line_frac            lines starting with '-' or '*',
      ellipsis_line_frac          lines ending with '...',
      term_punct_line_frac        lines ending with . ! ? or '"'
                                  (C4 keeps only such lines),
      n_boilerplate               total hits of BOILERPLATE_MARKERS.

    Line fractions are over NON-EMPTY lines (whitespace-only lines are
    chrome, not content); 0.0 when a doc has none.  Everything is
    regexp/array arithmetic inside the scan's codegen stage — no
    explode, no shuffle, free at 100 TB.  The URL pattern avoids
    backslash classes ([^ \\t\\n] spelled as a negated literal class) so
    the identical literal runs in Java regex and DuckDB's RE2 (driver
    entry web_stats)."""
    url_pat = "(https?://|www[.])[^ \t\r\n]+"
    urls = F.regexp_extract_all(F.col("text"), F.lit(url_pat), F.lit(0))
    url_chars = F.expr(
        "aggregate(transform(_urls, u -> length(u)), 0L, (a, x) -> a + x)"
    )
    lines = F.expr("filter(transform(split(text, '\n'), l -> trim(l)), l -> l != '')")

    def _frac(pred_sql: str) -> Column:
        return F.round(
            F.when(
                F.size("_lines") > 0,
                F.size(F.expr(f"filter(_lines, l -> {pred_sql})")).cast("double")
                / F.size("_lines").cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        )

    marker_hits = None
    for m in BOILERPLATE_MARKERS:
        hit = (
            F.length(F.lower("text"))
            - F.length(F.regexp_replace(F.lower("text"), F.lit(m), F.lit("")))
        ) / F.lit(len(m))
        marker_hits = hit if marker_hits is None else marker_hits + hit

    return (
        docs.withColumn("_urls", urls)
        .withColumn("_lines", lines)
        .select(
            "doc_id",
            F.size("_urls").cast("long").alias("n_urls"),
            F.round(
                url_chars.cast("double")
                / F.greatest(F.length("text").cast("double"), F.lit(1.0)),
                4,
            ).alias("url_char_frac"),
            _frac("substring(l, 1, 1) IN ('-', '*')").alias("bullet_line_frac"),
            _frac("l LIKE '%...'").alias("ellipsis_line_frac"),
            _frac("substring(l, length(l), 1) IN ('.', '!', '?', '\"')").alias(
                "term_punct_line_frac"
            ),
            marker_hits.cast("long").alias("n_boilerplate"),
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    §A1.1: documents dominated by repeated lines/n-grams are boilerplate
    or spam and get filtered before training).

    Emitted per doc, all as repeated-occurrence fractions
    1 - distinct/total (0 = no repetition, -> 1 = one unit repeated):
      dup_line_frac   over newline-split lines,
      dup_2gram_frac  over token 2-grams,
      dup_5gram_frac  over token 5-grams.

    Everything is array arithmetic on the scan — whole-stage codegen,
    no explode, no shuffle; identical list expressions run in the DuckDB
    oracle (driver entry repetition_stats).  The per-doc *top* n-gram
    share (Gopher's other family) needs a per-doc mode aggregation
    (explode + count) — that lives in `top_ngram_share`; the dup
    fractions here catch the same pathological docs map-side."""

    def _dup_frac(arr) -> Column:
        n = F.size(arr).cast("double")
        nd = F.size(F.array_distinct(arr)).cast("double")
        return F.round(
            F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)), 4
        )

    d = with_tokens(docs)
    lines = F.split(F.col("text"), "\n")
    return d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        _dup_frac(lines).alias("dup_line_frac"),
        _dup_frac(ngram_array(2)).alias("dup_2gram_frac"),
        _dup_frac(ngram_array(5)).alias("dup_5gram_frac"),
    )


def corpus_summary(docs: DataFrame, by=("source", "lang")) -> DataFrame:
    """Corpus-card rollup: per group (default source x lang) document
    and token counts plus doc-length distribution bounds — the summary
    table a dataset release publishes.  One groupBy shuffle on the
    (small-cardinality) group keys with map-side partial aggregation;
    token counting runs inline on the scan (BPE-ish pretokenizer, same
    literal as bpe_token_count), so no join against a counts table."""
    toks = F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")
    d = docs.withColumn("_nt", F.size(toks).cast("long"))
    return (
        d.groupBy(*by)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.round(F.avg("_nt"), 4).alias("mean_tokens"),
            F.min("_nt").cast("long").alias("min_tokens"),
            F.max("_nt").cast("long").alias("max_tokens"),
        )
    )


# PII redaction patterns — deliberately RE2-compatible (no lookarounds,
# no backrefs) so the SAME pattern strings run in Java regex (Spark) and
# RE2 (DuckDB oracle).  Order matters and is fixed: emails first (their
# digit runs must not be eaten as phones), then IPv4 (also phone-shaped),
# then phones — each stage counts/redacts on the PREVIOUS stage's output,
# so nothing is double-counted.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def redact_pii(docs: DataFrame) -> DataFrame:
    """Rule-based PII scrubbing (emails, IPv4, phone-shaped digit runs)
    — the pre-training redaction pass every public corpus pipeline runs
    (C4 and friends).  Regex-only by design: model-based PII detection
    is out of scope for a relational engine.

    Output: doc_id, redacted text, and a per-category count.  Pure
    regexp_replace/extract_all on the scan — codegen, no Python, no
    shuffle; patterns are RE2-safe so the DuckDB oracle runs them
    verbatim (driver entry redact_pii; the synthetic corpus contains no
    PII, so that row's VALUE check pins the no-match identity — planted
    values are pytest-oracled, tests/test_pipeline.py)."""
    out = docs.select("doc_id", F.col("text").alias("red"))
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(
                F.regexp_extract_all(F.col("red"), F.lit(pat), F.lit(0))
            ).cast("long"),
        ).withColumn("red", F.regexp_replace("red", pat, repl))
    return out.select(
        "doc_id",
        F.col("red").alias("text_redacted"),
        *[F.col(f"n_{name}") for name, _, _ in PII_PATTERNS],
    )
