"""Cross-document boilerplate-line removal (CCNet-style web cleaning).

Web corpora carry navigation chrome, cookie banners, and footer lines
that repeat verbatim across many pages of the same site.  The published
recipe (CCNet, Wenzek et al. 2020; also mC4's line filters) removes a
LINE when it appears in many distinct documents of the same group —
per-line cross-document frequency, not per-document repetition (that is
`text.repetition_stats`, an intra-doc signal) and not repeated token
spans (that is `dedup.substring_spans`, which ignores line structure).

Spark-first shape, two phases:

1. **Detect** — one explode of trimmed non-empty lines, then a groupBy
   on (group, line) counting distinct docs.  The shuffle is keyed by the
   line text itself: map-side partial aggregation collapses each
   partition's repeats first, so the bytes that move are O(distinct
   lines), and a line popular enough to skew a reducer is by definition
   boilerplate that partial-agg already collapsed to one row per map
   task.
2. **Rewrite** — the surviving boilerplate set is small by construction
   (lines repeated across >= min_docs docs are chrome, not content), so
   it is collapsed to ONE array per group and broadcast.  The rewrite is
   then a pure scan-stage expression: ``filter(split(text), l -> NOT
   array_contains(bp, trim(l)))`` — the corpus is never shuffled, same
   scale shape as `decontaminate.decontaminated_corpus`.

At 100 TB: one explode+partial-agg pass to find the boilerplate, one
broadcast map-side pass to strip it.  If a pathological group yields a
boilerplate set too large to broadcast, raise `min_docs` — the knob
directly bounds the set (each kept line is attested by >= min_docs
docs, so the set has at most total_lines / min_docs entries).

All expressions are SQL-portable (split / trim / array lambdas exist in
DuckDB), so detection AND rewrite are value-oracled end-to-end (driver
entries ``boilerplate_lines`` / ``web_clean_corpus``).  NOTE: the
driver's synthetic corpus contains no newlines at all, so at the driver
both entries pin the no-boilerplate identity (every text unchanged,
zero lines dropped) — the same honest-triviality precedent as
``redact_pii``; planted-boilerplate values are pytest-oracled
(tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lines(docs: DataFrame, by: str = "source") -> DataFrame:
    """(doc_id, <by>, line): trimmed, non-empty lines of each document.
    Whitespace-only lines are chrome separators, not content — they are
    excluded from detection and never removed by the rewrite."""
    lines = F.expr(
        "filter(transform(split(text, '\n'), l -> trim(l)), l -> l != '')"
    )
    return docs.select("doc_id", by, F.explode(lines).alias("line"))


def boilerplate_lines(
    docs: DataFrame, min_docs: int = 3, by: str = "source"
) -> DataFrame:
    """(<by>, line, n_docs): lines appearing in >= min_docs DISTINCT
    documents within the same group — the cross-document frequency rule.
    Distinct-doc counting (not occurrence counting) keeps an intra-doc
    chorus from qualifying as boilerplate."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return (
        doc_lines(docs, by)
        .groupBy(by, "line")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    docs: DataFrame, min_docs: int = 3, by: str = "source"
) -> DataFrame:
    """The corpus with boilerplate lines stripped — what the cleaning
    pipeline materializes.

    Output: every input column except `text`, plus `text_clean` (lines
    surviving, original order and intra-line whitespace preserved;
    line-match is on the TRIMMED line, same rule as detection),
    `n_lines_dropped`, and `n_chars_clean`.  Documents in groups with no
    boilerplate pass through unchanged (null-safe coalesce on the
    broadcast side)."""
    bp = (
        boilerplate_lines(docs, min_docs, by)
        .groupBy(by)
        .agg(F.collect_set("line").alias("_bp"))
    )
    raw_lines = F.split(F.col("text"), "\n")
    kept = F.expr(
        "filter(split(text, '\n'), l -> NOT array_contains(_bp_safe, trim(l)))"
    )
    out = (
        docs.join(F.broadcast(bp), by, "left")
        .withColumn(
            "_bp_safe", F.coalesce(F.col("_bp"), F.expr("array()"))
        )
        .withColumn("_kept", kept)
        .withColumn("text_clean", F.concat_ws("\n", F.col("_kept")))
    )
    passthrough = [c for c in docs.columns if c != "text"]
    return out.select(
        *passthrough,
        "text_clean",
        (F.size(raw_lines) - F.size("_kept")).cast("long").alias(
            "n_lines_dropped"
        ),
        F.length("text_clean").cast("long").alias("n_chars_clean"),
    )
