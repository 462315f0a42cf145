"""Deterministic splits and stratified sampling for training pipelines.

Both operators assign rows by a salted content hash rather than an RNG
(`df.sample`/`sampleBy` draw per-task random numbers, so membership
changes with partitioning, retries, and cluster size).  Hash-threshold
assignment gives the properties a training-data pipeline actually
needs:

- **Stable**: a document's split depends only on (salt, key) — re-runs,
  AQE re-plans, and scale-ups never move it between train and val (no
  silent eval contamination across pipeline versions).
- **Map-side only**: a filter/case expression inside the scan's codegen
  stage — ZERO shuffles at any corpus size; at 100 TB the split is free.
- **SQL-portable**: the same md5-derived uniform is expressible in
  DuckDB, so assignments are value-oracled end-to-end (driver entries
  split_assign / stratified_sample).

The uniform is the top 60 bits of md5(salt ':' key) / 2^60 — the same
portable-hash recipe as dedup._hash64_sql (minhash/simhash portable
twins).  md5 costs more than xxhash64 per row, but one hash per ROW
(not per shingle) is noise next to the scan, and portability buys the
oracle; swap `_uniform` for xxhash64 if a profiler ever says otherwise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 60)


def _uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 1) from (salt, key) — identical
    expression in DuckDB (('0x' || substr(md5(..), 1, 15))::BIGINT)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h.cast("double") / F.lit(_HASH_SPACE)


def with_split(
    docs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
    key: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column: deterministic weighted assignment.

    `weights` are (name, fraction) in priority order; fractions must sum
    to 1 (validated).  Assignment: u < c1 -> first, u < c1+c2 -> second,
    ...; the last split takes the remainder, so float rounding can never
    leave a row unassigned."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _uniform(F.col(key), salt)
    expr = F.lit(weights[-1][0])
    cum = 0.0
    branches = []
    for name, w in weights[:-1]:
        cum += w
        branches.append((cum, name))
    for cum, name in reversed(branches):
        expr = F.when(u < cum, F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
    key: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe split: hash the duplicate-CLUSTER representative,
    not the document, so near-duplicates always land in the same split.

    Per-doc assignment silently leaks training data into val whenever a
    near-duplicate pair straddles the boundary — with 10% val and d
    duplicated docs, ~19% of d leaks.  `pairs` is any (a, b) near-dup
    pair source (minhash_lsh_verified at scale; ngram_jaccard_pairs for
    the oracle); clusters come from the distributed min-label
    propagation (dedup.duplicate_clusters), docs outside any cluster
    hash their own key.  The cluster map is near-dup-sized, hence
    broadcast — the corpus itself is never shuffled (same shape as
    dedup.deduped_corpus)."""
    from .dedup import duplicate_clusters

    clusters = duplicate_clusters(pairs.select("a", "b"))
    rep = F.coalesce(F.col("cluster_id"), F.col(key))
    return (
        docs.join(F.broadcast(clusters), key, "left")
        .withColumn("_rep", rep)
        .drop("cluster_id")
        .transform(lambda d: with_split(d, weights, key="_rep", salt=salt))
        .drop("_rep")
    )


def mixture_sample(
    docs: DataFrame,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixture by per-source EPOCH counts — how training
    mixtures are actually specified (source A x2.5, source B x0.5, ...).

    Epochs e for a source mean: floor(e) full copies of every document
    plus a deterministic (e - floor(e)) fraction getting one more copy;
    e = 0 drops the source.  Output adds an `epoch` column (0-based copy
    index) so the trainer can interleave copies instead of replaying
    them back-to-back.

    Plan shape: a per-row CASE builds the copy-index array and ONE
    explode emits the copies — a single map-side pass, no join, no
    shuffle; output size is sum_s e_s * |s| by construction.  The
    fractional draw reuses the salted portable uniform, so membership
    is stable across runs and the whole operator is SQL-oracle-able
    (driver entry mixture_sample)."""
    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs must be >= 0, got {s}={e}")
    if default_epochs < 0:
        raise ValueError(f"default_epochs must be >= 0, got {default_epochs}")
    u = _uniform(F.concat(F.col(source_col), F.lit("|"), F.col(key)), salt)

    def copies(e: float) -> Column:
        n_full = int(e)
        frac = e - n_full
        full = (
            F.expr(f"sequence(0, {n_full - 1})")
            if n_full > 0
            else F.array().cast("array<int>")
        )
        if frac > 0.0:
            return F.concat(
                full,
                F.when(u < F.lit(frac), F.array(F.lit(n_full))).otherwise(
                    F.array().cast("array<int>")
                ),
            )
        return full

    arr = copies(default_epochs)
    for s, e in sorted(epochs.items()):
        arr = F.when(F.col(source_col) == s, copies(e)).otherwise(arr)
    return docs.withColumn("epoch", F.explode(arr))


def select_by_budget(
    docs: DataFrame,
    budget_tokens: int,
    score_col: str = "n_chars",
    count_fn=None,
    key: str = "doc_id",
) -> DataFrame:
    """Greedy best-score-first corpus selection under a GLOBAL token
    budget — "give me the highest-quality ~50B tokens", the selection
    step every budgeted pretraining run makes after scoring.

    Docs are ranked by (`score_col` DESC, `key` ASC — the key breaks
    score ties, so the kept set is deterministic) and kept while the
    running token total before the doc is under `budget_tokens`; the doc
    that crosses the boundary is included (take-until semantics), so the
    selection overshoots by at most one document.

    The ranking needs an exact global prefix sum — same scale problem as
    sequence packing, same solution: packing.global_cumsum's two-phase
    scan (per-partition windows stay parallel; only the
    partition-totals prefix is single-task).  Output: key, score,
    n_tokens, tokens_before.  Release the persisted intermediate via
    `result._joie_persisted.unpersist()`."""
    from .packing import _default_counts, global_cumsum

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    counts = (count_fn or _default_counts)(docs).select(
        key, F.col("n_tokens").cast("long")
    )
    scored = docs.select(key, F.col(score_col).alias("score")).join(counts, key)
    cum = global_cumsum(
        scored,
        "n_tokens",
        [F.col("score").desc(), F.col(key).asc()],
        out_col="tokens_before",
    )
    out = cum.where(F.col("tokens_before") < budget_tokens).select(
        key, "score", "n_tokens", "tokens_before"
    )
    out._joie_persisted = cum._joie_persisted
    return out


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata: str | None = None,
    fractions: dict[str, float] | None = None,
    key: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic (approximately) fraction-per-stratum sample.

    With `strata` + `fractions`, each stratum s keeps rows with
    u < fractions.get(s, fraction); otherwise a flat `fraction` applies
    globally.  Salting the hash by the STRATUM as well as the row key
    decorrelates samples across strata definitions.  Pure map-side
    filter — the sample of a 100 TB corpus costs one scan."""
    if strata is None:
        return docs.where(_uniform(F.col(key), salt) < fraction)
    u = _uniform(F.concat(F.col(strata), F.lit("|"), F.col(key)), salt)
    thresh = F.lit(float(fraction))
    if fractions:
        expr = F.lit(float(fraction))
        for s, fr in sorted(fractions.items()):
            expr = F.when(F.col(strata) == s, F.lit(float(fr))).otherwise(expr)
        thresh = expr
    return docs.where(u < thresh)
