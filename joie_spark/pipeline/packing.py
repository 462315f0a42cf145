"""Sequence packing: concat-and-chunk documents into fixed-length
training sequences.

Trainers consume fixed `seq_len`-token sequences; the standard
pretraining recipe (GPT-2/3 style) concatenates all documents in a
deterministic order and slices the token stream every `seq_len` tokens.
The operator that matters at corpus scale is the **assignment**: for
every document, where does it land in the global token stream — which
sequences does it span, at what offsets?  Given that manifest, the
actual tensor materialization is an embarrassingly parallel per-sequence
gather.

The crux is an exact GLOBAL prefix sum over ~10^8 documents.  A naive
`Window.orderBy(doc_id)` with no partition key collapses the whole
corpus onto one task — the classic single-partition window scale
killer.  `pack_sequences` does the textbook two-phase scan instead
(same shape as the reference's parallel primitives delegated to Spark,
SURVEY.md §2.6):

  1. range-partition the (doc_id, n_tokens) pairs by doc_id and stamp
     each row with its physical partition id (RangePartitioner gives
     pid order == doc_id order);
  2. per-partition token totals -> exclusive prefix per pid.  This
     window runs over #partitions rows (thousands, not billions) on one
     task — bounded by cluster size, not data size;
  3. broadcast-join the pid base offsets back and finish with a
     per-partition local running sum (window PARTITIONED by pid — all
     partitions scan in parallel).

The pid-stamped frame is persisted because steps 2 and 3 are separate
actions: recomputing the range partitioning between them could re-draw
sampled boundaries and mis-align base offsets.  It holds 3 longs per
document — a few GB at 10^8 docs, spread across the cluster.  Release
deterministically via `result._joie_persisted.unpersist()`.

Everything is SQL-expressible, so the whole assignment is value-checked
against a DuckDB window-cumsum oracle (driver entries pack_sequences /
pack_manifest).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import bpe_token_count


def _default_counts(docs: DataFrame) -> DataFrame:
    return bpe_token_count(docs).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols,
    out_col: str = "cum_before",
) -> DataFrame:
    """EXCLUSIVE global running sum of `value_col` over `order_cols`
    ordering, scale-safely (the two-phase scan from the module
    docstring).  `order_cols` may be names or Column expressions
    (e.g. [F.desc("score"), "doc_id"]) — they must define a TOTAL order
    for the result to be deterministic.

    Output keeps all input columns plus `out_col` and the internal
    `_pid`; the pid-stamped intermediate is persisted (see module
    docstring) and exposed on the result as `_joie_persisted` for
    deterministic release."""
    par = df.sparkSession.sparkContext.defaultParallelism
    stamped = (
        df.repartitionByRange(par, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        stamped.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"))
        .select(
            "_pid",
            F.coalesce(F.sum("_tot").over(w_pid), F.lit(0)).alias("_base"),
        )
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        stamped.join(F.broadcast(bases), "_pid")
        .withColumn(
            out_col,
            (F.col("_base") + F.coalesce(F.sum(value_col).over(w_local), F.lit(0)))
            .cast("long"),
        )
        .drop("_base")
    )
    out._joie_persisted = stamped  # release handle (freed on GC otherwise)
    return out


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    count_fn: Callable[[DataFrame], DataFrame] = _default_counts,
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-document packing assignment for concat-and-chunk.

    Returns one row per document:
      doc_id, n_tokens, start_off (global token offset, 0-based),
      first_seq / last_seq (inclusive sequence ids; NULL when the doc
      is empty), n_seqs (sequences the doc touches, 0 when empty).

    Documents are concatenated in ascending `order_col` order — a
    deterministic, partitioning-independent order, so the assignment is
    stable across runs, retries, and cluster sizes (the same property
    sampling.with_split buys with hash thresholds).  `count_fn` maps the
    docs frame to (doc_id, n_tokens, ...); default is the BPE-ish
    pretokenizer count from pipeline/text.py.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    counts = count_fn(docs).select(order_col, F.col("n_tokens").cast("long"))
    cum = global_cumsum(counts, "n_tokens", [order_col], out_col="start_off")
    out = (
        cum.select(
            order_col,
            "n_tokens",
            F.col("start_off").cast("long"),
            F.when(
                F.col("n_tokens") > 0, F.floor(F.col("start_off") / seq_len)
            )
            .cast("long")
            .alias("first_seq"),
            F.when(
                F.col("n_tokens") > 0,
                F.floor((F.col("start_off") + F.col("n_tokens") - 1) / seq_len),
            )
            .cast("long")
            .alias("last_seq"),
            F.coalesce(
                F.col("last_seq") - F.col("first_seq") + 1, F.lit(0)
            )
            .cast("long")
            .alias("n_seqs"),
        )
    )
    out._joie_persisted = cum._joie_persisted  # release handle
    return out


def pack_manifest(assignments: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Explode a `pack_sequences` result into the loader-facing manifest:
    one row per (sequence, document-slice) —

      seq_id, doc_id, doc_begin / doc_end (token slice of the doc,
      end-exclusive), seq_begin (where the slice lands in the sequence).

    A data loader groups this by seq_id and gathers the slices; each
    sequence's rows are self-contained, so materialization partitions
    by seq_id with no further coordination.  The explode emits
    n_seqs rows per doc (total rows = total_tokens/seq_len + n_docs
    boundary rows) — a map-side expansion, no shuffle here; the loader's
    groupBy(seq_id) is the one shuffle and seq_id is uniform by
    construction."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    a = assignments.where(F.col("n_tokens") > 0)
    seq = F.explode(F.expr("sequence(first_seq, last_seq)")).alias("seq_id")
    out = a.select("doc_id", "n_tokens", "start_off", seq).select(
        "seq_id",
        "doc_id",
        (
            F.greatest(F.col("seq_id") * seq_len, F.col("start_off"))
            - F.col("start_off")
        )
        .cast("long")
        .alias("doc_begin"),
        (
            F.least(
                (F.col("seq_id") + 1) * seq_len,
                F.col("start_off") + F.col("n_tokens"),
            )
            - F.col("start_off")
        )
        .cast("long")
        .alias("doc_end"),
        (
            F.greatest(F.col("seq_id") * seq_len, F.col("start_off"))
            - F.col("seq_id") * seq_len
        )
        .cast("long")
        .alias("seq_begin"),
    )
    out._joie_persisted = getattr(assignments, "_joie_persisted", None)
    return out
