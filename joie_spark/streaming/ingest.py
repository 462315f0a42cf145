"""Structured Streaming ingest for the incremental index.

The reference is a batch-build engine (engine/src/builder.rs); a
production transcript firehose wants continuous ingest.  With the
generation-sliced incremental append (operators/append.py) in place the
streaming story is exactly Spark's: readStream → (sessionize) →
foreachBatch(append_index) — each micro-batch commits one delta
generation, the streaming checkpoint guarantees exactly-once file intake,
and the append manifest makes every generation's lineage inspectable.

Three pieces:

  append_stream        sink: each micro-batch of WHOLE conversations
                       becomes one delta generation.  Exactly-once story:
                       the streaming checkpoint dedupes source files; a
                       crash between append stages resumes via the append
                       manifest (idempotent per-gen overwrites); a batch
                       replayed after a partial append resumes that same
                       generation (append_index's pending-gen logic).
  sessionize_stream    custom stateful operator (applyInPandasWithState):
                       buffers a conversation's turns across micro-batches
                       and emits the conversation ONLY when complete —
                       either an explicit end-marker turn arrives
                       (deterministic, tested) or nothing new arrived for
                       `gap_seconds` of processing time (timeout path for
                       markerless streams).  This is what makes the
                       whole-conversations-per-batch contract of
                       append_stream real when the upstream emits turns
                       one at a time.
  stream_turn_stats    event-time windowed aggregation with a watermark
                       (late turns beyond the watermark are dropped) —
                       the monitoring side-channel a firehose deployment
                       runs next to the ingest.
  dedup_stream         streaming exact dedup: content fingerprints keyed
                       into the streaming state store (dropDuplicates) —
                       duplicates are dropped ACROSS micro-batches and
                       restarts; bounded-state variant via
                       dropDuplicatesWithinWatermark.
  dedup_stream_against stream-static anti-join: drop incoming docs whose
                       fingerprint already exists in a static seen-set
                       (the already-indexed corpus).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

END_MARKER = "__end_of_conversation__"

TURN_FIELDS = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def append_stream(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuous index ingest: every micro-batch appends one delta
    generation.  `stream_df` must deliver WHOLE conversations per batch
    (pipe it through sessionize_stream if the upstream emits bare turns);
    append_index enforces conv-disjointness against the index, so a
    violated contract fails loudly rather than splitting a conversation
    across generations.

    Returns the started StreamingQuery.  With
    trigger_available_now=True the query drains everything currently
    available and stops — the incremental-batch deployment shape (run it
    from cron/Airflow); pass False for an always-on micro-batch stream.

    Micro-batch sizing (measured, BENCH/APPEND_LATENCY.md): every
    generation pays a FIXED ~6-stage job-chain cost regardless of delta
    size (metrics collects are off on this path), so tiny high-frequency
    batches drown in per-generation latency while the marginal per-turn
    cost is small.  Size batches so the fixed cost amortizes — thousands
    of turns per trigger (maxFilesPerTrigger / a processing-time trigger
    of minutes, not seconds; each batch also adds a term_dict DELTA
    partition — O(batch's terms), cheap, but lookups merge one more
    partition until the next collapse) — and run compact_index
    periodically to collapse the accumulated generations (data AND
    dictionary deltas) and re-tighten block-max bounds."""
    from ..operators.append import append_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # batch_id as the idempotency key: a batch replayed AFTER its
        # append fully committed (crash in the window between the append
        # manifest commit and the streaming checkpoint write) no-ops
        # instead of starting a new generation and tripping the
        # conv-disjointness check on every restart (ADVICE r3).  A batch
        # replayed after a PARTIAL append resumes its pending generation
        # (append_index's pending-gen logic), as before.
        append_index(
            batch_df.sparkSession, batch_df, index_dir,
            collect_metrics=False, idempotency_key=f"stream-batch={batch_id}",
        )

    w = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


_SESSION_STATE = T.StructType(
    [
        T.StructField("turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("role", T.ArrayType(T.StringType())),
        T.StructField("text", T.ArrayType(T.StringType())),
        T.StructField("tool", T.ArrayType(T.StringType())),
        T.StructField("ts", T.ArrayType(T.LongType())),  # micros
    ]
)


def _sessionize_fn(gap_seconds: float):
    gap_ms = int(gap_seconds * 1000)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cols = ["turn_idx", "role", "text", "tool", "ts"]
        if state.hasTimedOut:
            # markerless conversation went quiet → emit what we buffered
            (ti, ro, te, to, ts) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": ro,
                    "text": te,
                    "tool": to,
                    "ts": pd.to_datetime(pd.Series(ts), unit="us"),
                }
            )
            return
        buf = {c: list(state.get[i]) for i, c in enumerate(cols)} if state.exists else {
            c: [] for c in cols
        }
        done = False
        for pdf in pdfs:
            for r in pdf.itertuples():
                if r.tool == END_MARKER:
                    done = True
                    continue  # the marker itself is not a turn
                buf["turn_idx"].append(int(r.turn_idx))
                buf["role"].append(r.role)
                buf["text"].append(r.text)
                buf["tool"].append(r.tool if r.tool is not None else "")
                buf["ts"].append(int(pd.Timestamp(r.ts).value // 1000))
        if done:
            if state.exists:
                state.remove()
            order = sorted(range(len(buf["turn_idx"])), key=lambda i: buf["turn_idx"][i])
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": [buf["turn_idx"][i] for i in order],
                    "role": [buf["role"][i] for i in order],
                    "text": [buf["text"][i] for i in order],
                    "tool": [buf["tool"][i] for i in order],
                    "ts": pd.to_datetime(
                        pd.Series([buf["ts"][i] for i in order]), unit="us"
                    ),
                }
            )
        else:
            state.update(tuple(buf[c] for c in cols))
            state.setTimeoutDuration(gap_ms)

    return fn


def sessionize_stream(
    stream_df: DataFrame, gap_seconds: float = 300.0
) -> DataFrame:
    """Assemble bare streaming turns into WHOLE conversations.

    Custom stateful operator (applyInPandasWithState, the escape hatch
    the built-in session_window can't cover because completion here is
    content-defined): per conv_id, turns buffer in state across
    micro-batches; the conversation is emitted once — when a turn with
    tool == END_MARKER arrives (deterministic path), or when the
    conversation has been quiet for `gap_seconds` of processing time
    (timeout path for markerless streams).  Output rows have the turn
    schema, sorted by turn_idx, ready for append_stream."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=TURN_FIELDS,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", fp_col: str = "fp") -> DataFrame:
    """Canonicalization-stable content fingerprint — the same normalized
    token-stream md5 as pipeline/text.py fingerprint, usable on batch or
    streaming frames (pure codegen, no state)."""
    from ..pipeline.text import sql_tokens

    return df.withColumn(fp_col, F.md5(F.concat_ws(" ", sql_tokens(text_col))))


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    fp_col: str = "fp",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Streaming exact deduplication across micro-batches.

    Fingerprints the text (normalized-token md5) and keys it into
    Spark's streaming deduplication state (`dropDuplicates`): the first
    arrival of a fingerprint passes, every later arrival — in the same
    micro-batch, a later batch, or after a restart (state lives in the
    checkpoint, RocksDB-backed on a cluster) — is dropped.  This is the
    streaming twin of pipeline/dedup.py exact_duplicates: the SET of
    surviving fingerprints equals the batch operator's on the same data
    (tested, tests/test_streaming.py); WHICH copy survives is
    arrival-order-defined, the standard streaming semantics.

    Without `watermark` the seen-set grows with the distinct corpus —
    exact forever-dedup, state ~ fingerprint count (the honest cost of
    the guarantee; the state store shards it across executors).  Pass
    `watermark=(ts_col, "24 hours")` to bound state via
    dropDuplicatesWithinWatermark: duplicates are only suppressed within
    the event-time horizon, the right trade for firehose sources whose
    duplicates are near-in-time (retries, re-sends)."""
    d = with_fingerprint(stream_df, text_col, fp_col)
    if watermark is not None:
        ts_col, horizon = watermark
        return d.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
            [fp_col]
        )
    return d.dropDuplicates([fp_col])


def dedup_stream_against(
    stream_df: DataFrame,
    seen_fps: DataFrame,
    text_col: str = "text",
    fp_col: str = "fp",
) -> DataFrame:
    """Drop incoming docs already present in a STATIC seen-set (e.g. the
    fingerprints of the indexed corpus) — a stream-static left-anti
    equi-join, the supported Structured Streaming shape: the static side
    is re-resolved per micro-batch, so compacting/extending the seen
    table takes effect on the next batch without restarting the query.
    Compose with dedup_stream for within-stream dups; at scale store
    `seen_fps` sorted/bucketed by fingerprint so the per-batch join
    prunes row groups instead of scanning the full set."""
    seen = seen_fps.select(F.col(fp_col)).distinct()
    return with_fingerprint(stream_df, text_col, fp_col).join(
        seen, fp_col, "left_anti"
    )


def clean_microbatch(
    batch_df: DataFrame,
    bench: DataFrame,
    seen_fps: DataFrame | None = None,
    decon_ngram: int = 4,
    min_hits: int = 1,
    **gopher_overrides,
):
    """The per-micro-batch cleaning transform: Gopher quality gate
    (scan-stage filter) → benchmark decontamination (broadcast eval
    n-gram set) → optional dedup against a static seen-set (broadcast
    anti-join on the content fingerprint).

    Every stage is PER-DOCUMENT against static side data — no cross-row
    state — so applying it batch-by-batch equals applying it to the
    union (tested, tests/test_streaming.py): micro-batch composition is
    exact, not approximate.  Cross-batch exact dedup is the one stage
    that genuinely needs state; compose `dedup_stream` upstream (state
    store) or pass the indexed corpus fingerprints as `seen_fps`."""
    from ..pipeline.clean import gopher_corpus
    from ..pipeline.decontaminate import decontaminated_corpus

    out = gopher_corpus(batch_df, **gopher_overrides)
    out = decontaminated_corpus(out, bench, n=decon_ngram, min_hits=min_hits)
    if seen_fps is not None:
        out = dedup_stream_against(out, seen_fps).drop("fp")
    return out


def clean_stream(
    stream_df: DataFrame,
    bench: DataFrame,
    sink,
    checkpoint_dir: str,
    seen_fps: DataFrame | None = None,
    trigger_available_now: bool = True,
    **opts,
):
    """Continuous corpus cleaning: each micro-batch runs
    `clean_microbatch` (batch semantics per batch — the idiomatic
    foreachBatch shape for per-doc transforms against static sides,
    same pattern as append_stream) and hands the cleaned frame to
    `sink(df, batch_id)` — e.g. a parquet append, or append_index for
    clean-then-index ingestion.  Static sides (`bench`, `seen_fps`) are
    re-resolved per micro-batch, so refreshing the eval set or the seen
    table takes effect on the next batch without a restart.

    Returns the started StreamingQuery; `trigger_available_now=True`
    drains what is available and stops (the cron/Airflow deployment
    shape)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(
            clean_microbatch(batch_df, bench, seen_fps=seen_fps, **opts),
            batch_id,
        )

    w = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def clean_then_index_stream(
    stream_df: DataFrame,
    bench: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    seen_fps: DataFrame | None = None,
    trigger_available_now: bool = True,
    **opts,
):
    """The full ingestion story composed: stream of transcript TURNS →
    conversation-level cleaning gates → index append, one delta
    generation per micro-batch.

    Gating is per CONVERSATION (the unit the index ingests): each
    micro-batch rolls its conversations up to one document (turn texts
    joined in turn_idx order), runs `clean_microbatch` on that roll-up
    (Gopher gate → benchmark decontamination → optional static-seen
    dedup), then semi-joins the surviving conv_ids back against the raw
    turns and appends them — a dropped conversation vanishes wholly, so
    append_index's whole-conversations-per-batch contract is preserved.
    The roll-up doc_id is xxhash64(conv_id) (the gates only need a
    unique id within the batch; nothing persists it).

    Same exactness argument as clean_stream: every gate is per-document
    against static sides, so batch-by-batch gating equals gating the
    union; the append inherits append_stream's idempotency-key replay
    protection.  Returns the started StreamingQuery."""
    from ..operators.append import append_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        convs = batch_df.groupBy("conv_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
        docs = convs.select(
            F.xxhash64("conv_id").alias("doc_id"), "conv_id", "text"
        )
        kept = clean_microbatch(docs, bench, seen_fps=seen_fps, **opts).select(
            "conv_id"
        )
        clean_turns = batch_df.join(F.broadcast(kept), "conv_id", "left_semi")
        if clean_turns.isEmpty():
            return
        append_index(
            batch_df.sparkSession, clean_turns, index_dir,
            collect_metrics=False,
            idempotency_key=f"clean-stream-batch={batch_id}",
        )

    w = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_turn_stats(
    stream_df: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Event-time windowed ingest monitoring: turns + whitespace-token
    volume per (window, role), with a watermark bounding state for late
    data — the standard firehose health aggregation."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens_ws"),
        )
    )
