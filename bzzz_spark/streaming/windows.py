"""Watermarked streaming operators over the transcript stream.

The reference is batch-only (SURVEY §2.8: visibility lag = the 5 s
SearcherManager refresh, reference src/bzzz/core.clj:209), so these are
Spark-native additions for the live half of a training-data pipeline:
the same dedup/stats semantics the batch operators provide, expressed
with event-time watermarks so state stays bounded on an unbounded
stream.

All three return streaming DataFrames: compose with
``.writeStream.trigger(availableNow=True)`` (tests) or a processing-time
trigger (production).  Scale notes:

- ``streaming_exact_dedup``: state = one fingerprint per doc within the
  watermark horizon, dropped by the engine once the watermark passes —
  the streaming form of functions.dedup.exact_duplicates' md5 key (same
  fingerprint function, so a doc deduped here hashes identically in the
  batch pipeline and the DuckDB oracle).
- ``streaming_turn_stats``: per-(window, role) partial aggregation is
  map-side; the shuffle key space is windows × roles — tiny and uniform.
- ``conversation_sessions``: applyInPandasWithState keyed by conv_id —
  per-conversation running counters with a processing-time timeout, the
  'custom stateful operator' escape hatch for semantics the built-in
  windowed aggs cannot express (a conversation has no fixed window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bzzz_spark.functions.text import fingerprint, token_count


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop rows whose normalized-text fingerprint already arrived
    within the watermark horizon (exact dedup, state-bounded).

    Uses ``dropDuplicatesWithinWatermark`` so two copies arriving in
    DIFFERENT micro-batches still dedup (plain dropDuplicates on a
    stream would keep unbounded state; a batch-local distinct would miss
    cross-batch copies).  Survivor choice: across batches the
    first-arrived copy survives (later copies drop against state);
    WITHIN one micro-batch the surviving copy is engine-chosen — unlike
    the batch op's canonical-id policy, exactly one survives but there
    is no ordering guarantee on which."""
    return (
        stream_df.withColumn("fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )


def streaming_turn_stats(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-(event-time window, role) turn and token counts with late
    rows folded in until the watermark passes — the live analog of the
    build's per-partition metrics (reference /stat, core.clj)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(token_count(text_col)).alias("n_tokens"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
            "n_tokens",
        )
    )


_SESSION_SCHEMA = (
    "conv_id string, n_turns long, n_tokens long, max_turn_idx long"
)
_STATE_SCHEMA = "n_turns long, n_tokens long, max_turn_idx long"


def _session_fn(key, pdfs, state: GroupState):
    (conv_id,) = key
    if state.hasTimedOut:
        # idle conversation: evict state, emit nothing
        state.remove()
        return
    n_turns, n_tokens, max_idx = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        n_tokens += int(pdf["text"].str.split().str.len().fillna(0).sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_tokens, max_idx))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict idle conversations
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            "max_turn_idx": [max_idx],
        }
    )


def conversation_sessions(stream_df: DataFrame) -> DataFrame:
    """Running per-conversation counters (turns, whitespace tokens,
    max turn_idx seen) — a custom stateful operator keyed by conv_id
    via applyInPandasWithState.  A conversation has no fixed window, so
    the built-in windowed aggregation cannot express it; state evicts
    after an hour idle (processing-time timeout)."""
    return (
        stream_df.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
