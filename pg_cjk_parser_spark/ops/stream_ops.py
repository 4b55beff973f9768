"""Structured Streaming operators for the training-data pipeline.

Two stream-native operators beyond the incremental index sink
(index/streaming.py):

* :func:`streaming_exact_dedup` - exactly-once-per-content emission
  over an unbounded stream via ``applyInPandasWithState``: the stream
  is grouped by content digest, per-key GroupState remembers whether
  the digest was already emitted, and state expires on an event-time
  timeout so the state store stays bounded by the dedup horizon
  (classic streaming training-data dedup: drop re-crawled/boilerplate
  repeats within a window).
* :func:`windowed_ingest_stats` - event-time windowed ingest counters
  (docs, bytes, per-window distinct-ish source count) with a watermark
  so late data folds in correctly and state is dropped once windows
  close.

Both are pure DataFrame/Structured-Streaming compositions: the
watermark bounds state, grouping keys are the shuffle keys, and at
cluster scale state is sharded across executors by key exactly like
any streaming aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_DEDUP_OUT = StructType(
    [
        StructField("text_md5", StringType()),
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)
_DEDUP_STATE = StructType([StructField("seen", LongType())])


def streaming_exact_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """First occurrence per content digest on an unbounded stream.

    Emits (text_md5, doc_id, ts) for the first document carrying each
    digest; later duplicates are dropped while the key's state lives.
    State per digest is one long and expires ``state_ttl_ms`` after
    the watermark passes its last update (ProcessingTimeTimeout would
    leak under replay; event-time keeps reprocessing deterministic).
    """

    def dedup(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # digest already emitted in an earlier batch: consume input
            for _ in pdf_iter:
                pass
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_ttl_ms)
            return
        first = None
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col, id_col])
            head = pdf.iloc[0]
            if first is None or (head[ts_col], head[id_col]) < (
                first[ts_col],
                first[id_col],
            ):
                first = head
        if first is None:
            return
        state.update((1,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_ttl_ms)
        yield pd.DataFrame(
            {
                "text_md5": [key[0]],
                "doc_id": [int(first[id_col])],
                "ts": [first[ts_col]],
            }
        )

    keyed = (
        docs_stream.withColumn("text_md5", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .select("text_md5", id_col, ts_col)
        .groupBy("text_md5")
    )
    return keyed.applyInPandasWithState(
        dedup,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_ingest_stats(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    source_col: str | None = None,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed ingest counters with late-data handling.

    Returns one row per closed window: (window, n_docs, n_chars,
    n_sources?).  The watermark bounds aggregation state - windows
    older than it are finalized and dropped - and lets late rows
    within the horizon still fold into their window (append mode
    emits each window exactly once, after it closes).
    """
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
    ]
    if source_col is not None:
        aggs.append(F.approx_count_distinct(source_col).alias("n_sources"))
    return (
        docs_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(*aggs)
    )


def session_stats(
    events: DataFrame,
    gap: str = "4 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session rollup via Spark's native session windows:
    events of one user merge into a session while consecutive gaps
    stay under ``gap``; the window end is last-event-time + gap
    (Spark session_window semantics).

    Output: (user, session_start_us, session_end_us, n_events,
    sum_value) with timestamps as epoch microseconds (integer -
    engine-portable, no wall-clock formatting).

    Works on batch AND streaming input: pass ``watermark`` for a
    stream - session state is bounded by it and each session emits
    once, after it can no longer grow (append mode).  Scale shape:
    one shuffle on the user key; session merging is Spark-native
    (no UDF, no per-user collect)."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    # parquet event times are commonly TIMESTAMP_NTZ; unix_micros only
    # accepts tz-aware TIMESTAMP (and a cast would re-interpret the
    # wall clock in the session tz), so diff NTZ against an NTZ epoch
    is_ntz = dict(events.dtypes).get(ts_col) == "timestamp_ntz"

    def _us(field: str):
        if is_ntz:
            return F.expr(
                "timestampdiff(MICROSECOND, "
                "to_timestamp_ntz('1970-01-01 00:00:00'), "
                f"session_window.{field})"
            )
        return F.unix_micros(F.col(f"session_window.{field}"))

    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            _us("start").alias("session_start_us"),
            _us("end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
