"""Streaming windowed aggregation + custom stateful operators (§2.7
extended surface).

The reference has no stream processor; its streaming-shaped contracts are
near-real-time add/remove (incremental.py) and the per-session running token
rollup (ChatService.cs:313-316). This module provides the Spark-native
stream forms a large deployment would run:

  windowed_event_counts    event-time tumbling window + watermark for late
                           data (the streaming twin of the batch
                           events_hourly_rollup oracle query)
  running_token_totals     the reference's TokensUsed accumulation (A3) as
                           a custom stateful operator via
                           applyInPandasWithState — state = (total, count)
                           per session, updated per micro-batch

Both are pure transformations: they accept a streaming OR batch DataFrame
(windowed counts run identically in batch mode, which is how the oracle
validates the aggregation logic; the stateful form needs a stream).

Scale notes: the watermark bounds state (windows older than the watermark
are finalized and dropped); the stateful operator keys state by session —
state size is O(live sessions), and Spark shards it by the groupBy key
across executors. Use RocksDB state store for 100 TB-class key counts.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("tokens_used", LongType()),
        StructField("n_messages", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("tokens_used", LongType()), StructField("n_messages", LongType())]
)


def windowed_event_counts(
    events: DataFrame,
    time_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Event-time tumbling counts/sums with a late-data watermark. On a
    streaming frame, windows finalize once the watermark passes; on a batch
    frame the same expression is an ordinary grouped aggregate."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(time_col, watermark)
    return (
        src.groupBy(F.window(F.col(time_col), window_duration).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), *keys, "n", "total_value")
    )


def session_windows(
    events: DataFrame,
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session aggregation via F.session_window — the streaming
    twin of the batch `sessionization` registry query (same 30-minute gap
    rule: an event more than `gap` after its predecessor opens a new
    session). Sessions are MERGED across micro-batches until the watermark
    passes their end, then finalized and dropped from state — state is
    O(live sessions per key), not O(events).

    Boundary parity with the batch lag()-based query, asserted in tests:
    session_window treats a gap of exactly `gap` as the SAME session
    (interval is [start, last+gap)), while the batch query's `> gap`
    comparison also keeps it — both split strictly-greater gaps only.

    On a batch frame the same expression is an ordinary aggregate, which
    is how the stream-vs-batch agreement test validates it."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(time_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(time_col), gap).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            *keys,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def running_token_totals(
    messages: DataFrame,
    session_col: str = "session_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """A3 as a streaming stateful operator: per-session running token total
    (ChatService.cs:313-316 TokensUsed += ...), emitted as an update row per
    session per micro-batch. State = (tokens_used, n_messages)."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            total, n = state.get
        else:
            total, n = 0, 0
        for pdf in pdfs:
            total += int(pdf[tokens_col].fillna(0).sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"session_id": [key[0]], "tokens_used": [total], "n_messages": [n]}
        )

    return messages.groupBy(session_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
