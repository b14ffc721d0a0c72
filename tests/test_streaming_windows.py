"""Streaming windowed aggs + the stateful running-token operator, driven
through real StreamingQuery executions (file source, memory sink)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector_search_ai_assistant_mongodbvcore_spark.streaming.windows import (
    running_token_totals,
    windowed_event_counts,
)

MSG_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("tokens", IntegerType()),
    ]
)


def _write_batch(dirpath, name, rows):
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_counts_batch_and_stream_agree(spark, tmp_path, tables):
    """The same transformation runs in batch (oracle-checkable) and as a
    streaming query over the identical rows — results must agree."""
    ev = tables["events"].limit(500).cache()
    batch = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_event_counts(ev).collect()
    }

    src = tmp_path / "ev"
    src.mkdir()
    ev.coalesce(1).write.mode("overwrite").json(str(src))
    schema = ev.schema
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert streamed == batch
    ev.unpersist()


def test_running_token_totals_state_survives_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the second batch's emitted
    totals must INCLUDE the first batch's state — the A3 rollup semantics."""
    src = tmp_path / "msgs"
    src.mkdir()
    _write_batch(src, "b1.json", [
        {"session_id": "s1", "ts": "2024-01-01T10:00:00", "tokens": 10},
        {"session_id": "s1", "ts": "2024-01-01T10:01:00", "tokens": 5},
        {"session_id": "s2", "ts": "2024-01-01T10:02:00", "tokens": 7},
    ])
    _write_batch(src, "b2.json", [
        {"session_id": "s1", "ts": "2024-01-01T10:03:00", "tokens": 20},
    ])

    stream = (
        spark.readStream.schema(MSG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        running_token_totals(stream)
        .writeStream.format("memory")
        .queryName("tok_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tok_totals").collect()
    # latest update per session wins
    latest = {}
    for r in rows:
        latest[r.session_id] = max(
            latest.get(r.session_id, (0, 0)), (r.n_messages, r.tokens_used)
        )
    assert latest["s1"] == (3, 35)  # 10+5 then +20 across batches
    assert latest["s2"] == (1, 7)
    # and the intermediate emission existed (state visible per batch)
    s1_updates = sorted(r.tokens_used for r in rows if r.session_id == "s1")
    assert s1_updates[0] in (15, 35)
