"""Gap-based session windows (streaming/windows.session_windows): batch
semantics vs the lag()-based sessionization query, stream-vs-batch
agreement, cross-micro-batch session merging."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.streaming.windows import session_windows


def _write_batch(dirpath, name, rows, order=0):
    # FileStreamSource orders files by mtime with arbitrary ties — pin
    # strictly increasing mtimes so file i IS micro-batch i (the
    # watermark-advance assertions below depend on delivery order).
    p = dirpath / name
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    t = 1_700_000_000 + 60 * order
    os.utime(p, (t, t))


def test_batch_session_counts_match_lag_sessionization(spark, tables):
    """Per-user session COUNT from session_window must equal the registry
    query's lag()-based count (same 30-min strictly-greater gap rule)."""
    ev = tables["events"]
    got = {
        r.user_id: r.n
        for r in session_windows(ev)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    flag = F.when(
        F.lag("ts").over(w).isNotNull()
        & (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL '30' MINUTE")),
        1,
    ).otherwise(0)
    exp = {
        r.user_id: r.n
        for r in ev.withColumn("_new", flag)
        .groupBy("user_id")
        .agg((F.lit(1) + F.sum("_new")).cast("long").alias("n"))
        .collect()
    }
    assert got == exp


def test_hand_computed_sessions(spark):
    rows = [
        ("u1", "2024-01-01T10:00:00", 1.0),
        ("u1", "2024-01-01T10:10:00", 2.0),  # same session (10 min gap)
        ("u1", "2024-01-01T11:00:00", 3.0),  # 50 min gap -> new session
        ("u2", "2024-01-01T10:00:00", 4.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sorted(
        (r.user_id, str(r.session_start), r.n_events, r.total_value)
        for r in session_windows(ev).collect()
    )
    assert out == [
        ("u1", "2024-01-01 10:00:00", 2, 3.0),
        ("u1", "2024-01-01 11:00:00", 1, 3.0),
        ("u2", "2024-01-01 10:00:00", 1, 4.0),
    ]


def test_stream_merges_sessions_across_microbatches(spark, tmp_path):
    """Two events of one logical session arrive in DIFFERENT micro-batches;
    the finalized session must be ONE merged row. A third, far-future event
    advances the watermark so the session closes."""
    src = tmp_path / "sess_ev"
    src.mkdir()
    _write_batch(src, "b1.json", order=0, rows=[
        {"user_id": "u1", "ts": "2024-01-01T10:00:00", "value": 1.0},
    ])
    _write_batch(src, "b2.json", order=1, rows=[
        {"user_id": "u1", "ts": "2024-01-01T10:05:00", "value": 2.0},
        {"user_id": "u1", "ts": "2024-01-02T00:00:00", "value": 9.0},
    ])
    schema = "user_id string, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        session_windows(stream, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_windows")
        .outputMode("append")  # append emits only watermark-finalized rows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_windows ORDER BY session_start").collect()
    # the 10:00+10:05 pair merged into one 2-event session; the day-later
    # event is still open (watermark never passed it) so exactly one row
    assert len(rows) == 1
    r = rows[0]
    assert (str(r.session_start), r.n_events, r.total_value) == (
        "2024-01-01 10:00:00",
        2,
        3.0,
    )
