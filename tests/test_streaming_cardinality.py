"""Streaming cardinality monitor (streaming/cardinality.py): the
running KMV estimate equals the batch kmv_distinct over the union of
every batch so far AT EVERY PREFIX (the lossless-merge guarantee), and
a fresh-checkpoint replay leaves identical single copies."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
    kmv_distinct,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.cardinality import (
    start_cardinality_monitor_stream,
)

SCHEMA = "doc_id LONG, url STRING"

# three deliveries with overlapping url sets: running distinct must grow
# sub-additively where batches overlap
B = [
    [{"doc_id": i, "url": f"https://x.example/{i % 40}"} for i in range(60)],
    [{"doc_id": 100 + i, "url": f"https://x.example/{20 + (i % 50)}"} for i in range(60)],
    [{"doc_id": 200 + i, "url": f"https://y.example/{i}"} for i in range(30)],
]


def _write(dirpath, name, rows, order):
    # FileStreamSource orders files by modification time and breaks ties
    # arbitrarily — pin strictly increasing mtimes so file i IS batch i
    # (the prefix asserts below depend on the delivery order).
    p = dirpath / name
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    t = 1_700_000_000 + 60 * order
    os.utime(p, (t, t))


def _run(spark, src, tmp_path, sub):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = start_cardinality_monitor_stream(
        stream,
        "url",
        out_dir=str(tmp_path / "card"),
        checkpoint_dir=str(tmp_path / sub),
        k=16,  # far below the ~100 distinct urls: the SKETCH regime
    )
    q.awaitTermination(120)
    return str(tmp_path / "card")


def test_running_estimate_matches_batch_union_at_every_prefix(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for i, rows in enumerate(B):
        _write(d, f"b{i}.json", rows, i)
    out = _run(spark, d, tmp_path, "ckpt")
    report = {
        r["batch"]: r for r in spark.read.parquet(out + "/report").collect()
    }
    assert sorted(report) == [0, 1, 2]
    rows_so_far: list = []
    for b in (0, 1, 2):
        rows_so_far += B[b]
        union = spark.createDataFrame(
            [(r["doc_id"], r["url"]) for r in rows_so_far], SCHEMA
        )
        want = kmv_distinct(union, "url", k=16).collect()[0]["approx_distinct"]
        assert report[b]["running_distinct_est"] == want, b
        only = spark.createDataFrame(
            [(r["doc_id"], r["url"]) for r in B[b]], SCHEMA
        )
        want_b = kmv_distinct(only, "url", k=16).collect()[0]["approx_distinct"]
        assert report[b]["batch_distinct_est"] == want_b, b
        assert report[b]["batch_rows"] == len(B[b])
    # overlap means sub-additive growth
    assert (
        report[2]["running_distinct_est"]
        < report[0]["batch_distinct_est"]
        + report[1]["batch_distinct_est"]
        + report[2]["batch_distinct_est"]
    )


def test_fresh_checkpoint_replay_is_idempotent(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for i, rows in enumerate(B):
        _write(d, f"b{i}.json", rows, i)
    out = _run(spark, d, tmp_path, "ckpt1")
    first = {
        r["batch"]: (r["running_distinct_est"], r["batch_rows"])
        for r in spark.read.parquet(out + "/report").collect()
    }
    out2 = _run(spark, d, tmp_path, "ckpt2")  # same out_dir, fresh checkpoint
    second = {
        r["batch"]: (r["running_distinct_est"], r["batch_rows"])
        for r in spark.read.parquet(out2 + "/report").collect()
    }
    assert first == second and len(second) == 3
    # sketch partitions stayed single copies (<= k rows per batch)
    per_batch = {
        r["batch"]: r["n"]
        for r in spark.read.parquet(out + "/sketches")
        .groupBy("batch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(n <= 16 for n in per_batch.values()) and len(per_batch) == 3


def test_fold_sketch_batches_preserves_running_estimate(spark, tmp_path):
    """Folding the prefix into one partition changes no running estimate
    (k-min merge idempotence) and removes the stale partitions."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
        kmv_estimate_from_sketch,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.cardinality import (
        fold_sketch_batches,
    )

    d = tmp_path / "docs"
    d.mkdir()
    for i, rows in enumerate(B):
        _write(d, f"b{i}.json", rows, i)
    out = _run(spark, d, tmp_path, "ckpt")
    report = {
        r["batch"]: r["running_distinct_est"]
        for r in spark.read.parquet(out + "/report").collect()
    }
    removed = fold_sketch_batches(spark, out, upto_batch=1, k=16)
    assert removed == 1  # batch=0 gone, batch=1 now holds the folded prefix
    sk = spark.read.parquet(out + "/sketches")
    assert sorted(
        r["batch"] for r in sk.select("batch").distinct().collect()
    ) == [1, 2]
    # the monitor's own merge over the folded layout reproduces the
    # prefix-1 and prefix-2 running estimates bit-for-bit
    for upto in (1, 2):
        merged = (
            sk.filter(F.col("batch") <= upto)
            .select("h").distinct().orderBy("h").limit(16)
        )
        got = kmv_estimate_from_sketch(merged, 16).collect()[0]["approx_distinct"]
        assert got == report[upto], upto
    # re-running the fold is a no-op (idempotent)
    assert fold_sketch_batches(spark, out, upto_batch=1, k=16) == 0
