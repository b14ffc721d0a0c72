"""Streaming heavy-hitter monitor (streaming/frequency.py): at every
prefix the running report keeps the MG guarantees (counts are lower
bounds within n_prefix/(k+1); every item above that frequency is
present), the top of the report matches the exact prefix top-N for
certified counts, and a fresh-checkpoint replay is idempotent."""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.streaming.frequency import (
    start_frequency_monitor_stream,
)

SCHEMA = "doc_id LONG, domain STRING"
K = 16
TOPN = 8

# three deliveries: one globally-heavy item spread thin across batches
# ("hub"), per-batch heavies, and a long tail
B = [
    [{"doc_id": i, "domain": "hub" if i % 3 == 0 else f"a{i % 25}"} for i in range(90)],
    [{"doc_id": 100 + i, "domain": "hub" if i % 4 == 0 else f"b{i % 30}"} for i in range(80)],
    [{"doc_id": 200 + i, "domain": "news.example" if i % 2 == 0 else f"c{i}"} for i in range(60)],
]


def _write(dirpath, name, rows, order):
    # FileStreamSource orders files by mtime with arbitrary ties — pin
    # strictly increasing mtimes so file i IS batch i (the prefix
    # asserts below depend on delivery order).
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
    q = start_frequency_monitor_stream(
        stream,
        "domain",
        out_dir=str(tmp_path / "freq"),
        checkpoint_dir=str(tmp_path / sub),
        k=K,
        topn=TOPN,
    )
    q.awaitTermination(120)
    return str(tmp_path / "freq")


def test_prefix_guarantees_and_certified_top(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for i, rows in enumerate(B):
        _write(d, f"b{i}.json", rows, i)
    out = _run(spark, d, tmp_path, "ckpt")
    report = spark.read.parquet(out + "/report").collect()
    by_batch: dict = {}
    for r in report:
        by_batch.setdefault(r["batch"], []).append(r)
    assert sorted(by_batch) == [0, 1, 2]
    prefix: list = []
    for b in (0, 1, 2):
        prefix += B[b]
        true = Counter(r["domain"] for r in prefix)
        n = len(prefix)
        bound = n / (K + 1)
        rows = by_batch[b]
        assert all(r["running_rows"] == n for r in rows), b
        assert all(r["batch_rows"] == len(B[b]) for r in rows), b
        got = {r["item"]: r["running_count"] for r in rows}
        # lower bounds within the mergeable-summaries error envelope
        for item, cnt in got.items():
            assert cnt <= true[item], (b, item)
        # provable presence: an item with true count above the bound has
        # mg >= cnt - bound, and anything outranking it in mg needs true
        # count >= cnt - bound too — so when fewer than TOPN other items
        # reach that count, the item MUST appear in the top-N report
        ranked = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))
        asserted = 0
        for item, cnt in ranked:
            if cnt <= bound:
                continue
            stronger = sum(
                1 for o, oc in true.items() if o != item and oc >= cnt - bound
            )
            if stronger < TOPN:
                assert item in got, (b, item)
                asserted += 1
        assert asserted, b  # the fixture must exercise the guarantee
        # the #1 item is certified exact whenever its lead over the
        # error bound is decisive (true for "hub" at prefixes 0 and 1)
        top_item, top_cnt = ranked[0]
        if top_cnt > bound and (len(ranked) < 2 or ranked[1][1] + bound < top_cnt):
            best = max(got.items(), key=lambda kv: (kv[1], kv[0]))
            assert best[0] == top_item, b
    # "hub" (spread thin across two batches, absent from the third)
    # must still lead the final report
    final = max(
        ((r["item"], r["running_count"]) for r in by_batch[2]),
        key=lambda kv: kv[1],
    )
    assert final[0] == "hub"


def test_fresh_checkpoint_replay_is_idempotent(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for i, rows in enumerate(B):
        _write(d, f"b{i}.json", rows, i)
    out = _run(spark, d, tmp_path, "ckpt1")
    first = sorted(
        (r["batch"], r["item"], r["running_count"])
        for r in spark.read.parquet(out + "/report").collect()
    )
    out2 = _run(spark, d, tmp_path, "ckpt2")  # same out_dir, fresh checkpoint
    second = sorted(
        (r["batch"], r["item"], r["running_count"])
        for r in spark.read.parquet(out2 + "/report").collect()
    )
    assert first == second and len({b for b, _, _ in second}) == 3
    # sketch partitions stayed single copies (bounded rows per batch)
    per_batch = {
        r["batch"]: r["n"]
        for r in spark.read.parquet(out + "/sketches")
        .groupBy("batch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(per_batch) == 3


def test_uniform_batch_sentinel_keeps_error_bound_honest(spark, tmp_path):
    """A batch where every counter trims away must still contribute its
    row count to running_rows (the bound denominator)."""
    d = tmp_path / "docs"
    d.mkdir()
    heavy = [{"doc_id": i, "domain": "hub"} for i in range(40)]
    uniform = [{"doc_id": 100 + i, "domain": f"u{i}"} for i in range(50)]
    _write(d, "b0.json", heavy, 0)
    _write(d, "b1.json", uniform, 1)
    out = _run(spark, d, tmp_path, "ckpt")
    rows = spark.read.parquet(out + "/report").filter(F.col("batch") == 1).collect()
    assert rows and all(r["running_rows"] == 90 for r in rows)
    got = {r["item"]: r["running_count"] for r in rows}
    assert got.get("hub") == 40  # exact: never trimmed in its batch
    assert None not in got  # the sentinel row never leaks into the report
