"""Streaming contract monitoring (streaming/contracts.py): per-batch
report == the batch checker on the same rows, batch-granular
accept/quarantine routing, replay idempotence via the batch=<n>
dynamic-partition overwrite, and the report-only default."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.contracts import (
    completeness,
    compliance,
    row_count,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.contracts import (
    contract_report_batch,
    start_contract_monitor_stream,
)

SCHEMA = "doc_id LONG, text STRING"

GOOD = [
    {"doc_id": 0, "text": "plenty of ordinary words in this delivery"},
    {"doc_id": 1, "text": "another complete document with text present"},
]
BAD = [
    {"doc_id": 2, "text": None},  # null text -> completeness violation
    {"doc_id": 3, "text": "fine row in a failing delivery"},
]


def _write(dirpath, name, rows, order):
    # FileStreamSource orders files by mtime with arbitrary ties — pin
    # strictly increasing mtimes so file i IS batch i (the zip with
    # (GOOD, BAD) below depends on delivery order).
    p = dirpath / name
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    t = 1_700_000_000 + 60 * order
    os.utime(p, (t, t))


def _constraints():
    return [
        completeness("text", 1.0),
        compliance("doc_id >= 0", 1.0),
        row_count(1, None),
    ]


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    _write(d, "b1.json", GOOD, 0)
    _write(d, "b2.json", BAD, 1)
    return d


def _start(spark, src, tmp_path, route=True):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    kwargs = dict(
        report_dir=str(tmp_path / "report"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    if route:
        kwargs["accept_dir"] = str(tmp_path / "accept")
        kwargs["quarantine_dir"] = str(tmp_path / "quarantine")
    q = start_contract_monitor_stream(stream, _constraints(), **kwargs)
    q.awaitTermination(120)
    return kwargs


def test_report_matches_batch_checker_and_routes(spark, src, tmp_path):
    dirs = _start(spark, src, tmp_path)
    report = spark.read.parquet(dirs["report_dir"])
    # one row per constraint per micro-batch
    assert report.count() == 2 * len(_constraints())
    by_batch = {
        (r["batch"], r["rule"]): (r["metric"], r["passed"]) for r in report.collect()
    }
    batches = sorted({b for b, _ in by_batch})
    # stream report == the batch checker run on the same rows
    for b, rows in zip(batches, (GOOD, BAD)):
        df = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows], SCHEMA)
        want = {
            r["rule"]: (r["metric"], r["passed"])
            for r in contract_report_batch(df, _constraints(), b).collect()
        }
        assert {rule: v for (bb, rule), v in by_batch.items() if bb == b} == want
    # batch-granular routing: the clean delivery accepted whole, the
    # violating one quarantined whole
    accept = spark.read.parquet(dirs["accept_dir"])
    quar = spark.read.parquet(dirs["quarantine_dir"])
    assert sorted(r["doc_id"] for r in accept.collect()) == [0, 1]
    assert sorted(r["doc_id"] for r in quar.collect()) == [2, 3]


def test_report_only_default_writes_no_routing(spark, src, tmp_path):
    dirs = _start(spark, src, tmp_path, route=False)
    assert spark.read.parquet(dirs["report_dir"]).count() == 2 * len(_constraints())
    assert not (tmp_path / "accept").exists()
    assert not (tmp_path / "quarantine").exists()


def test_replay_is_idempotent(spark, src, tmp_path):
    """Re-running the whole stream from a FRESH checkpoint over the same
    source replays every epoch; the batch=<n> dynamic-partition overwrite
    must leave single copies, not appended duplicates."""
    dirs = _start(spark, src, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = start_contract_monitor_stream(
        stream,
        _constraints(),
        report_dir=dirs["report_dir"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
        accept_dir=dirs["accept_dir"],
        quarantine_dir=dirs["quarantine_dir"],
    )
    q.awaitTermination(120)
    assert (
        spark.read.parquet(dirs["report_dir"]).count() == 2 * len(_constraints())
    )
    assert spark.read.parquet(dirs["accept_dir"]).count() == len(GOOD)
    assert spark.read.parquet(dirs["quarantine_dir"]).count() == len(BAD)


def test_mismatched_routing_dirs_raise(spark, src, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    with pytest.raises(ValueError, match="given together"):
        start_contract_monitor_stream(
            stream,
            _constraints(),
            report_dir=str(tmp_path / "r"),
            checkpoint_dir=str(tmp_path / "c"),
            accept_dir=str(tmp_path / "a"),
        )
    with pytest.raises(ValueError, match="needs constraints"):
        start_contract_monitor_stream(
            stream, [], report_dir=str(tmp_path / "r"), checkpoint_dir=str(tmp_path / "c")
        )
