"""Streaming exact dedup (streaming/dedup.py): duplicates dropped ACROSS
micro-batches, state bounded by the watermark in the watermarked form."""

from __future__ import annotations

import json

from vector_search_ai_assistant_mongodbvcore_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_watermarked,
)

SCHEMA = "doc_id LONG, ts TIMESTAMP, text STRING"


def _write(dirpath, name, rows):
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_duplicates_dropped_across_microbatches(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    # b1 and b2 share normalized-identical texts (case/whitespace fold)
    _write(src, "b1.json", [
        {"doc_id": 0, "ts": "2024-01-01T10:00:00", "text": "Alpha Beta"},
        {"doc_id": 1, "ts": "2024-01-01T10:01:00", "text": "gamma"},
        {"doc_id": 2, "ts": "2024-01-01T10:02:00", "text": "alpha   beta"},  # dup of 0
    ])
    _write(src, "b2.json", [
        {"doc_id": 3, "ts": "2024-01-01T10:03:00", "text": "ALPHA BETA"},  # dup of 0, next batch
        {"doc_id": 4, "ts": "2024-01-01T10:04:00", "text": "delta"},
    ])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    kept_texts = sorted(r["text"].lower().split()[0] for r in rows)
    assert kept_texts == ["alpha", "delta", "gamma"]
    # exactly one of the three alpha-beta variants survived
    assert sum(1 for r in rows if "alpha" in r["text"].lower()) == 1


def test_watermarked_dedup_within_horizon(spark, tmp_path):
    src = tmp_path / "docs_wm"
    src.mkdir()
    _write(src, "b1.json", [
        {"doc_id": 0, "ts": "2024-01-01T10:00:00", "text": "same text"},
        {"doc_id": 1, "ts": "2024-01-01T10:05:00", "text": "same text"},  # dup within 30m
        {"doc_id": 2, "ts": "2024-01-01T10:06:00", "text": "other"},
    ])

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        dedup_stream_watermarked(stream, "ts", delay="30 minutes")
        .writeStream.format("memory")
        .queryName("dedup_wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_wm_out").collect()
    assert len(rows) == 2
    assert {r["text"] for r in rows} == {"same text", "other"}


def test_batch_mode_equivalence(spark, tables):
    """Pure transformation: in batch mode the keep-set size equals the
    number of distinct normalized fingerprints (what batch exact_dedup
    groups on)."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import fingerprint_md5

    docs = tables["documents"]
    n_distinct = docs.select(fingerprint_md5("text").alias("fp")).distinct().count()
    assert dedup_stream(docs).count() == n_distinct


def test_narrow_prep_stages_run_on_a_stream(spark, tmp_path):
    """Chunking + PII scrub + quality filters are narrow column programs,
    so the SAME operators run unchanged under Structured Streaming — the
    continuous-ingest half of the corpus-prep pipeline."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX
    from vector_search_ai_assistant_mongodbvcore_spark.operators.chunking import chunk_documents

    src = tmp_path / "stream_docs"
    src.mkdir()
    _write(src, "b1.json", [
        {"doc_id": 0, "ts": "2024-01-01T10:00:00",
         "text": "contact a@b.com about the new spark engine pipeline work"},
        {"doc_id": 1, "ts": "2024-01-01T10:01:00", "text": "spam spam spam spam spam"},
    ])

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    prepped = (
        stream.filter(TX.repeated_word_fraction("text") <= 0.5)
        .withColumn("text", TX.scrub_pii("text"))
    )
    q = (
        chunk_documents(prepped, size=4, overlap=1)
        .writeStream.format("memory")
        .queryName("prep_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM prep_chunks").collect()
    assert {r["doc_id"] for r in rows} == {0}  # spam doc filtered on-stream
    text = " ".join(r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"]))
    assert "<EMAIL>" in text and "a@b.com" not in text
