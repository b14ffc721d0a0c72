"""Streaming quality gating (streaming/quality.py): the stateless gate
battery gives IDENTICAL results on a readStream frame and on the same
rows as a batch frame, with no state store or watermark."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.streaming.quality import (
    gate_stream,
    gopher_keep,
)

SCHEMA = "doc_id LONG, text STRING"

ROWS_B1 = [
    {"doc_id": 0, "text": " ".join(f"word{i % 17} common text flows here" for i in range(12))},
    {"doc_id": 1, "text": "spam spam spam spam spam spam spam spam spam spam"},  # repetitive
    {"doc_id": 2, "text": "tiny"},  # too_few_words
]
ROWS_B2 = [
    {"doc_id": 3, "text": " ".join(f"sentence{i} keeps ordinary prose moving along" for i in range(11))},
    {"doc_id": 4, "text": "email me at someone@example.com " + " ".join(f"filler{i} words extend this document" for i in range(13))},
]


def _write(dirpath, name, rows):
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    _write(d, "b1.json", ROWS_B1)
    _write(d, "b2.json", ROWS_B2)
    return d


def _run_stream(spark, src, **gate_kwargs):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        gate_stream(stream, **gate_kwargs)
        .writeStream.format("memory")
        .queryName("gated_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["doc_id"]: r["text"] for r in spark.sql("SELECT * FROM gated_out").collect()}


def test_stream_equals_batch(spark, src):
    got = _run_stream(spark, src)
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ROWS_B1 + ROWS_B2], SCHEMA
    )
    want = {r["doc_id"]: r["text"] for r in gate_stream(batch).collect()}
    assert got == want
    # the gate actually gated: repetitive + too-short docs are gone
    assert 1 not in got and 2 not in got
    assert 0 in got and 3 in got


def test_pii_scrubbed_in_stream_output(spark, src):
    got = _run_stream(spark, src)
    assert 4 in got and "@example.com" not in got[4] and "<EMAIL>" in got[4]


def test_classifier_floor_streams(spark, src):
    """A literals-only model dict gates the stream; quality_prob_col must
    equal score_quality on the same rows."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.quality_classifier import (
        quality_prob_col,
        score_quality,
    )

    model = {"weights": {"n_words": 0.08, "rep_word_frac": -3.0}, "bias": -1.0}
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ROWS_B1 + ROWS_B2], SCHEMA
    )
    a = {
        r["doc_id"]: r["p"]
        for r in batch.select("doc_id", quality_prob_col(model).alias("p")).collect()
    }
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(batch, model).collect()}
    assert a == b

    got = _run_stream(
        spark, src, use_gopher_rules=False, quality_model=model, min_classifier_prob=0.5
    )
    want = {k for k, p in a.items() if p >= 0.5}
    assert set(got) == want and want  # non-trivial gate


def test_plan_is_stateless(spark, src):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    gated = gate_stream(stream)
    assert gated.isStreaming
    plan = gated._jdf.queryExecution().analyzed().toString()
    assert "Aggregate" not in plan and "Window" not in plan


def test_gopher_keep_matches_flag_struct(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX

    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ROWS_B1 + ROWS_B2], SCHEMA
    )
    rows = batch.select(
        "doc_id",
        gopher_keep("text").alias("keep"),
        TX.gopher_quality_flags("text").alias("f"),
    ).collect()
    for r in rows:
        assert r["keep"] == (not any(r["f"][n] for n in r["f"].asDict()))


def test_gate_then_dedup_chain(spark, tmp_path):
    """The full hygiene chain on one stream: quality gate (stateless)
    feeding streaming exact dedup (stateful) — junk never reaches the
    dedup state store, and cross-batch duplicates of surviving docs are
    dropped."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.dedup import dedup_stream

    src = tmp_path / "chain"
    src.mkdir()
    good = " ".join(f"token{i % 19} ordinary prose continues here" for i in range(12))
    _write(src, "b1.json", [
        {"doc_id": 0, "text": good},
        {"doc_id": 1, "text": "spam spam spam spam spam spam"},  # gated out
    ])
    _write(src, "b2.json", [
        {"doc_id": 2, "text": good.upper()},  # survives gate, dup of 0 (normalized)
        {"doc_id": 3, "text": " ".join(f"fresh{i} words arrive in the second batch" for i in range(10))},
    ])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        dedup_stream(gate_stream(stream))
        .writeStream.format("memory")
        .queryName("chain_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM chain_out").collect())
    assert ids == [0, 3]


def test_blocklist_gate_streams(spark, src):
    """The C4-style badwords screen is stateless: stream == batch, and
    the screened doc is gone on both paths."""
    terms = ["word3"]  # present in doc 0's vocabulary
    got = _run_stream(spark, src, blocklist=terms)
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ROWS_B1 + ROWS_B2], SCHEMA
    )
    want = {r["doc_id"]: r["text"] for r in gate_stream(batch, blocklist=terms).collect()}
    assert got == want
    assert 0 not in got  # doc 0 contains word3
    assert 3 in got


def test_gopher_rules_warn_when_trio_explicitly_set():
    """ADVICE r9: use_gopher_rules=True REPLACES the heuristic trio
    (batch parity) — but a caller explicitly tightening min_quality
    alongside it must get a warning, not a silently laxer gate."""
    import warnings

    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        _quality_trio,
    )

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _quality_trio(True, 0.9, 0.5, 0.5) == {}
        assert len(w) == 1 and "min_quality" in str(w[0].message)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _quality_trio(True, 0.3, 0.5, 0.5) == {}  # defaults: silent
        assert not w
        got = _quality_trio(False, 0.9, 0.5, 0.5)  # rules off: honored
        assert got["min_quality"] == 0.9 and not w
