"""Streaming corpus pipeline (streaming/corpus.py): the gate -> decontam
-> dedup -> scrub -> split -> chunk chain on micro-batches must equal
batch prepare_training_corpus on the union of the batches (ingest order
= id order, the documented representative-choice caveat)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
    contamination_report,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
    prepare_training_corpus,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
    collect_benchmark_ngrams,
    decontam_keep,
    prepare_stream,
)

SCHEMA = "doc_id LONG, text STRING"

def _prose(tag: str, n: int = 70) -> str:
    """n distinct-ish words of ordinary prose: long enough for the Gopher
    word-count floor, varied enough to dodge the repetition rules."""
    return " ".join(
        f"{tag}{i} carries ordinary narrative prose forward" for i in range(n // 6 + 1)
    )


BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

# b1 < b2 < b3 by id; the duplicate pair straddles b1/b3 with min id first
B1 = [
    {"doc_id": 0, "text": _prose("north")},
    {"doc_id": 1, "text": "spam spam spam spam spam spam spam spam spam spam"},  # junk
    {"doc_id": 2, "text": _prose("dup")},
]
B2 = [
    {"doc_id": 3, "text": _prose("mail") + " contact someone@example.com for details"},
    {"doc_id": 4, "text": _prose("leak") + " " + BENCH_TEXT},  # contaminated
]
B3 = [
    {"doc_id": 5, "text": _prose("dup")},  # dup of 2
    {"doc_id": 6, "text": _prose("south")},
]
ALL = B1 + B2 + B3


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    import os
    import time

    d = tmp_path_factory.mktemp("stream_corpus")
    base = time.time()
    # the file source orders micro-batches by modification time; same-
    # second writes tie unpredictably, so stamp strictly increasing
    # mtimes to pin ingest order = id order (the equivalence premise)
    for i, (name, rows) in enumerate(
        (("b1.json", B1), ("b2.json", B2), ("b3.json", B3))
    ):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(d / name, (base + 10 * i, base + 10 * i))
    return d


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")


def _run_stream(spark, src, **kwargs):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        prepare_stream(stream, **kwargs)
        .writeStream.format("memory")
        .queryName("corpus_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM corpus_out")


def _rows(df):
    return sorted(
        (r["doc_id"], r["split"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in df.collect()
    )


def test_stream_chain_equals_batch_pipeline(spark, src, bench):
    got = _run_stream(
        spark,
        src,
        benchmark_ngrams=collect_benchmark_ngrams(bench, n=8),
        use_gopher_rules=True,
    )
    batch_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ALL], SCHEMA
    )
    want = prepare_training_corpus(
        batch_docs, benchmark=bench, decontam_n=8, use_gopher_rules=True
    )
    assert _rows(got) == _rows(want)
    ids = {r[0] for r in _rows(got)}
    assert 1 not in ids  # junk gated
    assert 4 not in ids  # contaminated screened
    assert 5 not in ids and 2 in ids  # cross-micro-batch dedup, first kept
    assert {0, 3, 6} <= ids


def test_stream_output_is_scrubbed_and_split(spark, src, bench):
    got = _run_stream(
        spark, src, benchmark_ngrams=collect_benchmark_ngrams(bench, n=8)
    )
    texts = " ".join(r["chunk_text"] for r in got.collect())
    assert "@example.com" not in texts and "<EMAIL>" in texts
    assert set(got.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "val",
        "test",
    }


def test_decontam_keep_matches_batch_report(spark, bench):
    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ALL] + [(99, None)], SCHEMA
    )
    ngrams = collect_benchmark_ngrams(bench, n=8)
    for min_hits in (1, 2):
        got = {
            r["doc_id"]
            for r in docs.filter(
                decontam_keep(ngrams, "text", n=8, min_hits=min_hits)
            ).collect()
        }
        report = contamination_report(docs, bench, n=8, min_hits=min_hits)
        want = {
            r["doc_id"] for r in report.filter(~F.col("contaminated")).collect()
        }
        # NULL-text doc yields no report row in batch but must be KEPT by
        # the screen (0 hits), matching the batch decontaminate() verdict
        want |= {99}
        assert got == want, min_hits


def test_empty_benchmark_set_keeps_everything(spark):
    docs = spark.createDataFrame([(r["doc_id"], r["text"]) for r in ALL], SCHEMA)
    assert docs.filter(decontam_keep([], "text")).count() == len(ALL)


def test_oversized_benchmark_raises(spark, bench):
    with pytest.raises(ValueError, match="max_ngrams"):
        collect_benchmark_ngrams(bench, n=2, max_ngrams=3)


def test_pre_dedup_stages_are_stateless(spark, src, bench):
    """Everything ahead of (and after) the dedup operator must be a pure
    projection/filter: exactly ONE stateful operator in the whole chain."""
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    plan = prepare_stream(
        stream, benchmark_ngrams=collect_benchmark_ngrams(bench, n=8)
    )._jdf.queryExecution().analyzed().toString()
    assert plan.count("Deduplicate") == 1


def test_watermarked_chain_bounds_state_and_dedups(spark, tmp_path):
    """prepare_stream(watermark_col=...) routes dedup through the
    watermark-bounded state store: a duplicate arriving within the delay
    is dropped and the chain still emits trainer-ready chunk rows."""
    import os
    import time

    d = tmp_path / "wm_docs"
    d.mkdir()
    base_ts = "2026-01-01T10:{m:02d}:00.000Z"
    batches = [
        [{"doc_id": 0, "text": _prose("alpha"), "ts": base_ts.format(m=0)}],
        [{"doc_id": 1, "text": _prose("alpha"), "ts": base_ts.format(m=5)}],  # dup, inside delay
        [{"doc_id": 2, "text": _prose("beta"), "ts": base_ts.format(m=9)}],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        prepare_stream(stream, watermark_col="ts", watermark_delay="30 minutes")
        .writeStream.format("memory")
        .queryName("wm_corpus_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM wm_corpus_out")
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == {0, 2}  # dup of 0 dropped within the watermark horizon
    assert {"doc_id", "split", "chunk_id", "n_tokens", "chunk_text"} == set(got.columns)


def test_broadcast_set_path_matches_literal_path(spark, bench, monkeypatch):
    """Above _LITERAL_PROBE_MAX the screen switches from the literal-array
    probe to a broadcast-set Arrow UDF — verdicts must be identical
    (forced here by shrinking the threshold to 0)."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming import corpus as C

    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ALL] + [(99, None)], SCHEMA
    )
    ngrams = collect_benchmark_ngrams(bench, n=8)
    for min_hits in (1, 2):
        lit_ids = {
            r["doc_id"]
            for r in docs.filter(
                decontam_keep(ngrams, "text", n=8, min_hits=min_hits)
            ).collect()
        }
        monkeypatch.setattr(C, "_LITERAL_PROBE_MAX", 0)
        udf_ids = {
            r["doc_id"]
            for r in docs.filter(
                C.decontam_keep(ngrams, "text", n=8, min_hits=min_hits)
            ).collect()
        }
        monkeypatch.undo()
        assert lit_ids == udf_ids, min_hits


def _write_batches(d, batches, gap=10):
    import os
    import time

    now = time.time()
    existing = len(list(d.glob("*.json")))
    for i, rows in enumerate(batches, start=existing):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (now + gap * i, now + gap * i))


def test_stream_shard_export_end_to_end(spark, tmp_path):
    """prepare_stream -> start_shard_export_stream: the stream lands
    trainer-ready token-sequence shards; tokens are conserved vs the
    chunk rows, seq ids are globally unique, and re-running the whole
    stream from scratch into the same tree is idempotent (dynamic
    partition overwrite keyed on the deterministic batch id)."""
    import shutil

    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        start_shard_export_stream,
    )

    d = tmp_path / "docs"
    d.mkdir()
    _write_batches(
        d,
        [
            [{"doc_id": 0, "text": _prose("aa")}, {"doc_id": 1, "text": _prose("bb")}],
            [{"doc_id": 2, "text": _prose("cc")}],
        ],
    )
    out = str(tmp_path / "shards")

    def run(ckpt):
        stream = (
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(d))
        )
        chunks = prepare_stream(stream)
        start_shard_export_stream(
            chunks, out, seq_len=16, checkpoint_dir=str(tmp_path / ckpt)
        ).awaitTermination(180)

    run("ck1")
    disk = spark.read.parquet(out)
    # the sequence KEY is (split, batch, seq_id) — seq_id restarts per
    # split inside a batch, exactly like the batch exporter's
    # (split, epoch, seq_id)
    keys = [
        (r["split"], r["batch"], r["seq_id"])
        for r in disk.select("split", "batch", "seq_id").collect()
    ]
    assert len(keys) == len(set(keys))
    # conservation IN THE SHARD TOKEN CURRENCY (the engine tokenizer —
    # distinct from the chunks' whitespace n_tokens): every tokenized
    # chunk token landed in exactly one sequence
    batch_docs = spark.createDataFrame(
        [(0, _prose("aa")), (1, _prose("bb")), (2, _prose("cc"))], SCHEMA
    )
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
        tokenize,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    want_tokens = (
        prepare_training_corpus(batch_docs, use_gopher_rules=True)
        .agg(F.sum(F.size(tokenize(F.col("chunk_text")))))
        .collect()[0][0]
    )
    assert disk.agg(F.sum("n_toks")).collect()[0][0] == want_tokens
    n_first = disk.count()

    # replay from scratch (fresh checkpoint, same tree): same batches map
    # to the same (split, batch) partitions -> row count unchanged
    run("ck2")
    assert spark.read.parquet(out).count() == n_first


def test_dedup_state_survives_stream_restart(spark, tmp_path):
    """The dedup state store is checkpoint-backed: a duplicate arriving
    AFTER a stop/restart of the query is still dropped (the reference's
    near-real-time hygiene contract across process restarts)."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        start_shard_export_stream,
    )

    d = tmp_path / "docs"
    d.mkdir()
    out = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(d))
        )
        chunks = prepare_stream(stream)
        start_shard_export_stream(
            chunks, out, seq_len=16, checkpoint_dir=ckpt
        ).awaitTermination(180)

    _write_batches(d, [[{"doc_id": 0, "text": _prose("keep")}]])
    run()
    first = {r["doc_id"] for r in spark.read.parquet(out).select("doc_ids").selectExpr("explode(doc_ids) AS doc_id").collect()}
    assert first == {0}

    # restart with a duplicate of doc 0 plus a new doc
    _write_batches(
        d,
        [[{"doc_id": 7, "text": _prose("keep")}, {"doc_id": 8, "text": _prose("new")}]],
    )
    run()
    docs_seen = {
        r["doc_id"]
        for r in spark.read.parquet(out)
        .selectExpr("explode(doc_ids) AS doc_id")
        .collect()
    }
    assert docs_seen == {0, 8}  # 7 deduped across the restart


@pytest.mark.deep  # slow sweep/E2E (r16 tiering)
def test_stream_mask_mode_equals_batch_mask_pipeline(spark, src, bench):
    """decontam_mode='mask' on the stream: contaminated docs survive with
    the benchmark passage excised, and the chain equals batch
    prepare_training_corpus(decontam_mode='mask') row for row."""
    got = _run_stream(
        spark,
        src,
        benchmark_ngrams=collect_benchmark_ngrams(bench, n=8),
        decontam_mode="mask",
        use_gopher_rules=True,
    )
    batch_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ALL], SCHEMA
    )
    want = prepare_training_corpus(
        batch_docs, benchmark=bench, decontam_n=8, decontam_mode="mask",
        use_gopher_rules=True,
    )
    assert _rows(got) == _rows(want)
    ids = {r[0] for r in _rows(got)}
    assert 4 in ids  # masked, not dropped
    text4 = " ".join(r[4] for r in _rows(got) if r[0] == 4)
    assert "alpha beta gamma" not in text4  # passage excised
    assert "leak0" in text4  # surrounding prose kept
    assert 5 not in ids and 2 in ids  # dedup still keys on RAW text


def test_decontam_mask_matches_batch_operator(spark, tables, monkeypatch):
    """decontam_mask (both probe paths) reproduces the batch operator's
    clean_text exactly over the real corpus."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
        remove_contaminated_spans,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming import corpus as C

    docs = tables["documents"].limit(80)
    bench_df = tables["documents"].filter(F.col("doc_id") % 11 == 0).limit(12)
    ngrams = collect_benchmark_ngrams(bench_df, n=4)
    want = {
        r["doc_id"]: r["clean_text"]
        for r in remove_contaminated_spans(docs, bench_df, n=4).collect()
    }
    lit = {
        r["doc_id"]: r["m"]
        for r in docs.select(
            "doc_id",
            C.decontam_mask(ngrams, "text", 4, preserve_unmasked=False).alias("m"),
        ).collect()
    }
    assert lit == want
    monkeypatch.setattr(C, "_LITERAL_PROBE_MAX", 0)
    udf = {
        r["doc_id"]: r["m"]
        for r in docs.select(
            "doc_id",
            C.decontam_mask(ngrams, "text", 4, preserve_unmasked=False).alias("m"),
        ).collect()
    }
    assert udf == want
    monkeypatch.undo()
    # default mode: untouched docs pass through byte-identical, masked
    # docs still get the batch clean_text (both probe paths)
    removed = {
        r["doc_id"]: r["n_removed"]
        for r in remove_contaminated_spans(docs, bench_df, n=4).collect()
    }
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for probe_max in (None, 0):
        if probe_max is not None:
            monkeypatch.setattr(C, "_LITERAL_PROBE_MAX", probe_max)
        got = {
            r["doc_id"]: r["m"]
            for r in docs.select(
                "doc_id", C.decontam_mask(ngrams, "text", 4).alias("m")
            ).collect()
        }
        monkeypatch.undo()
        for i, m in got.items():
            assert m == (want[i] if removed[i] > 0 else raw[i]), i


def test_decontam_mask_rejects_bad_mode(spark, src, bench):
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        prepare_stream,
    )

    docs = spark.createDataFrame([(r["doc_id"], r["text"]) for r in ALL], SCHEMA)
    with pytest.raises(ValueError, match="decontam_mode"):
        prepare_stream(docs, decontam_mode="nope")


def test_stream_line_dedup_matches_batch(spark, tmp_path):
    """dedupe_doc_lines on the stream: line-boilerplate variants collapse
    exactly as in batch (dedup keys on the CLEANED text both ways)."""
    import os
    import time

    body = ("real content carried forward by plenty of perfectly ordinary "
            "words that keep this document above every quality floor here")
    rows1 = [{"doc_id": 0, "text": f"nav\n{body}\nnav\nnav"}]
    rows2 = [{"doc_id": 1, "text": f"nav\nnav\n{body}\nnav"}]  # same cleaned
    d = tmp_path / "docs"
    d.mkdir()
    base = time.time()
    for i, rows in enumerate((rows1, rows2)):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base + 10 * i, base + 10 * i))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(d))
    )
    q = (
        prepare_stream(stream, dedupe_doc_lines=True, use_gopher_rules=False,
                       min_quality=0.1)
        .writeStream.format("memory")
        .queryName("linededup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM linededup_out").collect()
    ids = {r["doc_id"] for r in got}
    assert ids == {0}  # cleaned texts identical -> second arrival deduped
    batch_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows1 + rows2], SCHEMA
    )
    want = prepare_training_corpus(
        batch_docs, dedupe_doc_lines=True, use_gopher_rules=False, min_quality=0.1
    )
    assert _rows(spark.sql("SELECT * FROM linededup_out")) == _rows(want)


def test_non_gopher_quality_trio_matches_batch(spark, src, bench):
    """use_gopher_rules=False: the batch quality stage is the heuristic
    TRIO (quality floor + repeated-word + duplicate-line ceilings); the
    stream must gate with all three, not the floor alone."""
    got = _run_stream(
        spark,
        src,
        benchmark_ngrams=collect_benchmark_ngrams(bench, n=8),
        use_gopher_rules=False,
        min_quality=0.3,
        max_repeated_word_frac=0.5,
        max_dup_line_frac=0.5,
    )
    batch_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ALL], SCHEMA
    )
    want = prepare_training_corpus(
        batch_docs,
        benchmark=bench,
        decontam_n=8,
        use_gopher_rules=False,
        min_quality=0.3,
        max_repeated_word_frac=0.5,
        max_dup_line_frac=0.5,
    )
    assert _rows(got) == _rows(want)
    # the trio does real work on this fixture: the spam doc repeats one
    # word 10/10 times — repeated_word_fraction kills it even though no
    # Gopher rule is consulted
    assert 1 not in {r[0] for r in _rows(got)}
