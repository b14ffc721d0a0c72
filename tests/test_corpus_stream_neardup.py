"""start_corpus_stream with fuzzy (MinHash) near-dedup composed into the
ingest -> shards chain (streaming/corpus.py + streaming/neardup.py): the
streaming path must produce the same surviving documents and token
content as batch prepare_training_corpus(neardup_minhash=True,
neardup_keep="greedy") — the one-command batch default — including the
ordering subtlety that a doc DROPPED later in the chain (decontam/gates)
still poisons its near-dups, because fuzzy dedup runs before those
stages on both paths."""

from __future__ import annotations

import pytest

import json

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import tokenize
from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
    prepare_training_corpus,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
    collect_benchmark_ngrams,
    start_corpus_stream,
)


pytestmark = pytest.mark.deep  # slow E2E lane (r16 tiering): run with -m deep

SCHEMA = "doc_id LONG, text STRING"
BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
# stream store params must match the batch pipeline's neardup_* knobs
ND = dict(num_hashes=16, bands=8, shingle_size=3)


def _prose(tag: str, n: int = 120) -> str:
    return " ".join(
        f"{tag}{i} carries ordinary narrative prose forward" for i in range(n // 6 + 1)
    )


FAM = _prose("fam")
DUP = _prose("dup")

# b1 < b2 < b3 by id (ingest order = id order, the documented premise).
#   0  clean keeper
#   1  CONTAMINATED near-dup seed: shares FAM prose, carries the benchmark
#      passage — decontam drops it, but its band keys must still poison 3
#   2  exact-dup seed
#   3  near-dup of 1 (clean tail) — dropped by FUZZY dedup in both paths,
#      even though its poisoner never reaches the corpus
#   4  clean keeper
#   5  exact dup of 2 — dropped by EXACT dedup
#   6  near-dup of 0? no: independent keeper
B1 = [
    {"doc_id": 0, "text": _prose("north")},
    {"doc_id": 1, "text": FAM + " " + BENCH_TEXT},
    {"doc_id": 2, "text": DUP},
]
B2 = [
    {"doc_id": 3, "text": FAM + " harmless extra tail"},
    {"doc_id": 4, "text": _prose("mail") + " contact someone@example.com today"},
]
B3 = [
    {"doc_id": 5, "text": DUP},
    {"doc_id": 6, "text": _prose("south")},
]
ALL = B1 + B2 + B3


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


def _batch_want(spark, bench):
    docs = spark.createDataFrame([(r["doc_id"], r["text"]) for r in ALL], SCHEMA)
    return prepare_training_corpus(
        docs,
        benchmark=bench,
        decontam_n=8,
        use_gopher_rules=True,
        neardup_minhash=True,
        neardup_keep="greedy",
        neardup_num_hashes=ND["num_hashes"],
        neardup_bands=ND["bands"],
        neardup_shingle_size=ND["shingle_size"],
    )


def _run(spark, d, tmp_path, ckpt, out, bench_ngrams):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(d))
    )
    q = start_corpus_stream(
        stream,
        out,
        seq_len=16,
        checkpoint_dir=str(tmp_path / ckpt),
        neardup={"store_path": str(tmp_path / "band_store"), **ND},
        benchmark_ngrams=bench_ngrams,
        use_gopher_rules=True,
    )
    q.awaitTermination(240)


def test_corpus_stream_fuzzy_equals_batch(spark, tmp_path):
    bench = spark.createDataFrame([(100, BENCH_TEXT)], SCHEMA)
    d = tmp_path / "docs"
    d.mkdir()
    _write_batches(d, [B1, B2, B3])
    out = str(tmp_path / "shards")
    _run(spark, d, tmp_path, "ck", out, collect_benchmark_ngrams(bench, n=8))

    disk = spark.read.parquet(out)
    got_ids = {
        r["doc_id"]
        for r in disk.selectExpr("explode(doc_ids) AS doc_id").distinct().collect()
    }
    want = _batch_want(spark, bench).persist()
    want_ids = {r["doc_id"] for r in want.select("doc_id").distinct().collect()}
    assert got_ids == want_ids
    # the scenario the composition exists for: 3 near-dups the
    # CONTAMINATED doc 1 — batch drops 3 via fuzzy dedup BEFORE decontam
    # removes 1, so the stream must too (fuzzy-after-gates would keep 3)
    assert 1 not in got_ids and 3 not in got_ids
    assert 5 not in got_ids and 2 in got_ids  # exact dedup across batches
    assert {0, 4, 6} <= got_ids
    # token conservation vs the batch chunk rows: same chunks -> same
    # engine-tokenizer token count landing in the shard sequences
    want_tokens = want.agg(
        F.sum(F.size(tokenize(F.col("chunk_text"))))
    ).collect()[0][0]
    assert disk.agg(F.sum("n_toks")).collect()[0][0] == want_tokens
    want.unpersist()


def test_post_dedup_stages_row_for_row_vs_batch(spark):
    """The in-sink stateless tail (_post_dedup_stages) equals the batch
    pipeline's post-dedup stages ROW FOR ROW: feed both the identical
    fully-deduplicated pool and compare chunk rows exactly."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
        drop_near_duplicates,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        _post_dedup_stages,
    )

    bench = spark.createDataFrame([(100, BENCH_TEXT)], SCHEMA)
    docs = spark.createDataFrame([(r["doc_id"], r["text"]) for r in ALL], SCHEMA)
    keep = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    pool = docs.join(keep, "doc_id", "left_semi")
    pairs = minhash_lsh_pairs(pool, **ND)
    pool = drop_near_duplicates(pool, pairs)

    got = _post_dedup_stages(
        pool,
        text_col="text",
        id_col="doc_id",
        # Gopher rules replace the heuristic trio — pass the trio at its
        # defaults so the engine's contradictory-kwargs warning stays quiet
        use_gopher_rules=True,
        min_quality=0.3,
        max_repeated_word_frac=0.5,
        max_dup_line_frac=0.5,
        quality_model=None,
        min_classifier_prob=0.5,
        blocklist=None,
        blocklist_max_hits=0,
        benchmark_ngrams=collect_benchmark_ngrams(bench, n=8),
        decontam_n=8,
        decontam_min_hits=1,
        decontam_mode="drop",
        splits=None,
        seed=42,
        scrub=True,
        chunk_size=32,
        chunk_overlap=8,
    )
    want = _batch_want(spark, bench)
    key = lambda r: (r["doc_id"], r["split"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_combined_state_survives_restart(spark, tmp_path):
    """Stop/restart from the same checkpoint: BOTH dedup states persist —
    the exact-fingerprint state (Spark state store via the checkpoint)
    and the band-key store (its own versioned table) — so an exact dup
    AND a near-dup arriving after the restart are still dropped."""
    bench_ngrams: list[str] = []
    d = tmp_path / "docs"
    d.mkdir()
    out = str(tmp_path / "shards")
    _write_batches(d, [B1])
    _run(spark, d, tmp_path, "ck", out, bench_ngrams)
    first = {
        r["doc_id"]
        for r in spark.read.parquet(out)
        .selectExpr("explode(doc_ids) AS doc_id")
        .distinct()
        .collect()
    }
    # without decontam, doc 1 (contaminated text, fine prose) survives
    assert first == {0, 1, 2}

    _write_batches(
        d,
        [[
            {"doc_id": 10, "text": DUP},                         # exact dup of 2
            {"doc_id": 11, "text": FAM + " post restart tail"},  # near-dup of 1
            {"doc_id": 12, "text": _prose("fresh")},
        ]],
    )
    _run(spark, d, tmp_path, "ck", out, bench_ngrams)
    seen = {
        r["doc_id"]
        for r in spark.read.parquet(out)
        .selectExpr("explode(doc_ids) AS doc_id")
        .distinct()
        .collect()
    }
    assert 10 not in seen  # exact state survived the restart
    assert 11 not in seen  # band-key store survived the restart
    assert 12 in seen


def test_corpus_stream_fuzzy_mask_mode_equals_batch(spark, tmp_path):
    """decontam_mode='mask' composed WITH fuzzy dedup: the contaminated
    near-dup seed (doc 1) is masked, not dropped — but it still poisons
    doc 3 via fuzzy dedup, which runs BEFORE masking on both paths."""
    bench = spark.createDataFrame([(100, BENCH_TEXT)], SCHEMA)
    d = tmp_path / "docs"
    d.mkdir()
    _write_batches(d, [B1, B2, B3])
    out = str(tmp_path / "shards")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(d))
    )
    q = start_corpus_stream(
        stream,
        out,
        seq_len=16,
        checkpoint_dir=str(tmp_path / "ck"),
        neardup={"store_path": str(tmp_path / "band_store"), **ND},
        benchmark_ngrams=collect_benchmark_ngrams(bench, n=8),
        decontam_mode="mask",
        use_gopher_rules=True,
    )
    q.awaitTermination(240)

    disk = spark.read.parquet(out)
    got_ids = {
        r["doc_id"]
        for r in disk.selectExpr("explode(doc_ids) AS doc_id").distinct().collect()
    }
    docs = spark.createDataFrame([(r["doc_id"], r["text"]) for r in ALL], SCHEMA)
    want = prepare_training_corpus(
        docs,
        benchmark=bench,
        decontam_n=8,
        decontam_mode="mask",
        use_gopher_rules=True,
        neardup_minhash=True,
        neardup_keep="greedy",
        neardup_num_hashes=ND["num_hashes"],
        neardup_bands=ND["bands"],
        neardup_shingle_size=ND["shingle_size"],
    ).persist()
    want_ids = {r["doc_id"] for r in want.select("doc_id").distinct().collect()}
    assert got_ids == want_ids
    # mask mode keeps the contaminated doc (excised), fuzzy still drops 3
    assert 1 in got_ids and 3 not in got_ids
    want_tokens = want.agg(
        F.sum(F.size(tokenize(F.col("chunk_text"))))
    ).collect()[0][0]
    assert disk.agg(F.sum("n_toks")).collect()[0][0] == want_tokens
    want.unpersist()
