"""One-command STREAMING training-data run: the continuous twin of
tools/prepare_run.py, demonstrating that the streaming path produces
the same corpus the batch pipeline does — including fuzzy dedup.

    python tools/stream_run.py [sf_dir] [out_dir] [n_batches]

Splits the documents table into `n_batches` JSON micro-batch files
(ingest order = doc_id order, the documented equivalence premise), then
runs the WHOLE chain as one streaming query via
streaming/corpus.start_corpus_stream:

    ingest -> exact dedup (stream state) -> MinHash near-dedup
    (persisted band-key store) -> benchmark n-gram decontamination ->
    Gopher gates -> PII scrub -> split -> chunk -> packed token
    SHARDS (exactly-once, dynamic-partition overwrite per batch)

and finally checks the shard tree against batch
prepare_training_corpus over the same documents (same knobs as
prepare_run: gopher rules, every-17th-doc benchmark, greedy fuzzy
dedup) — printing the surviving-doc parity and token conservation, the
same contract tests/test_corpus_stream_neardup.py pins.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vsai_stream_run"
N_BATCHES = int(sys.argv[3]) if len(sys.argv) > 3 else 4

ND = dict(num_hashes=16, bands=4, shingle_size=5)


def main() -> None:
    from pyspark.sql import functions as F

    from vector_search_ai_assistant_mongodbvcore_spark import get_spark, load_tables
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
        tokenize,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        collect_benchmark_ngrams,
        start_corpus_stream,
    )

    spark = get_spark(app_name="stream-run", cpus=16)
    docs = load_tables(spark, SF_DIR)["documents"]
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.join(bench.select("doc_id"), "doc_id", "left_anti")

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    src = os.path.join(OUT, "ingest")
    os.makedirs(src)

    # micro-batch files in id order (mtime-pinned so the file source
    # drains them in sequence)
    rows = corpus.select("doc_id", "text").orderBy("doc_id").collect()
    per = max(1, (len(rows) + N_BATCHES - 1) // N_BATCHES)
    base = time.time() - 3600
    for b in range(0, len(rows), per):
        path = os.path.join(src, f"batch_{b // per:04d}.json")
        with open(path, "w") as f:
            for r in rows[b : b + per]:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(path, (base + b // per, base + b // per))

    ngrams = collect_benchmark_ngrams(bench, n=8)
    shards = os.path.join(OUT, "shards")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    t0 = time.time()
    q = start_corpus_stream(
        stream,
        shards,
        seq_len=256,
        checkpoint_dir=os.path.join(OUT, "ckpt"),
        neardup={"store_path": os.path.join(OUT, "band_store"), **ND},
        benchmark_ngrams=ngrams,
        use_gopher_rules=True,
        chunk_size=64,
        chunk_overlap=0,
    )
    q.awaitTermination(600)
    wall = time.time() - t0

    disk = spark.read.parquet(shards)
    got_ids = {
        r["doc_id"]
        for r in disk.selectExpr("explode(doc_ids) AS doc_id").distinct().collect()
    }
    n_seqs = disk.count()
    n_toks = disk.agg(F.sum("n_toks")).collect()[0][0]

    want = prepare_training_corpus(
        corpus,
        use_gopher_rules=True,
        benchmark=bench,
        chunk_size=64,
        chunk_overlap=0,
        neardup_minhash=True,
        neardup_keep="greedy",
        neardup_num_hashes=ND["num_hashes"],
        neardup_bands=ND["bands"],
        neardup_shingle_size=ND["shingle_size"],
    ).persist()
    want_ids = {r["doc_id"] for r in want.select("doc_id").distinct().collect()}
    want_toks = want.agg(F.sum(F.size(tokenize(F.col("chunk_text"))))).collect()[0][0]

    summary = {
        "sf_dir": SF_DIR,
        "micro_batches": N_BATCHES,
        "stream_wall_sec": round(wall, 1),
        "docs_in": len(rows),
        "docs_survived": len(got_ids),
        "sequences": n_seqs,
        "tokens": int(n_toks or 0),
        "doc_parity_with_batch": got_ids == want_ids,
        "token_parity_with_batch": int(n_toks or 0) == int(want_toks or 0),
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if not (summary["doc_parity_with_batch"] and summary["token_parity_with_batch"]):
        raise SystemExit("stream/batch parity FAILED")
    spark.stop()


if __name__ == "__main__":
    main()
