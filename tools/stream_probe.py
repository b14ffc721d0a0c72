"""Streaming throughput probe: rows/s and per-micro-batch latency for the
near-real-time surfaces.

The reference's quantitative contract is qualitative ("near real-time",
README.md:180-194; Vectorize/AddRemoveData.cs:23-125) — this probe puts
numbers on the Spark form: change-record micro-batches driven through

  table     BucketedTable merge/delete (start_change_stream topology)
  lsh       LshIndex remove+add maintenance (apply_index_changes)
  ivf       IvfIndex remove+add maintenance (frozen centroids)
  bm25      Bm25Index remove+add maintenance (keyword leg)
  neardup   greedy MinHash near-dedup against the persisted band-key
            store (streaming/neardup.start_neardup_dedup_stream)
  embneardup  the embedding form (incremental SemDeDup, int8 store)
  corpus    the full gate -> decontam -> dedup -> split -> chunk chain
            (streaming/corpus.prepare_stream) to a memory sink
  shards    the same chain terminated by start_shard_export_stream —
            micro-batch packing + partitioned parquet shard writes, the
            complete streaming ingest -> trainer-shards loop
  langexport  multilingual docs -> language routing -> per-language
            partitioned parquet (start_language_export_stream), the
            CCNet hand-off as a continuous sink

at two micro-batch sizes. Latency comes from each StreamingQuery's
progress log (durationMs.triggerExecution per micro-batch); throughput
is input rows / sum of trigger time. Results print as one JSON line per
(probe, batch_size) and feed the SCALE.md "Streaming throughput"
section.

Usage: python tools/stream_probe.py [--sizes 200 2000] [--batches 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_search_ai_assistant_mongodbvcore_spark import get_spark  # noqa: E402
from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import (  # noqa: E402
    HashNgramEmbedder,
)

CHANGE_SCHEMA = "id STRING, name STRING, description STRING, _op STRING"
DOC_SCHEMA = "doc_id LONG, text STRING"

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _text(i: int, n: int = 60) -> str:
    return " ".join(WORDS[(i * 7 + j * 3) % len(WORDS)] + str((i + j) % 97) for j in range(n))


def _write_change_files(
    d: str, sizes: list[int], op: str, start: int = 0, mtime_offset: int = 0
) -> int:
    """One JSON file per micro-batch, strictly increasing mtimes;
    `mtime_offset` orders delete files strictly AFTER the upserts they
    target (the file source processes in mtime order)."""
    base = time.time() - 3600 + mtime_offset
    rid = start
    for bi, n in enumerate(sizes):
        path = os.path.join(d, f"{op}_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(n):
                rec = {
                    "id": f"d{rid}",
                    "name": f"item {rid}",
                    "description": _text(rid),
                    "_op": op,
                }
                f.write(json.dumps(rec) + "\n")
                rid += 1
        os.utime(path, (base + bi, base + bi))
    return rid


def _progress(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        elif not isinstance(p, dict):
            p = json.loads(p.json)
        out.append(p)
    return [p for p in out if p.get("numInputRows", 0) > 0]


def _summarize(progress: list[dict], rows: int) -> dict:
    # rows comes from the generator, NOT numInputRows: inside foreachBatch
    # every action re-scans the file source, so the progress metric
    # multiple-counts input rows
    trig_ms = [p["durationMs"]["triggerExecution"] for p in progress]
    if not trig_ms:
        # recentProgress buffer evicted every input batch (or nothing was
        # ingested): report the anomaly instead of dying on a division
        return {"micro_batches": 0, "rows": rows, "rows_per_sec": None,
                "batch_latency_ms": None}
    total_s = sum(trig_ms) / 1000.0
    return {
        "micro_batches": len(progress),
        "rows": rows,
        "rows_per_sec": round(rows / total_s, 1) if total_s else None,
        "batch_latency_ms": {
            "mean": round(sum(trig_ms) / len(trig_ms), 1),
            "max": max(trig_ms),
        },
    }


def _drain(writer, ckpt: str) -> list[dict]:
    q = writer.option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    q.awaitTermination(600)
    return _progress(q)


def probe_table(spark, work: str, batch: int, batches: int) -> dict:
    from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
        BucketedTable,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_changes,
    )

    emb = HashNgramEmbedder(dims=64)
    table = BucketedTable(spark, os.path.join(work, "table"), ["id"], n_buckets=16)
    base = spark.range(5000).select(
        F.concat(F.lit("base"), F.col("id")).alias("id"),
        F.concat(F.lit("item "), F.col("id")).alias("name"),
        F.col("id").cast("string").alias("description"),
        F.array(*[F.lit(0.1)] * 64).cast("array<float>").alias("vector"),
    )
    table.overwrite(base)
    src = os.path.join(work, "tbl_changes")
    os.makedirs(src)
    n = _write_change_files(src, [batch] * batches, "upsert")
    n_del = max(1, batch // 10)
    _write_change_files(src, [n_del], "delete", start=0, mtime_offset=1000)

    stream = spark.readStream.schema(CHANGE_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    progress = _drain(
        stream.writeStream.foreachBatch(
            lambda df, _e: apply_changes(table, df, ["id"], emb)
        ),
        os.path.join(work, "tbl_ckpt"),
    )
    assert table.read().filter(F.col("id").startswith("d")).count() == n - n_del
    return _summarize(progress, n + n_del)


def _index_probe(spark, work: str, batch: int, batches: int, kind: str) -> dict:
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_index_changes,
        apply_keyword_index_changes,
    )

    emb = HashNgramEmbedder(dims=64)
    base = spark.range(5000).select(
        F.concat(F.lit("base"), F.col("id")).alias("id"),
        F.col("id").cast("string").alias("text"),
        F.array(*[(F.col("id") % (i + 7)).cast("float") for i in range(64)]).alias(
            "vector"
        ),
    )
    if kind == "lsh":
        from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import (
            LshIndex,
        )

        idx = LshIndex(spark, os.path.join(work, "lsh")).build(
            base, dims=64, bits=2, tables=4, vector_col="vector", id_col="id"
        )
        body = lambda df, _e: apply_index_changes(idx, df, "id", emb)  # noqa: E731
    elif kind == "ivf":
        from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex

        idx = IvfIndex(spark, os.path.join(work, "ivf")).build(
            base, vector_col="vector", num_lists=16, seed=42, id_col="id"
        )
        body = lambda df, _e: apply_index_changes(idx, df, "id", emb)  # noqa: E731
    elif kind == "hnsw":
        from vector_search_ai_assistant_mongodbvcore_spark.operators.hnsw import (
            PartitionedHnswIndex,
        )

        idx = PartitionedHnswIndex(spark, os.path.join(work, "hnsw")).build(
            base, vector_col="vector", id_col="id", shards=8
        )
        # upserts land as delta segments (graph build is the batch's own
        # O(batch) work), deletes as per-segment tombstones
        body = lambda df, _e: apply_index_changes(idx, df, "id", emb)  # noqa: E731
    else:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import (
            Bm25Index,
        )

        idx = Bm25Index(spark, os.path.join(work, "bm25")).build(
            base.select("id", "text"), text_col="text", id_col="id", n_buckets=8
        )
        body = lambda df, _e: apply_keyword_index_changes(  # noqa: E731
            idx, df, "id", text_cols=("name", "description")
        )

    src = os.path.join(work, f"{kind}_changes")
    os.makedirs(src)
    n = _write_change_files(src, [batch] * batches, "upsert")
    n_del = max(1, batch // 10)
    _write_change_files(src, [n_del], "delete", start=0, mtime_offset=1000)
    stream = spark.readStream.schema(CHANGE_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    return _summarize(
        _drain(stream.writeStream.foreachBatch(body), os.path.join(work, f"{kind}_ckpt")),
        n + n_del,
    )


def probe_corpus_chain(spark, work: str, batch: int, batches: int) -> dict:
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        prepare_stream,
    )

    src = os.path.join(work, "docs")
    os.makedirs(src)
    base = time.time() - 3600
    rid = 0
    for bi in range(batches):
        path = os.path.join(src, f"docs_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(batch):
                f.write(json.dumps({"doc_id": rid, "text": _text(rid, 80)}) + "\n")
                rid += 1
        os.utime(path, (base + bi, base + bi))
    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    name = f"probe_chain_{batch}"
    q = (
        prepare_stream(stream, benchmark_ngrams=["never matches anything at all"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "chain_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return _summarize(_progress(q), rid)


def probe_shard_export(spark, work: str, batch: int, batches: int) -> dict:
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        prepare_stream,
        start_shard_export_stream,
    )

    src = os.path.join(work, "docs")
    os.makedirs(src)
    base = time.time() - 3600
    rid = 0
    for bi in range(batches):
        path = os.path.join(src, f"docs_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(batch):
                f.write(json.dumps({"doc_id": rid, "text": _text(rid, 80)}) + "\n")
                rid += 1
        os.utime(path, (base + bi, base + bi))
    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    # SAME upstream chain as probe_corpus_chain (incl. the decontam
    # screen), so the SCALE.md rows differ only by the shard-export stage
    q = start_shard_export_stream(
        prepare_stream(stream, benchmark_ngrams=["never matches anything at all"]),
        os.path.join(work, "shards"),
        seq_len=256,
        checkpoint_dir=os.path.join(work, "shard_ckpt"),
    )
    q.awaitTermination(600)
    return _summarize(_progress(q), rid)


def probe_neardup(spark, work: str, batch: int, batches: int) -> dict:
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        start_neardup_dedup_stream,
    )

    src = os.path.join(work, "docs")
    os.makedirs(src)
    base = time.time() - 3600
    rid = 0
    for bi in range(batches):
        path = os.path.join(src, f"docs_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(batch):
                # every 5th doc is a near-dup of an earlier one (suffix
                # variant), so the store probe and the greedy drop both
                # do real work
                if rid % 5 == 4:
                    body = _text(rid - 2, 80) + " trailing variant words"
                else:
                    body = _text(rid, 80)
                f.write(json.dumps({"doc_id": rid, "text": body}) + "\n")
                rid += 1
        os.utime(path, (base + bi, base + bi))
    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = start_neardup_dedup_stream(
        stream,
        os.path.join(work, "kept"),
        os.path.join(work, "nd_store"),
        os.path.join(work, "nd_ckpt"),
    )
    q.awaitTermination(600)
    return _summarize(_progress(q), rid)


def probe_embedding_neardup(spark, work: str, batch: int, batches: int) -> dict:
    import numpy as np

    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        start_embedding_neardup_stream,
    )

    dims = 64
    src = os.path.join(work, "vecs")
    os.makedirs(src)
    base = time.time() - 3600
    rng = np.random.default_rng(11)
    rid = 0
    for bi in range(batches):
        path = os.path.join(src, f"vecs_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(batch):
                # every 5th vector is a jittered near-dup of an earlier one
                if rid % 5 == 4 and rid >= 2:
                    v = np.asarray(vprev) + 0.01 * rng.normal(size=dims)
                else:
                    v = rng.normal(size=dims)
                    vprev = v
                f.write(json.dumps({"vec_id": rid, "embedding": [float(x) for x in v]}) + "\n")
                rid += 1
        os.utime(path, (base + bi, base + bi))
    schema = "vec_id LONG, embedding ARRAY<DOUBLE>"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    q = start_embedding_neardup_stream(
        stream,
        os.path.join(work, "kept"),
        os.path.join(work, "estore"),
        os.path.join(work, "eckpt"),
        dims=dims,
        int8=True,
    )
    q.awaitTermination(600)
    return _summarize(_progress(q), rid)


def probe_fuzzy_corpus(spark, work: str, batch: int, batches: int) -> dict:
    """The COMPOSED chain: ingest -> exact dedup -> MinHash near-dedup
    (band-key store) -> decontam -> gates -> scrub -> split -> chunk ->
    shard export, all in one query (start_corpus_stream with neardup=).
    Same doc mix as probe_neardup (every 5th doc a near-dup variant), so
    the delta vs the `shards` row is the price of in-sink fuzzy dedup."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        start_corpus_stream,
    )

    src = os.path.join(work, "docs")
    os.makedirs(src)
    base = time.time() - 3600
    rid = 0
    for bi in range(batches):
        path = os.path.join(src, f"docs_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(batch):
                if rid % 5 == 4:
                    body = _text(rid - 2, 80) + " trailing variant words"
                else:
                    body = _text(rid, 80)
                f.write(json.dumps({"doc_id": rid, "text": body}) + "\n")
                rid += 1
        os.utime(path, (base + bi, base + bi))
    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = start_corpus_stream(
        stream,
        os.path.join(work, "shards"),
        seq_len=256,
        checkpoint_dir=os.path.join(work, "fc_ckpt"),
        neardup={"store_path": os.path.join(work, "fc_store")},
        benchmark_ngrams=["never matches anything at all"],
    )
    q.awaitTermination(600)
    return _summarize(_progress(q), rid)


LANG_SENTS = {
    "en": "the weather this morning was cold and the streets were quiet near the old station",
    "de": "das wetter heute morgen war kalt und die straßen waren leer nahe dem alten bahnhof",
    "fr": "le temps ce matin était froid et les rues étaient calmes près de la vieille gare",
}


def probe_lang_export(spark, work: str, batch: int, batches: int) -> dict:
    """Streaming per-language partitioned export: multilingual docs ->
    pure-codegen language routing -> salted partitioned parquet write
    under <lang>/export_batch=<n> (streaming/corpus.
    start_language_export_stream). Measures the full route+write loop —
    the CCNet hand-off running as a continuous sink."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.language_id import (
        fit_language_id,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        start_language_export_stream,
    )

    train = spark.createDataFrame(
        [(lang, f"{s} variante {i}") for lang, s in LANG_SENTS.items() for i in range(4)],
        "lang string, text string",
    )
    model = fit_language_id(train, dims=2048, reg=1e-4)
    langs = sorted(LANG_SENTS)
    src = os.path.join(work, "docs")
    os.makedirs(src)
    base = time.time() - 3600
    rid = 0
    for bi in range(batches):
        path = os.path.join(src, f"docs_{bi:04d}.json")
        with open(path, "w") as f:
            for _ in range(batch):
                lang = langs[rid % len(langs)]
                f.write(
                    json.dumps(
                        {"doc_id": rid, "text": f"{LANG_SENTS[lang]} nummer {rid}"}
                    )
                    + "\n"
                )
                rid += 1
        os.utime(path, (base + bi, base + bi))
    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = start_language_export_stream(
        stream,
        model,
        os.path.join(work, "tree"),
        os.path.join(work, "lang_ckpt"),
        files_per_lang=4,
        salt_col="doc_id",
    )
    q.awaitTermination(600)
    return _summarize(_progress(q), rid)


PROBES = {
    "table": probe_table,
    "lsh": lambda s, w, b, n: _index_probe(s, w, b, n, "lsh"),
    "ivf": lambda s, w, b, n: _index_probe(s, w, b, n, "ivf"),
    "hnsw": lambda s, w, b, n: _index_probe(s, w, b, n, "hnsw"),
    "bm25": lambda s, w, b, n: _index_probe(s, w, b, n, "bm25"),
    "corpus": probe_corpus_chain,
    "shards": probe_shard_export,
    "neardup": probe_neardup,
    "embneardup": probe_embedding_neardup,
    "fuzzycorpus": probe_fuzzy_corpus,
    "langexport": probe_lang_export,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[200, 2000])
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--probes", nargs="+", default=list(PROBES))
    args = ap.parse_args()

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    results = []
    for name in args.probes:
        for size in args.sizes:
            work = tempfile.mkdtemp(prefix=f"probe_{name}_{size}_")
            try:
                t0 = time.time()
                summary = PROBES[name](spark, work, size, args.batches)
                summary.update(probe=name, rows_per_batch=size, wall_sec=round(time.time() - t0, 1))
                results.append(summary)
                print(json.dumps(summary))
            finally:
                shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"all": results}))
    spark.stop()


if __name__ == "__main__":
    main()
