"""Auto-maintenance for append-heavy streaming sinks
(sources/maintenance.py + the compact_every knob in
streaming/incremental.py + the per-index compact() methods).

The stream probe showed micro-batch latency is COW-fixed-cost dominated
— but the OTHER pressure point is file-count growth: every
add_documents APPENDS a file set into the touched partitions, so a
long-running ingest stream degrades scans linearly with batch count
unless something compacts. These tests run a ≥20-micro-batch stream and
pin (a) bounded per-partition file counts, (b) unchanged search
results, (c) zero-IO no-op when nothing crossed the threshold."""

from __future__ import annotations

import pytest

import glob
import json
import os

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import (
    HashNgramEmbedder,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex
from vector_search_ai_assistant_mongodbvcore_spark.sources.ingest import (
    ingest_and_vectorize,
)
from vector_search_ai_assistant_mongodbvcore_spark.sources.maintenance import (
    compact_partitioned_dir,
    partition_file_counts,
)

EMB = HashNgramEmbedder(dims=32)
CHANGE_SCHEMA = "id string, name string, description string, _op string"


def _doc(i: int) -> dict:
    return {
        "id": f"doc-{i:04d}",
        "name": f"Product {i}",
        "description": f"article number {i} in the rolling catalog of goods",
        "_op": "upsert",
    }


def _seed_index(spark, path: str) -> LshIndex:
    df = spark.createDataFrame(
        [(d["id"], d["name"], d["description"]) for d in map(_doc, range(20))],
        "id string, name string, description string",
    )
    corpus = ingest_and_vectorize(df, embedder=EMB)
    # bits=1, tables=2 -> 4 partitions total: every batch hits every
    # partition, the fastest possible file-count growth
    return LshIndex(spark, path).build(
        corpus, dims=32, bits=1, tables=2, vector_col="vector", id_col="id"
    )


def test_compact_partitioned_dir_unit(spark, tmp_path):
    d = str(tmp_path / "part")
    rows = spark.createDataFrame([(i, i % 3) for i in range(30)], "v long, p long")
    for _ in range(5):  # five appends -> 5+ files per partition
        rows.repartition(F.col("p")).write.mode("append").partitionBy("p").parquet(d)
    before = partition_file_counts(d, ["p"])
    assert max(before.values()) >= 5
    want = sorted(r["v"] for r in spark.read.parquet(d).collect())
    n = compact_partitioned_dir(spark, d, ["p"], max_files=4)
    assert n == 3  # all three partitions crossed the threshold
    after = partition_file_counts(d, ["p"])
    assert max(after.values()) < 4
    assert sorted(r["v"] for r in spark.read.parquet(d).collect()) == want
    # already compact: second call is a zero-IO no-op
    assert compact_partitioned_dir(spark, d, ["p"], max_files=4) == 0


def test_long_run_stream_with_compaction_bounds_files(spark, tmp_path):
    """≥20 micro-batches through the index change sink with
    compact_every: per-partition file counts stay bounded, and the
    index serves the full corpus identically to a fresh build."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        start_index_change_stream,
    )

    idx = _seed_index(spark, str(tmp_path / "lsh"))
    src = tmp_path / "changes"
    src.mkdir()
    base = __import__("time").time()
    n_batches = 22
    for b in range(n_batches):
        p = src / f"b{b:03d}.json"
        with open(p, "w") as f:
            for j in range(2):
                f.write(json.dumps(_doc(100 + b * 2 + j)) + "\n")
        os.utime(p, (base + b, base + b))

    start_index_change_stream(
        spark,
        str(src),
        CHANGE_SCHEMA,
        idx,
        "id",
        str(tmp_path / "ckpt"),
        embedder=EMB,
        compact_every=5,
        max_files_per_partition=6,
    ).awaitTermination(600)

    counts = partition_file_counts(
        os.path.join(str(tmp_path / "lsh"), "data"), ["table", "bucket"]
    )
    # 22 appends with compact_every=5/threshold 6: without maintenance a
    # partition would hold 20+ files; with it, never more than
    # threshold-1 survivors + the ≤compact_every appends since last sweep
    assert max(counts.values()) <= 6 + 5 - 1
    # the index still serves every doc: fresh-build parity on a probe query
    q = [float(x) for x in EMB.embed_numpy(["article number 120 rolling catalog"])[0]]
    got = {r["id"] for r in idx.search(q, k=5).collect()}
    all_docs = spark.createDataFrame(
        [(d["id"], d["name"], d["description"]) for d in map(_doc, range(20))]
        + [
            (d["id"], d["name"], d["description"])
            for d in map(_doc, range(100, 100 + 2 * n_batches))
        ],
        "id string, name string, description string",
    )
    fresh = LshIndex(spark, str(tmp_path / "lsh_fresh")).build(
        ingest_and_vectorize(all_docs, embedder=EMB),
        dims=32, bits=1, tables=2, vector_col="vector", id_col="id",
    )
    want = {r["id"] for r in fresh.search(q, k=5).collect()}
    assert got == want


@pytest.mark.deep  # slow sweep/E2E (r16 tiering)
def test_bm25_and_ivf_compact_preserve_results(spark, tmp_path):
    """compact() on the other two index families: file counts drop,
    search results byte-identical."""
    import numpy as np

    from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import (
        Bm25Index,
    )

    docs = [(f"d{i}", f"rolling catalog article number {i} of goods") for i in range(30)]
    bm = Bm25Index(spark, str(tmp_path / "bm")).build(
        spark.createDataFrame(docs, "doc_id string, text string"),
        text_col="text", id_col="doc_id", n_buckets=4,
    )
    for i in range(30, 42, 2):
        bm.add_documents(
            spark.createDataFrame(
                [(f"d{i}", f"rolling catalog article number {i} of goods"),
                 (f"d{i+1}", f"rolling catalog article number {i+1} of goods")],
                "doc_id string, text string",
            ),
            text_col="text", id_col="doc_id", on_duplicate="trust",
        )
    before = bm.search("rolling catalog goods", k=5).collect()
    assert bm.compact(max_files_per_partition=3) > 0
    after = bm.search("rolling catalog goods", k=5).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]

    rng = np.random.default_rng(3)
    vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(40)]
    ivf = IvfIndex(spark, str(tmp_path / "ivf")).build(
        spark.createDataFrame(vecs, "vec_id long, embedding array<float>"),
        num_lists=4, vector_col="embedding", id_col="vec_id",
    )
    for i in range(40, 52, 2):
        more = [(j, [float(x) for x in rng.normal(size=16)]) for j in (i, i + 1)]
        ivf.add_documents(
            spark.createDataFrame(more, "vec_id long, embedding array<float>"),
            id_col="vec_id", on_duplicate="trust",
        )
    q = [float(x) for x in rng.normal(size=16)]
    before = ivf.search(q, k=5, n_probe=4).collect()
    assert ivf.compact(max_files_per_partition=3) > 0
    after = ivf.search(q, k=5, n_probe=4).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
