"""The golden 'Cosmic Socks' E2E (reference README.md:184-194) + the
Structured Streaming change path (§2.7, AddRemoveData.cs:23-125).

Script mirrored from the reference's acceptance walkthrough: a socks corpus
is searchable; UPSERT one 'Cosmic Socks' product -> it appears in top-k for
a socks query in the next committed batch; DELETE it -> the original result
set returns."""

import json

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import HashNgramEmbedder
from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import vector_search
from vector_search_ai_assistant_mongodbvcore_spark.sources.ingest import ingest_and_vectorize
from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import ManagedTable
from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
    apply_changes,
    start_change_stream,
)


pytestmark = pytest.mark.deep  # slow E2E lane (r16 tiering): run with -m deep

EMB = HashNgramEmbedder(dims=64)

SOCKS = [
    ("sock-1", "socks", "Racing Socks, S", "Lightweight racing socks in small"),
    ("sock-2", "socks", "Racing Socks, M", "Lightweight racing socks in medium"),
    ("sock-3", "socks", "Mountain Socks, S", "Thick mountain bike socks in small"),
    ("sock-4", "socks", "Mountain Socks, M", "Thick mountain bike socks in medium"),
    ("helm-1", "helmets", "Sport Helmet", "A sturdy sport helmet"),
]

COSMIC = ("sock-9", "socks", "Cosmic Socks, M", "Limited edition cosmic print socks in medium")

CHANGE_SCHEMA = "id string, categoryName string, name string, description string, _op string"


def _seed_products(spark, tmp_path):
    table = ManagedTable(spark, str(tmp_path / "products"))
    df = spark.createDataFrame(SOCKS, "id string, categoryName string, name string, description string")
    table.overwrite(ingest_and_vectorize(df, embedder=EMB))
    return table


def _socks_query(table, k=4, question="What kind of socks do you have?"):
    q = [float(x) for x in EMB.embed_numpy([question])[0]]
    top = vector_search(table.read(), q, k=k, vector_col="vector", id_col="id")
    return [r.name for r in top.collect()]


# a query textually close to the Cosmic doc so the toy 64-dim hash embedder
# ranks it decisively (ranking QUALITY is the embedder's business; the E2E
# contract under test is searchable-after-add / gone-after-remove)
COSMIC_QUESTION = "limited edition cosmic print socks in medium"


def test_golden_socks_add_remove(spark, tmp_path):
    """README.md:184-194 via the batch change-apply path (AddRemoveData.cs
    add/remove -> UpsertProductAsync/DeleteProductAsync)."""
    table = _seed_products(spark, tmp_path)
    baseline = _socks_query(table)
    assert len(baseline) == 4 and "Cosmic Socks, M" not in baseline

    # ADD: upsert + embed -> immediately searchable, top-ranked for its query
    add = spark.createDataFrame([COSMIC + ("upsert",)], CHANGE_SCHEMA)
    apply_changes(table, add, keys=["id"], embedder=EMB)
    assert table.read().count() == len(SOCKS) + 1
    assert _socks_query(table, k=3, question=COSMIC_QUESTION)[0] == "Cosmic Socks, M"

    # REMOVE: delete -> gone from search, original result set restored
    rm = spark.createDataFrame([COSMIC + ("delete",)], CHANGE_SCHEMA)
    apply_changes(table, rm, keys=["id"], embedder=EMB)
    assert "Cosmic Socks, M" not in _socks_query(table, k=5, question=COSMIC_QUESTION)
    assert _socks_query(table) == baseline


def test_upsert_replaces_by_key_and_reembeds(spark, tmp_path):
    table = _seed_products(spark, tmp_path)
    v_before = table.read().filter(F.col("id") == "sock-1").first().vector
    edit = spark.createDataFrame(
        [("sock-1", "socks", "Racing Socks, S", "Now with extra cushioning", "upsert")],
        CHANGE_SCHEMA,
    )
    apply_changes(table, edit, keys=["id"], embedder=EMB)
    rows = table.read().filter(F.col("id") == "sock-1").collect()
    assert len(rows) == 1  # replaced, not duplicated
    assert rows[0].description == "Now with extra cushioning"
    assert rows[0].vector != v_before  # re-embedded from the new document


def test_change_apply_over_bucketed_store(spark, tmp_path):
    """Same golden script against the file-level-COW BucketedTable — the
    layout a LARGE product corpus needs (per-batch merge cost = touched
    buckets, not the table)."""
    from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import BucketedTable

    table = BucketedTable(spark, str(tmp_path / "products"), bucket_by=["id"], n_buckets=4)
    df = spark.createDataFrame(SOCKS, "id string, categoryName string, name string, description string")
    table.overwrite(ingest_and_vectorize(df, embedder=EMB))

    add = spark.createDataFrame([COSMIC + ("upsert",)], CHANGE_SCHEMA)
    apply_changes(table, add, keys=["id"], embedder=EMB)
    assert _socks_query(table, k=3, question=COSMIC_QUESTION)[0] == "Cosmic Socks, M"

    rm = spark.createDataFrame([COSMIC + ("delete",)], CHANGE_SCHEMA)
    apply_changes(table, rm, keys=["id"], embedder=EMB)
    assert "Cosmic Socks, M" not in _socks_query(table, k=5, question=COSMIC_QUESTION)


def test_streaming_change_stream_end_to_end(spark, tmp_path):
    """readStream(json) -> foreachBatch(apply_changes): the near-real-time
    contract driven through an actual StreamingQuery (availableNow)."""
    table = _seed_products(spark, tmp_path)
    src = tmp_path / "changes"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    with open(src / "c1.json", "w") as f:
        f.write(json.dumps(dict(zip(
            ["id", "categoryName", "name", "description", "_op"], COSMIC + ("upsert",)
        ))))
    from pyspark.sql.types import StructType

    schema = spark.createDataFrame([COSMIC + ("upsert",)], CHANGE_SCHEMA).schema
    q = start_change_stream(spark, str(src), schema, table, keys=["id"], checkpoint_dir=ckpt, embedder=EMB)
    q.awaitTermination(60)
    assert _socks_query(table, k=3, question=COSMIC_QUESTION)[0] == "Cosmic Socks, M"

    with open(src / "c2.json", "w") as f:
        f.write(json.dumps(dict(zip(
            ["id", "categoryName", "name", "description", "_op"], COSMIC + ("delete",)
        ))))
    q2 = start_change_stream(spark, str(src), schema, table, keys=["id"], checkpoint_dir=ckpt, embedder=EMB)
    q2.awaitTermination(60)
    assert "Cosmic Socks, M" not in _socks_query(table, k=5, question=COSMIC_QUESTION)


def test_socks_e2e_served_from_streaming_maintained_lsh_index(spark, tmp_path):
    """The golden add/remove script, but SERVED FROM THE ANN INDEX with the
    index kept fresh by the change stream — the production topology: change
    records -> foreachBatch -> LshIndex remove/add -> partition-pruned
    search sees the change at the next commit."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        start_index_change_stream,
    )

    df = spark.createDataFrame(
        SOCKS, "id string, categoryName string, name string, description string"
    )
    corpus = ingest_and_vectorize(df, embedder=EMB)
    idx = LshIndex(spark, str(tmp_path / "lsh_sock")).build(
        corpus, dims=64, bits=1, tables=4, vector_col="vector", id_col="id"
    )
    q = [float(x) for x in EMB.embed_numpy(["What kind of socks do you have?"])[0]]

    def names(k=6):
        hits = idx.search(q, k=k).select("id")
        return sorted(
            r.name for r in corpus_all().join(hits, "id", "left_semi").collect()
        )

    def corpus_all():
        extra = spark.createDataFrame(
            [COSMIC], "id string, categoryName string, name string, description string"
        )
        return df.unionByName(extra)

    before = names()
    assert "Cosmic Socks, M" not in before and len(before) >= 4

    src = tmp_path / "idx_changes"
    src.mkdir()
    rec = dict(zip(("id", "categoryName", "name", "description"), COSMIC))
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({**rec, "_op": "upsert"}) + "\n")
    start_index_change_stream(
        spark, str(src), CHANGE_SCHEMA, idx, "id",
        str(tmp_path / "ckpt_idx1"), embedder=EMB,
    ).awaitTermination(120)
    assert "Cosmic Socks, M" in names()

    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({**rec, "_op": "delete"}) + "\n")
    start_index_change_stream(
        spark, str(src), CHANGE_SCHEMA, idx, "id",
        str(tmp_path / "ckpt_idx1"), embedder=EMB,  # same checkpoint: only b2 processes
    ).awaitTermination(120)
    after = names()
    assert "Cosmic Socks, M" not in after
    assert after == before


def test_socks_keyword_index_maintained_by_changes(spark, tmp_path):
    """Keyword twin of the index-maintenance loop: the BM25 index absorbs
    the Cosmic upsert (searchable next batch) and its removal."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_keyword_index_changes,
    )

    df = spark.createDataFrame(
        SOCKS, "id string, categoryName string, name string, description string"
    )
    docs = df.select("id", F.concat_ws(" ", "name", "description").alias("text"))
    idx = Bm25Index(spark, str(tmp_path / "bm_sock")).build(
        docs, text_col="text", id_col="id", n_buckets=8
    )

    def hit_ids(terms, k=6):
        return {r.id for r in idx.search(terms, k=k).collect()}

    assert "sock-9" not in hit_ids(["cosmic", "socks"])
    rec = dict(zip(("id", "categoryName", "name", "description"), COSMIC))
    up = spark.createDataFrame([{**rec, "_op": "upsert"}])
    apply_keyword_index_changes(idx, up, "id", text_cols=("name", "description"))
    assert "sock-9" in hit_ids(["cosmic", "socks"])
    # an upsert of the SAME id replaces, never double-counts
    apply_keyword_index_changes(idx, up, "id", text_cols=("name", "description"))
    assert idx.meta()["n_docs"] == 6
    dl = spark.createDataFrame([{**rec, "_op": "delete"}])
    apply_keyword_index_changes(idx, dl, "id", text_cols=("name", "description"))
    assert "sock-9" not in hit_ids(["cosmic", "socks"])
    assert idx.meta()["n_docs"] == 5


def test_socks_e2e_served_from_streaming_maintained_ivf_index(spark, tmp_path):
    """Same change-stream loop, IVF serving index: duck-typed maintenance
    keeps the centroid partitions fresh (frozen centroids, exact upsert)."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_index_changes,
    )

    df = spark.createDataFrame(
        SOCKS, "id string, categoryName string, name string, description string"
    )
    corpus = ingest_and_vectorize(df, embedder=EMB)
    idx = IvfIndex(spark, str(tmp_path / "ivf_sock")).build(
        corpus, vector_col="vector", num_lists=2, seed=42
    )
    q = [float(x) for x in EMB.embed_numpy(["What kind of socks do you have?"])[0]]

    def ids(k=6):
        return {r.id for r in idx.search(q, k=k, n_probe=2, id_col="id").collect()}

    assert "sock-9" not in ids()
    rec = dict(zip(("id", "categoryName", "name", "description"), COSMIC))
    up = spark.createDataFrame([{**rec, "_op": "upsert"}])
    apply_index_changes(idx, up, "id", embedder=EMB)
    assert "sock-9" in ids()
    # re-upsert replaces, never duplicates
    apply_index_changes(idx, up, "id", embedder=EMB)
    import os
    stored = spark.read.parquet(os.path.join(str(tmp_path / "ivf_sock"), "data"))
    assert stored.filter(stored.id == "sock-9").count() == 1
    dl = spark.createDataFrame([{**rec, "_op": "delete"}])
    apply_index_changes(idx, dl, "id", embedder=EMB)
    assert "sock-9" not in ids()


def test_socks_e2e_streaming_maintained_ivf_pq_index(spark, tmp_path):
    """The same change-stream loop against the PQ-compressed IVF index:
    adds encode with the FROZEN codebooks, deletes COW only touched
    partitions, and the ADC-served results reflect every change — the
    float vectors never enter the index at all."""
    import os

    from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_index_changes,
    )

    df = spark.createDataFrame(
        SOCKS, "id string, categoryName string, name string, description string"
    )
    corpus = ingest_and_vectorize(df, embedder=EMB)
    idx = IvfIndex(spark, str(tmp_path / "ivf_pq_sock")).build(
        corpus, vector_col="vector", num_lists=2, seed=42,
        quantize="pq", pq_m=16, pq_bits=6, id_col="id",
    )
    stored = spark.read.parquet(os.path.join(str(tmp_path / "ivf_pq_sock"), "data"))
    assert "_pq" in stored.columns and "vector" not in stored.columns
    q = [float(x) for x in EMB.embed_numpy(["What kind of socks do you have?"])[0]]

    def ids(k=6):
        return {r.id for r in idx.search(q, k=k, n_probe=2, id_col="id").collect()}

    assert "sock-9" not in ids()
    rec = dict(zip(("id", "categoryName", "name", "description"), COSMIC))
    up = spark.createDataFrame([{**rec, "_op": "upsert"}])
    apply_index_changes(idx, up, "id", embedder=EMB)
    assert "sock-9" in ids()
    apply_index_changes(idx, up, "id", embedder=EMB)  # replace, not duplicate
    stored = spark.read.parquet(os.path.join(str(tmp_path / "ivf_pq_sock"), "data"))
    assert stored.filter(stored.id == "sock-9").count() == 1
    dl = spark.createDataFrame([{**rec, "_op": "delete"}])
    apply_index_changes(idx, dl, "id", embedder=EMB)
    assert "sock-9" not in ids()
