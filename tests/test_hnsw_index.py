"""PartitionedHnswIndex (operators/hnsw.py): the reference's
`vector-hnsw` index kind as a materialized, build-once segment index —
per-partition graphs in one-row-per-segment parquet, S×k TakeOrdered
merge, append-only delta segments + per-segment tombstones + compaction,
and the same near-real-time maintenance surface IVF/LSH expose
(streaming.incremental.apply_index_changes drives it unchanged)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.hnsw import (
    NumpyHNSW,
    PartitionedHnswIndex,
    _cached_segment,
)


def _bruteforce_topk(rows, q, k=10):
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    qn = np.asarray(q) / max(np.linalg.norm(q), 1e-12)
    return set(ids[np.argsort(-(Vn @ qn))[:k]].tolist())


def test_graph_bytes_roundtrip_is_search_identical():
    rng = np.random.default_rng(1)
    V = rng.normal(size=(300, 16))
    k1 = NumpyHNSW(V, seed=3)
    k2 = NumpyHNSW.from_bytes(k1.to_bytes())
    for _ in range(5):
        q = rng.normal(size=16)
        a, b = k1.search(q, 10), k2.search(q, 10)
        assert np.array_equal(a[0], b[0])
        # vectors persist float32: scores match to that precision
        assert np.allclose(a[1], b[1], atol=1e-6)


def test_build_and_search_matches_bruteforce(spark, tables, tmp_path):
    emb = tables["embeddings"]
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(emb, shards=4)
    rows = emb.collect()
    rng = np.random.default_rng(7)
    for _ in range(3):
        q = [float(x) for x in rng.normal(size=64)]
        exact = _bruteforce_topk(rows, q, 10)
        got = idx.search(q, k=10).collect()
        assert len(got) == 10
        assert len({r.vec_id for r in got} & exact) >= 8
        # best-first, exact cosine scores on the survivors
        scores = [r.score for r in got]
        assert scores == sorted(scores, reverse=True)


def test_k_exceeding_corpus_and_ef_override(spark, tmp_path):
    rng = np.random.default_rng(2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=2)
    got = idx.search([1.0] * 8, k=50).collect()
    assert len(got) == 10 and len({r.vec_id for r in got}) == 10
    # a larger query-time beam can only improve recall (>= result overlap)
    small = {r.vec_id for r in idx.search([1.0] * 8, k=5, ef_search=5).collect()}
    large = {r.vec_id for r in idx.search([1.0] * 8, k=5, ef_search=200).collect()}
    assert len(large) == 5 and len(small) <= 5


def test_build_if_absent_skips_fresh_and_rebuilds_stale(spark, tables, tmp_path):
    emb = tables["embeddings"]
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(emb, shards=2)
    gen0 = idx.meta()["generations"]
    idx.build_if_absent(emb)  # same source files: fingerprint match, no rebuild
    assert idx.meta()["generations"] == gen0
    other = emb.limit(7).localCheckpoint(eager=True)  # different source
    idx.build_if_absent(other, shards=2)
    assert idx.meta()["generations"] != gen0


def test_add_documents_duplicate_modes_and_delta_segment(spark, tmp_path):
    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=2)
    gens0 = list(idx.meta()["generations"])
    vec = [1.0] * 8

    with pytest.raises(ValueError, match="already indexed"):
        idx.add_documents(
            spark.createDataFrame([(3, vec)], "vec_id long, embedding array<float>"),
            id_col="vec_id",
        )
    # skip: all-duplicate batch is a no-op (no new generation)
    idx.add_documents(
        spark.createDataFrame([(3, vec)], "vec_id long, embedding array<float>"),
        id_col="vec_id",
        on_duplicate="skip",
    )
    assert idx.meta()["generations"] == gens0
    # a fresh id lands in ONE new delta segment, immediately searchable
    idx.add_documents(
        spark.createDataFrame([(777, vec)], "vec_id long, embedding array<float>"),
        id_col="vec_id",
    )
    m = idx.meta()
    assert len(m["generations"]) == len(gens0) + 1
    assert idx.search(vec, k=1).first().vec_id == 777


def test_tombstone_remove_and_upsert_readd(spark, tmp_path):
    rng = np.random.default_rng(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(15)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=2)
    vec = [1.0] * 8
    idx.add_documents(
        spark.createDataFrame([(500, vec)], "vec_id long, embedding array<float>"),
        id_col="vec_id",
    )
    idx.remove_documents([500], id_col="vec_id")
    assert 500 not in {r.vec_id for r in idx.search(vec, k=10).collect()}
    # removing an id the index does not hold is a pure no-op: the
    # streaming upsert flow (remove-then-add of new ids) must not grow
    # tombstones
    deleted_before = idx.meta()["deleted"]
    idx.remove_documents([99999999], id_col="vec_id")
    assert idx.meta()["deleted"] == deleted_before
    # re-add after remove (the upsert flow): a tombstoned id is NOT
    # "already indexed" — the default duplicate guard lets it back in,
    # and it serves exactly once (old copy stays tombstoned)
    idx.add_documents(
        spark.createDataFrame([(500, vec)], "vec_id long, embedding array<float>"),
        id_col="vec_id",
    )
    hits = [r.vec_id for r in idx.search(vec, k=10).collect()]
    assert hits.count(500) == 1 and hits[0] == 500


def test_compact_folds_segments_and_sweeps(spark, tmp_path):
    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=3)
    vec = [0.5] * 8
    for j in (100, 101):
        idx.add_documents(
            spark.createDataFrame(
                [(j, [float(x) for x in rng.normal(size=8)])],
                "vec_id long, embedding array<float>",
            ),
            id_col="vec_id",
        )
    idx.remove_documents([100], id_col="vec_id")
    before = {r.vec_id for r in idx.search(vec, k=10).collect()}
    old_gens = set(idx.meta()["generations"])
    assert len(old_gens) == 3  # base + two deltas

    idx.compact()
    m = idx.meta()
    assert len(m["generations"]) == 1 and m["deleted"] == {}
    assert set(m["generations"]) & old_gens == set()
    after = {r.vec_id for r in idx.search(vec, k=10).collect()}
    assert after == before
    assert 100 not in after and 101 in {
        r.vec_id for r in idx.search(vec, k=40).collect()
    }
    # superseded generation dirs were swept
    import os

    left = set(os.listdir(os.path.join(str(tmp_path / "h"), "segments")))
    assert left == set(m["generations"])


def test_crash_orphan_generation_swept_on_next_flip(spark, tmp_path):
    """A dead writer's generation dir (written, never referenced by a
    meta flip) is debris the next successful build sweeps."""
    import os

    rng = np.random.default_rng(6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=2)
    orphan = os.path.join(str(tmp_path / "h"), "segments", "gen_deadbeefdead")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-orphan.parquet"), "wb") as f:
        f.write(b"debris from a writer that died before the meta flip")
    assert idx.search([1.0] * 8, k=3).count() == 3  # serving unaffected
    idx.build(df, shards=2)  # next successful flip sweeps
    assert not os.path.exists(orphan)


def test_ef_search_override_never_mutates_the_kernel():
    """The per-call ef_search must not leak into later searches on the
    same (worker-cached) kernel instance — the exact regression the
    r14 review fixed: a one-off low-ef query permanently degrading
    recall for every later default query on that executor."""
    rng = np.random.default_rng(11)
    kernel = NumpyHNSW(rng.normal(size=(400, 16)), ef_search=64)
    q = rng.normal(size=16)
    before = kernel.search(q, 10)
    kernel.search(q, 10, ef_search=1)  # degraded one-off
    after = kernel.search(q, 10)  # default beam again
    assert kernel.ef_search == 64
    assert np.array_equal(before[0], after[0])
    assert np.allclose(before[1], after[1])


def test_pre_v2_layout_is_rejected_with_a_clear_error(spark, tmp_path):
    """Data-touching paths on an older on-disk layout must name the fix
    (rebuild), not die deep in a plan with an unresolved-column error;
    build_if_absent rebuilds it automatically."""
    import json
    import os

    rng = np.random.default_rng(12)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=1)
    meta_path = os.path.join(str(tmp_path / "h"), "meta.json")
    meta = json.loads(open(meta_path).read())
    meta.pop("layout")  # simulate a pre-v2 index
    open(meta_path, "w").write(json.dumps(meta))
    with pytest.raises(ValueError, match="rebuild"):
        idx.search([1.0] * 8, k=3)
    with pytest.raises(ValueError, match="rebuild"):
        idx.remove_documents([1], id_col="vec_id")
    idx.build_if_absent(df)  # detects the stale layout and rebuilds
    assert idx.meta()["layout"] == 2
    assert idx.search([1.0] * 8, k=3).count() == 3


def test_duplicate_build_rows_with_tombstone_still_serve_full_k(spark, tmp_path):
    """Over-fetch counts dead ROWS, not distinct tombstoned ids: a
    duplicated id whose tombstone covers several graph rows must not
    crowd live candidates out of the per-segment shortlist."""
    rng = np.random.default_rng(13)
    target = [1.0] * 8
    rows = [(7, target), (7, target), (7, target)]  # duplicated id, best match
    rows += [(i, [float(x) for x in rng.normal(size=8)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=1)
    idx.remove_documents([7], id_col="vec_id")
    got = idx.search(target, k=3).collect()
    assert len(got) == 3  # all three dead rows over-fetched past
    assert 7 not in {r.vec_id for r in got}


def test_segment_cache_returns_same_object():
    rng = np.random.default_rng(8)
    payload = NumpyHNSW(rng.normal(size=(20, 8))).to_bytes()
    a = _cached_segment("seg-test-cache", payload)
    b = _cached_segment("seg-test-cache", payload)
    assert a is b  # deserialized once, served from the worker cache


def test_compact_rejects_positional_file_knob(spark, tmp_path):
    """shards is keyword-only: a duck-typed caller passing IvfIndex's
    positional max_files_per_partition must fail loudly, never silently
    re-shard the index (the streaming sink duck-types the signature)."""
    rng = np.random.default_rng(10)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=2)
    with pytest.raises(TypeError):
        idx.compact(8)


def test_socks_e2e_served_from_streaming_maintained_hnsw_index(spark, tmp_path):
    """The golden Cosmic-Socks loop (reference README.md:184-194) with
    the HNSW index as the serving side: apply_index_changes duck-types
    onto the same meta()/remove/add surface as IVF/LSH, upserts become
    delta segments, deletes tombstones — searchable next call."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import (
        HashNgramEmbedder,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.sources.ingest import (
        ingest_and_vectorize,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_index_changes,
    )

    EMB = HashNgramEmbedder(dims=64)
    SOCKS = [
        ("sock-1", "socks", "Racing Socks, S", "Lightweight racing socks in small"),
        ("sock-2", "socks", "Racing Socks, M", "Lightweight racing socks in medium"),
        ("sock-3", "socks", "Mountain Socks, S", "Thick mountain bike socks in small"),
        ("sock-4", "socks", "Mountain Socks, M", "Thick mountain bike socks in medium"),
        ("helm-1", "helmets", "Sport Helmet", "A sturdy sport helmet"),
    ]
    COSMIC = ("sock-9", "socks", "Cosmic Socks, M",
              "Limited edition cosmic print socks in medium")
    df = spark.createDataFrame(
        SOCKS, "id string, categoryName string, name string, description string"
    )
    corpus = ingest_and_vectorize(df, embedder=EMB)
    idx = PartitionedHnswIndex(spark, str(tmp_path / "hnsw_sock")).build(
        corpus, vector_col="vector", id_col="id", shards=2
    )
    q = [float(x) for x in EMB.embed_numpy(["What kind of socks do you have?"])[0]]

    def ids(k=6):
        return {r.id for r in idx.search(q, k=k).collect()}

    assert "sock-9" not in ids()
    rec = dict(zip(("id", "categoryName", "name", "description"), COSMIC))
    up = spark.createDataFrame([{**rec, "_op": "upsert"}])
    apply_index_changes(idx, up, "id", embedder=EMB)
    assert "sock-9" in ids()
    # re-upsert replaces, never duplicates (old copy tombstoned)
    apply_index_changes(idx, up, "id", embedder=EMB)
    hits = [r.id for r in idx.search(q, k=6).collect()]
    assert hits.count("sock-9") == 1
    dl = spark.createDataFrame([{**rec, "_op": "delete"}])
    apply_index_changes(idx, dl, "id", embedder=EMB)
    assert "sock-9" not in ids()


def test_full_lifecycle_on_object_store_universe(spark, tmp_path, monkeypatch):
    """build/search/add/remove/compact with the metadata plane on
    EmulatedObjectDataPlane — per-object copy+delete, no rename — the
    storage universe the r13 index plane runs on."""
    from vector_search_ai_assistant_mongodbvcore_spark.sources import (
        managed_table as mt,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
        EmulatedObjectDataPlane,
    )

    monkeypatch.setattr(mt, "_DEFAULT_DATAPLANE", EmulatedObjectDataPlane())
    rng = np.random.default_rng(9)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    idx = PartitionedHnswIndex(spark, str(tmp_path / "h")).build(df, shards=2)
    vec = [1.0] * 8
    assert idx.search(vec, k=3).count() == 3
    idx.add_documents(
        spark.createDataFrame([(77, vec)], "vec_id long, embedding array<float>"),
        id_col="vec_id",
    )
    assert idx.search(vec, k=1).first().vec_id == 77
    idx.remove_documents([77], id_col="vec_id")
    assert 77 not in {r.vec_id for r in idx.search(vec, k=12).collect()}
    idx.compact()
    assert 77 not in {r.vec_id for r in idx.search(vec, k=12).collect()}
    assert idx.search(vec, k=3).count() == 3
