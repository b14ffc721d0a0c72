"""Index tablespace on the object-store data plane (round 13): IVF, LSH
and BM25 build/serve/maintain on EmulatedObjectDataPlane with results
identical to the POSIX plane, and the BM25 terms-table rotation — the
tablespace's one formerly-POSIX (rename-based) primitive — now runs as
attempt-unique-write + meta-pointer flip with crash-orphan sweep."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index
from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex
from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
    EmulatedObjectDataPlane,
)



pytestmark = pytest.mark.deep  # slow E2E lane (r16 tiering): run with -m deep

@pytest.fixture()
def plane():
    return EmulatedObjectDataPlane()


def _vectors(spark, n=60, dims=16, seed=5):
    rng = np.random.RandomState(seed)
    rows = [(i, rng.randn(dims).astype(float).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _docs(spark):
    rows = [
        (1, "fast racing socks for cyclists"),
        (2, "touring bike with comfortable saddle"),
        (3, "warm woolen socks winter edition"),
        (4, "carbon racing bike frame"),
        (5, "cotton socks plain white"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ivf_build_and_search_on_object_plane(spark, tmp_path, plane):
    df = _vectors(spark)
    q = [0.1] * 16
    local = IvfIndex(spark, str(tmp_path / "ivf_l")).build(df, num_lists=4, seed=1)
    obj = IvfIndex(spark, str(tmp_path / "ivf_o"), dataplane=plane).build(
        df, num_lists=4, seed=1
    )
    want = [(r.vec_id, round(r.score, 6)) for r in local.search(q, k=5).collect()]
    got = [(r.vec_id, round(r.score, 6)) for r in obj.search(q, k=5).collect()]
    assert got == want
    # meta + centroids round-trip through the plane's object IO
    assert obj.meta()["num_lists"] == 4
    assert obj._centroids().shape == (4, 16)
    # incremental: remove a result, add it back
    top = got[0][0]
    obj.remove_documents([top], id_col="vec_id")
    assert top not in {r.vec_id for r in obj.search(q, k=5).collect()}
    obj.add_documents(df.filter(F.col("vec_id") == top), id_col="vec_id")
    assert top in {r.vec_id for r in obj.search(q, k=5).collect()}


def test_lsh_build_and_search_on_object_plane(spark, tmp_path, plane):
    df = _vectors(spark, seed=6)
    q = [0.2] * 16
    local = LshIndex(spark, str(tmp_path / "lsh_l")).build(
        df, dims=16, bits=3, tables=2, vector_col="embedding", id_col="vec_id"
    )
    obj = LshIndex(spark, str(tmp_path / "lsh_o"), dataplane=plane).build(
        df, dims=16, bits=3, tables=2, vector_col="embedding", id_col="vec_id"
    )
    want = [r.vec_id for r in local.search(q, k=5).collect()]
    got = [r.vec_id for r in obj.search(q, k=5).collect()]
    assert got == want and obj.exists()


def test_bm25_lifecycle_on_object_plane(spark, tmp_path, plane):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm"), dataplane=plane).build(docs)
    top = idx.search(["socks"], k=3).collect()
    assert {r.doc_id for r in top} == {1, 3, 5}
    # terms table is attempt-unique + meta-pointed (no bare "terms" dir)
    meta = idx.meta()
    assert meta["terms_dir"].startswith("terms_")
    assert not os.path.exists(os.path.join(idx.path, "terms"))
    # add path rotates the pointer and sweeps the superseded table
    idx.add_documents(
        spark.createDataFrame([(6, "silk socks luxury")], "doc_id long, text string")
    )
    meta2 = idx.meta()
    assert meta2["terms_dir"] != meta["terms_dir"]
    assert not os.path.exists(os.path.join(idx.path, meta["terms_dir"]))
    assert 6 in {r.doc_id for r in idx.search(["socks"], k=6).collect()}
    # remove path: same rotation discipline
    idx.remove_documents([1])
    assert 1 not in {r.doc_id for r in idx.search(["socks"], k=6).collect()}
    # exactly one live terms table on disk after the churn
    terms_dirs = [n for n in os.listdir(idx.path) if n.startswith("terms_")]
    assert terms_dirs == [idx.meta()["terms_dir"]]


def test_bm25_swap_crash_leaves_old_table_serving(spark, tmp_path, plane):
    """Die between the new terms write and the meta put: readers keep
    resolving the OLD table (pointer never flipped); the orphan attempt
    dir is swept by the next successful swap."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm"), dataplane=plane).build(docs)
    before = idx.meta()

    boom = {"armed": False}

    def hook(op, path):
        if boom["armed"] and op == "put" and path.endswith("meta.json"):
            raise OSError("injected meta put fault")

    plane.fault_hook = hook
    boom["armed"] = True
    with pytest.raises(OSError, match="injected meta put"):
        idx.add_documents(
            spark.createDataFrame([(7, "crash socks")], "doc_id long, text string")
        )
    plane.fault_hook = None
    boom["armed"] = False
    # pointer unchanged -> old table serves; postings may carry the new
    # doc (the add is not atomic across sub-tables without the meta flip)
    assert idx.meta()["terms_dir"] == before["terms_dir"]
    orphans = [
        n for n in os.listdir(idx.path)
        if n.startswith("terms_") and n != before["terms_dir"]
    ]
    assert orphans, "crashed swap left no attempt dir (nothing to sweep)"
    # next successful mutation flips the pointer AND sweeps the orphan
    idx.remove_documents([5])
    live = idx.meta()["terms_dir"]
    assert [n for n in os.listdir(idx.path) if n.startswith("terms_")] == [live]


def test_legacy_bare_terms_dir_still_reads(spark, tmp_path):
    """A pre-r13 index layout (bare `terms` dir, meta without terms_dir)
    keeps serving: the pointer default is the legacy name."""
    import json

    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm")).build(docs)
    # rewrite the layout to the legacy shape
    meta = idx.meta()
    named = os.path.join(idx.path, meta.pop("terms_dir"))
    os.rename(named, os.path.join(idx.path, "terms"))
    with open(os.path.join(idx.path, "meta.json"), "w") as f:
        json.dump(meta, f)
    fresh = Bm25Index(spark, idx.path)
    assert {r.doc_id for r in fresh.search(["socks"], k=3).collect()} == {1, 3, 5}


@pytest.mark.deep  # slow sweep/E2E (r16 tiering)
def test_compact_on_object_plane(spark, tmp_path, plane):
    """The maintenance compactor counts and rewrites partitions through
    the plane listing."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm"), dataplane=plane).build(docs, n_buckets=2)
    for i in range(7, 16):  # appends grow per-partition file counts
        idx.add_documents(
            spark.createDataFrame([(i, f"socks variant {i}")], "doc_id long, text string")
        )
    n = idx.compact(max_files_per_partition=3)
    assert n > 0
    assert {r.doc_id for r in idx.search(["socks"], k=3).collect()} <= {1, 3, 5} | set(range(7, 16))
