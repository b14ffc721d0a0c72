"""auto_search: the §4 access-path rewrite — IVF when indexed, exact otherwise."""

import numpy as np
import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
    auto_search,
    vector_search,
)
from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report


def test_routes_to_exact_without_index(spark, tables, tmp_path):
    q = list(map(float, np.random.RandomState(2).randn(64)))
    out = auto_search(
        spark, tables["embeddings"], q, k=5,
        index_path=str(tmp_path / "missing"), vector_col="embedding", id_col="vec_id",
    )
    rep = plan_report(out)
    assert rep.take_ordered and "PartitionFilters" not in rep.raw


def test_routes_to_pruned_index_when_present(spark, tables, tmp_path):
    IvfIndex(spark, str(tmp_path)).build(
        tables["embeddings"], vector_col="embedding", num_lists=4, seed=42
    )
    q = list(map(float, np.random.RandomState(2).randn(64)))
    out = auto_search(
        spark, tables["embeddings"], q, k=5,
        index_path=str(tmp_path), vector_col="embedding", id_col="vec_id", n_probe=1,
    )
    raw = plan_report(out).raw
    assert "PartitionFilters" in raw and "centroid_id" in raw


def test_full_probe_route_equals_exact(spark, tables, tmp_path):
    IvfIndex(spark, str(tmp_path)).build(
        tables["embeddings"], vector_col="embedding", num_lists=4, seed=42
    )
    q = list(map(float, np.random.RandomState(4).randn(64)))
    routed = auto_search(
        spark, tables["embeddings"], q, k=10,
        index_path=str(tmp_path), vector_col="embedding", id_col="vec_id", n_probe=4,
    )
    exact = vector_search(tables["embeddings"], q, k=10, vector_col="embedding", id_col="vec_id")
    assert [r.vec_id for r in routed.collect()] == [r.vec_id for r in exact.collect()]


def test_routes_to_lsh_index_when_present(spark, tables, tmp_path):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex

    LshIndex(spark, str(tmp_path)).build(
        tables["embeddings"], dims=64, bits=4, tables=4,
        vector_col="embedding", id_col="vec_id",
    )
    q = list(map(float, np.random.RandomState(5).randn(64)))
    out = auto_search(
        spark, tables["embeddings"], q, k=5,
        index_path=str(tmp_path), vector_col="embedding", id_col="vec_id",
    )
    rep = plan_report(out)
    assert "PartitionFilters" in rep.raw and "bucket" in rep.raw
    assert out.count() == 5


def test_routes_to_hnsw_index_when_present(spark, tables, tmp_path):
    """An HNSW dir (meta kind == 'vector-hnsw') routes to the segment-beam
    serve, bit-equal to PartitionedHnswIndex.search — and never through
    the IVF reader (r14: IvfIndex was the catch-all before)."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.hnsw import (
        PartitionedHnswIndex,
    )

    idx = PartitionedHnswIndex(spark, str(tmp_path)).build(
        tables["embeddings"], vector_col="embedding", id_col="vec_id", shards=4
    )
    q = list(map(float, np.random.RandomState(6).randn(64)))
    out = auto_search(
        spark, tables["embeddings"], q, k=5,
        index_path=str(tmp_path), vector_col="embedding", id_col="vec_id",
    )
    raw = plan_report(out).raw
    assert "MapInPandas" in raw and "PartitionFilters" not in raw
    got = [(r["vec_id"], r["score"]) for r in out.collect()]
    want = [(r["vec_id"], r["score"]) for r in idx.search(q, k=5).collect()]
    assert got == want


def test_unknown_index_layout_raises(spark, tables, tmp_path):
    """A dir with a meta.json matching no index layout must raise, not
    guess an access path."""
    import json

    (tmp_path / "meta.json").write_text(json.dumps({"something": "else"}))
    q = list(map(float, np.random.RandomState(7).randn(64)))
    with pytest.raises(ValueError, match="no known index layout"):
        auto_search(
            spark, tables["embeddings"], q, k=5,
            index_path=str(tmp_path), vector_col="embedding", id_col="vec_id",
        )
