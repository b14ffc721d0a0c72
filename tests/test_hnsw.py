"""Pure-numpy HNSW graph kernel (operators/hnsw.py) — the always-runnable
twin of the env-gated hnswlib kernel, at the reference's parameters
(m=16, efConstruction=64; SharedLib/Services/MongoDbService.cs:119-143).

Covers: graph-search recall vs exact cosine, score exactness for returned
ids, build determinism, edge cases (k > n, duplicates, zero vectors,
single element), and the full Spark path through partitioned_ann_topk
(the same plumbing the hnswlib test in test_real_kernels.py exercises
when the native extra is installed)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.hnsw import (
    NumpyHNSW,
    numpy_hnsw_index_factory,
)


def _exact_topk(V: np.ndarray, q: np.ndarray, k: int) -> set[int]:
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    qn = q / max(np.linalg.norm(q), 1e-12)
    return set(np.argsort(-(Vn @ qn))[:k].tolist())


def test_recall_at_10_vs_exact_cosine():
    rng = np.random.default_rng(0)
    V = rng.normal(size=(1500, 64))
    idx = NumpyHNSW(V, m=16, ef_construction=64, ef_search=64, seed=42)
    recalls = []
    for _ in range(60):
        q = rng.normal(size=64)
        got, _ = idx.search(q, 10)
        recalls.append(len(set(got.tolist()) & _exact_topk(V, q, 10)) / 10)
    # hnswlib at the same parameters lands ~0.95+ on this workload; the
    # graph kernel must be a real ANN structure, not a lucky scan
    assert float(np.mean(recalls)) >= 0.9


def test_returned_scores_are_exact_cosine_similarities():
    rng = np.random.default_rng(1)
    V = rng.normal(size=(300, 32))
    idx = NumpyHNSW(V)
    q = rng.normal(size=32)
    got, sims = idx.search(q, 8)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    assert np.allclose(sims, Vn[got] @ qn)
    # best-first ordering
    assert list(sims) == sorted(sims, reverse=True)


def test_build_is_deterministic_for_same_seed():
    rng = np.random.default_rng(2)
    V = rng.normal(size=(400, 16))
    q = rng.normal(size=16)
    a = NumpyHNSW(V, seed=7).search(q, 10)
    b = NumpyHNSW(V, seed=7).search(q, 10)
    assert np.array_equal(a[0], b[0]) and np.allclose(a[1], b[1])


def test_edge_cases():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(3, 8))
    q = rng.normal(size=8)
    idx, sims = NumpyHNSW(V).search(q, 10)  # k > n
    assert len(idx) == 3 and len(set(idx.tolist())) == 3

    dup = NumpyHNSW(np.tile(V[0], (20, 1)))  # all-duplicate corpus
    di, ds = dup.search(V[0], 5)
    assert len(di) == 5 and np.allclose(ds, 1.0)

    zi, zs = NumpyHNSW(np.zeros((5, 8))).search(np.zeros(8), 3)  # zero vectors
    assert len(zi) == 3 and np.all(np.isfinite(zs))

    one_i, one_s = NumpyHNSW(V[:1]).search(q, 4)  # single element
    assert len(one_i) == 1

    empty_i, empty_s = NumpyHNSW(np.empty((0, 8))).search(q, 4)  # empty corpus
    assert len(empty_i) == 0 and len(empty_s) == 0


def test_graph_degrees_respect_m_caps():
    rng = np.random.default_rng(4)
    idx = NumpyHNSW(rng.normal(size=(600, 24)), m=8, ef_construction=48)
    for links in idx._links:
        for layer, neigh in enumerate(links):
            cap = 16 if layer == 0 else 8  # Mmax0 = 2m, Mmax = m
            assert len(neigh) <= cap
            assert len(set(neigh)) == len(neigh)  # no duplicate edges


def test_invalid_inputs_raise():
    with pytest.raises(ValueError):
        NumpyHNSW(np.zeros((4, 4)), m=1)
    with pytest.raises(ValueError):
        NumpyHNSW(np.zeros(16))  # 1-D input


def test_numpy_hnsw_through_partitioned_ann_spark(spark):
    """The numpy-kernel twin of test_real_kernels.py's hnswlib test —
    runs in EVERY environment: real graph build per partition inside
    mapInPandas, P×k candidate merge, >= 8/10 overlap with exact."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.partitioned_ann import (
        partitioned_ann_topk,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)
    q = [float(x) for x in rng.normal(size=16)]
    got = partitioned_ann_topk(
        df, q, k=10, index_factory=numpy_hnsw_index_factory(m=16, ef_construction=64)
    )
    ids = [r["vec_id"] for r in got.collect()]
    assert len(ids) == 10 and len(set(ids)) == 10
    exact = partitioned_ann_topk(df, q, k=10)
    exact_ids = {r["vec_id"] for r in exact.collect()}
    assert len(set(ids) & exact_ids) >= 8


def test_hnsw_index_factory_falls_back_to_numpy_kernel_without_hnswlib():
    """hnsw_index_factory (partitioned_ann.py) now executes everywhere:
    hnswlib when installed, the numpy graph otherwise; fallback=False
    restores the strict native-only behavior."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.partitioned_ann import (
        hnsw_index_factory,
    )

    rng = np.random.default_rng(6)
    V = rng.normal(size=(100, 16))
    searcher = hnsw_index_factory(m=16, ef_construction=64)(V)
    idx, sims = searcher.search(rng.normal(size=16), 5)
    assert len(idx) == 5

    try:
        import hnswlib  # noqa: F401

        pytest.skip("hnswlib installed: strict mode cannot raise here")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        hnsw_index_factory(fallback=False)(V)
