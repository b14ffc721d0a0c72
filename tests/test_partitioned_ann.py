"""V3: per-partition local-index ANN with global top-k merge."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.partitioned_ann import (
    exact_index_factory,
    hnsw_index_factory,
    partitioned_ann_topk,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import vector_search
from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report


def test_exact_kernel_matches_global_search(spark, tables):
    for seed in (4, 5):
        q = list(map(float, np.random.RandomState(seed).randn(64)))
        got = [
            r.vec_id
            for r in partitioned_ann_topk(
                tables["embeddings"].repartition(7), q, k=10
            ).collect()
        ]
        expect = [
            r.vec_id
            for r in vector_search(
                tables["embeddings"], q, k=10, vector_col="embedding", id_col="vec_id"
            ).collect()
        ]
        assert got == expect


def test_injected_factory_is_used_per_partition(spark):
    rows = [(i, np.random.RandomState(i).randn(8).tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(4)

    class Spy:
        def __init__(self, vectors):
            self.inner = exact_index_factory(vectors)
            assert vectors.ndim == 2 and vectors.shape[1] == 8

        def search(self, q, k):
            return self.inner.search(q, k)

    out = partitioned_ann_topk(df, [0.1] * 8, k=3, index_factory=Spy)
    assert out.count() == 3


def test_global_merge_is_take_ordered(spark, tables):
    rep = plan_report(partitioned_ann_topk(tables["embeddings"], [0.2] * 64, k=5))
    assert rep.take_ordered and rep.global_sorts == 0


def test_hnsw_factory_serves_via_numpy_graph_and_strict_mode_raises(spark, tables):
    # default: the numpy HNSW kernel serves real results on the testdata
    out = partitioned_ann_topk(
        tables["embeddings"], [0.1] * 64, k=5, index_factory=hnsw_index_factory()
    )
    assert out.count() == 5
    # strict native-only mode stays an honest env-gated seam
    strict = partitioned_ann_topk(
        tables["embeddings"], [0.1] * 64, k=5, index_factory=hnsw_index_factory(fallback=False)
    )
    try:
        import hnswlib  # noqa: F401
    except ImportError:
        with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
            strict.collect()


def test_k_exceeding_partition_sizes(spark):
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(4)
    out = partitioned_ann_topk(df, [1.0, 1.0], k=20)
    assert out.count() == 6  # k > N handled per partition and globally
