"""Per-partition ANN: the distributed form of a local graph index (V3).

Reference: the HNSW index kind (`vector-hnsw`, m=16, efConstruction=64,
/root/reference/SharedLib/Services/MongoDbService.cs:119-143). HNSW has no
distributed primitive, so the Spark-native construction is the classic
local-index/global-merge: each PARTITION builds (or would load) a local
index over its vectors and answers the query locally with a k-row heap;
the driver-side merge is the same TakeOrderedAndProject top-k that exact
search uses — P×k candidate rows total, never the full table.

The local index is an injectable `index_factory(vectors) -> searcher`:

  * default: exact numpy matmul — hermetic, makes the whole operator EXACT
    (so it carries a DuckDB oracle in the harness), and is the honest
    batch-scale answer (scan dominates; see operators/ivf.py rationale).
  * `hnsw_index_factory(m=16, ef_construction=64)` — the reference's HNSW
    parameters. Uses hnswlib when installed, else the pure-numpy graph
    kernel in `operators/hnsw.py` (same algorithm, always runnable).
    On a real cluster the factory would memoize per-executor, or load a
    prebuilt per-partition index file instead of rebuilding per query.

Memory: a task materializes ONE partition's vectors (bounded by
spark.sql.files.maxPartitionBytes); the output is k rows per partition.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _ExactSearcher:
    """Default local 'index': brute-force cosine via one matmul."""

    def __init__(self, vectors: np.ndarray):
        m = vectors.astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        self._m = m / norms

    def search(self, q: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        qn = q / (np.linalg.norm(q) or 1.0)
        scores = self._m @ qn
        k = min(k, len(scores))
        idx = np.argpartition(-scores, k - 1)[:k] if k < len(scores) else np.arange(len(scores))
        return idx, scores[idx]


def exact_index_factory(vectors: np.ndarray) -> _ExactSearcher:
    return _ExactSearcher(vectors)


def hnsw_index_factory(
    m: int = 16, ef_construction: int = 64, ef_search: int = 64, fallback: bool = True
):
    """Reference HNSW parameters (MongoDbService.cs:133-136). Uses the
    native hnswlib kernel when installed; otherwise (fallback=True, the
    default) builds the same graph algorithm with the pure-numpy kernel
    in `operators/hnsw.py` — same parameters, same cosine space — so the
    HNSW path executes in every environment. Pass fallback=False to
    require the native kernel (raises NotImplementedError without it)."""

    def factory(vectors: np.ndarray):
        try:
            import hnswlib  # noqa: F401
        except ImportError as e:
            if fallback:
                from .hnsw import NumpyHNSW

                return NumpyHNSW(
                    vectors, m=m, ef_construction=ef_construction, ef_search=ef_search
                )
            raise NotImplementedError(
                "hnswlib is not installed in this environment; use "
                "fallback=True (pure-numpy HNSW), the default "
                "exact_index_factory, or install hnswlib on the cluster."
            ) from e
        dim = vectors.shape[1]
        index = hnswlib.Index(space="cosine", dim=dim)
        index.init_index(max_elements=len(vectors), M=m, ef_construction=ef_construction)
        index.add_items(vectors)
        index.set_ef(ef_search)

        class _H:
            def search(self, q, k):
                labels, dists = index.knn_query(q, k=min(k, len(vectors)))
                return labels[0], 1.0 - dists[0]  # cosine distance -> similarity

        return _H()

    return factory


def partitioned_ann_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    index_factory: Callable[[np.ndarray], object] | None = None,
    round_scores: int | None = None,
) -> DataFrame:
    """Local top-k per partition (mapInPandas, one index per partition) ->
    global TakeOrderedAndProject merge of the P×k candidates."""
    factory = index_factory or exact_index_factory
    q = np.asarray(list(query), dtype=np.float64)
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("score", T.DoubleType())]
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list = []
        chunks: list[np.ndarray] = []
        for pdf in batches:
            ids.extend(pdf[id_col].tolist())
            chunks.append(np.vstack(pdf[vector_col].to_numpy()))
        if not ids:
            return
        searcher = factory(np.vstack(chunks))
        idx, scores = searcher.search(q, k)
        yield pd.DataFrame(
            {id_col: [ids[i] for i in idx], "score": np.asarray(scores, dtype=np.float64)}
        )

    local = df.select(id_col, vector_col).mapInPandas(local_topk, out_schema)
    if round_scores is not None:
        local = local.withColumn("score", F.round("score", round_scores))
    return local.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
