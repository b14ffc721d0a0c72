"""IVF vector index: KMeans-partitioned store + centroid-pruned search.

Reference: the `vector-ivf` index kind, numLists=2, cosine
(/root/reference/SharedLib/Services/MongoDbService.cs:144-167); search probes
the index via $search.cosmosSearch (:194-223).

Spark-first construction (SURVEY.md §4): there is no ANN server; instead the
*table layout* is the index.

  build:  MLlib KMeans(k=num_lists) on (unit-normalized) vectors
          -> write parquet PARTITIONED BY centroid_id
  search: assign query to its nProbe nearest centroids (driver-side numpy on
          the tiny centroid set) -> read with centroid_id IN (...) —
          Catalyst partition pruning makes the scan touch nProbe/num_lists
          of the files — -> exact top-k inside the probed subset.

At 100 TB with num_lists ~ sqrt(N) this is the classic IVF-flat tradeoff;
recall vs exact is tested in tests/test_ivf.py (nProbe = num_lists ==> exact
equality with brute force).

HNSW (MongoDbService.cs:119-143) is intentionally NOT built: no distributed
primitive exists, and batch-scale retrieval is dominated by scan+prune
(SURVEY.md §7 hard part 1). A per-partition hnswlib index via mapPartitions
is the documented extension point if per-query latency ever matters more
than throughput.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
    vector_search,
)

DEFAULT_NUM_LISTS = 2  # MongoDbService.cs:158 numLists


class IvfIndex:
    """IVF-flat index materialized as centroid-partitioned parquet."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ---- build -----------------------------------------------------------
    def build(
        self,
        df: DataFrame,
        vector_col: str = "embedding",
        num_lists: int = DEFAULT_NUM_LISTS,
        seed: int = 42,
        max_iter: int = 20,
    ) -> "IvfIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # cosine <=> euclidean KMeans on unit-normalized vectors
        norm = F.sqrt(F.aggregate(F.col(vector_col).cast("array<double>"), F.lit(0.0), lambda a, x: a + x * x))
        normed = df.withColumn(
            "_nv",
            F.when(norm == 0.0, F.col(vector_col).cast("array<double>")).otherwise(
                F.transform(F.col(vector_col).cast("array<double>"), lambda x: x / norm)
            ),
        ).withColumn("_features", array_to_vector(F.col("_nv")))
        km = KMeans(k=num_lists, seed=seed, maxIter=max_iter, featuresCol="_features", predictionCol="centroid_id")
        model = km.fit(normed)
        assigned = model.transform(normed).drop("_features", "_nv")
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
            os.path.join(self.path, "data")
        )
        centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
        np.save(os.path.join(self.path, "centroids.npy"), centroids)
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump({"num_lists": num_lists, "vector_col": vector_col, "seed": seed}, f)
        return self

    # ---- search ----------------------------------------------------------
    def _centroids(self) -> np.ndarray:
        return np.load(os.path.join(self.path, "centroids.npy"))

    def meta(self) -> dict:
        with open(os.path.join(self.path, "meta.json")) as f:
            return json.load(f)

    def nearest_centroids(self, query: list[float], n_probe: int) -> list[int]:
        c = self._centroids()
        q = np.asarray(query, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        sims = cn @ qn
        return [int(i) for i in np.argsort(-sims)[:n_probe]]

    def search(
        self,
        query: list[float],
        k: int = 10,
        n_probe: int = 1,
        use_pandas: bool = True,
    ) -> DataFrame:
        """Centroid-pruned exact top-k. The IN-filter on the partition column
        prunes at file-listing time (check explain(): PartitionFilters)."""
        meta = self.meta()
        probes = self.nearest_centroids(query, n_probe)
        scan = self.spark.read.parquet(os.path.join(self.path, "data")).filter(
            F.col("centroid_id").isin(probes)
        )
        return vector_search(
            scan, query, k=k, vector_col=meta["vector_col"], use_pandas=use_pandas
        ).drop("centroid_id")
