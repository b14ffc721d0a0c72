"""Similarity search & join over embedding columns.

Extended surface (BASELINE.json north star): approximate-nearest-neighbor
over `array<float>` embeddings.

  knn_brute_force       exact top-k per query (baseline; TakeOrdered per query)
  cosine_pairs_exact    all pairs with cosine >= threshold (self-join; the
                        sf-scale oracle path)
  lsh_ann / lsh_pairs   random-hyperplane LSH bucketed variants (scale path)
  embedding_neardup     near-duplicate rows by embedding cosine

Scale notes: brute force is a full scan per query batch — fine when queries
are batched (Q vectors broadcast in one pass: cost O(N·Q·D) FLOPS via one
numpy matmul per Arrow batch, embarrassingly parallel). The LSH variants cut
candidate sets by 2^bits buckets; recall is tunable with `tables` (OR of
several hash tables), the standard random-hyperplane construction (Charikar).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import (
    cosine_similarity,
)


def knn_brute_force(
    df: DataFrame,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k for a BATCH of query vectors in one scan.

    One Arrow-batched pandas UDF computes scores for all queries per batch
    (single numpy matmul), then a per-query window takes the top k. Output:
    (query_id, id, score) — one shuffle on query_id (Q is small)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType
    from pyspark.sql import Window

    Q = np.asarray(queries, dtype=np.float64)  # (q, d)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    @pandas_udf(ArrayType(DoubleType()))
    def all_scores(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            m = np.vstack(s.to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            sims = (m / norms) @ Qn.T  # (rows, q)
            yield pd.Series(list(sims))

    scored = df.select(F.col(id_col), all_scores(F.col(vector_col)).alias("_scores"))
    exploded = scored.select(
        id_col, F.posexplode(F.col("_scores")).alias("query_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", F.col(id_col), "score")
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = True,
) -> DataFrame:
    """All (a, b) pairs with cosine >= threshold — exact, via self-join.

    At large N this is the quadratic baseline the LSH path exists to avoid;
    it remains the correctness oracle and is fine for dimension tables and
    per-bucket verification. The join is a broadcast-nested-loop; Spark
    broadcasts the smaller (projected) side."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("_vb"))
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    if use_pandas:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType

        @pandas_udf(DoubleType())
        def pair_cos(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
            for va, vb in it:
                ma = np.vstack(va.to_numpy()).astype(np.float64)
                mb = np.vstack(vb.to_numpy()).astype(np.float64)
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                na[na == 0] = 1.0
                nb[nb == 0] = 1.0
                yield pd.Series((ma * mb).sum(axis=1) / (na * nb))

        scored = joined.withColumn("cosine", pair_cos(F.col("_va"), F.col("_vb")))
    else:
        scored = joined.withColumn(
            "cosine",
            cosine_similarity(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")),
        )
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def _hyperplanes(dims: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(tables, bits, dims)


def lsh_bucket_ids(
    df: DataFrame,
    dims: int,
    bits: int = 12,
    tables: int = 2,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (sign) LSH: (id, table, bucket). bucket = the
    `bits`-bit sign pattern of projections onto fixed Gaussian hyperplanes."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    H = _hyperplanes(dims, bits, tables, seed)  # (t, b, d)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            m = np.vstack(s.to_numpy()).astype(np.float64)  # (n, d)
            out = []
            signs = np.einsum("nd,tbd->ntb", m, H) > 0  # (n, t, b)
            codes = signs @ weights  # (n, t)
            out = list(codes)
            yield pd.Series(out)

    coded = df.select(F.col(id_col), buckets(F.col(vector_col)).alias("_codes"))
    return coded.select(id_col, F.posexplode("_codes").alias("table", "bucket"))


def lsh_ann(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    bits: int = 12,
    tables: int = 2,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows sharing an LSH bucket with the
    query in ANY table — the candidate scan is 1/2^bits of the data per
    table. This is the 100 TB serving path; recall grows with `tables`."""
    dims = len(query)
    H = _hyperplanes(dims, bits, tables, seed)
    q = np.asarray(query, dtype=np.float64)
    weights = (1 << np.arange(bits)).astype(np.int64)
    q_codes = [int(((H[t] @ q) > 0) @ weights) for t in range(tables)]

    bucketed = lsh_bucket_ids(df, dims, bits, tables, vector_col, id_col, seed)
    cond = F.lit(False)
    for t, c in enumerate(q_codes):
        cond = cond | ((F.col("table") == t) & (F.col("bucket") == c))
    candidates = bucketed.filter(cond).select(id_col).distinct()
    pruned = df.join(candidates, id_col, "inner")  # shuffle-less if broadcast
    from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import vector_search

    return vector_search(pruned, list(query), k=k, vector_col=vector_col, use_pandas=True)


def embedding_neardup(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 4,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine.

    exact=True  -> quadratic exact join (oracle / small tables)
    exact=False -> LSH-blocked: only pairs sharing a bucket are verified
                   with exact cosine; misses pairs LSH never co-buckets
                   (recall < 1, tunable via tables/bits)."""
    if exact:
        return cosine_pairs_exact(df, threshold, vector_col, id_col)
    dims = len(df.select(vector_col).first()[0])
    bucketed = lsh_bucket_ids(df, dims, bits, tables, vector_col, id_col, seed)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("_vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    scored = pairs.withColumn(
        "cosine",
        cosine_similarity(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")),
    )
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
