"""Null-vector and empty-input hygiene across the similarity surface: a
single NULL row must never kill an Arrow batch or reorder results
unpredictably; empty inputs return empty results with the right schema."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import (
    cosine_pairs_exact,
    embedding_neardup,
    knn_brute_force,
    lsh_bucket_ids,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import vector_search


@pytest.fixture()
def with_null(spark):
    return spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )


def test_vector_search_null_scores_zero_both_paths(spark, with_null):
    for use_pandas in (False, True):
        rows = {
            r.vec_id: r.score
            for r in vector_search(
                with_null, [1.0, 0.0], k=4, vector_col="embedding",
                id_col="vec_id", use_pandas=use_pandas,
            ).collect()
        }
        assert rows[1] == pytest.approx(1.0)
        assert rows[2] == 0.0  # NULL vector -> score 0, not a crash/NULL
        assert rows[3] == 0.0  # zero vector -> score 0 (same convention)


def test_knn_brute_force_survives_null_rows(spark, with_null):
    out = knn_brute_force(with_null, [[1.0, 0.0]], k=4)
    got = {r.vec_id: r.score for r in out.collect()}
    assert got[2] == 0.0 and got[1] == pytest.approx(1.0)


def test_lsh_bucket_ids_survives_null_rows(spark, with_null):
    out = lsh_bucket_ids(with_null, dims=2, bits=4, tables=2)
    # every row (including the NULL one) gets `tables` bucket assignments
    assert out.count() == 4 * 2


def test_cosine_pairs_null_rows_score_zero(spark, with_null):
    pairs = cosine_pairs_exact(with_null, threshold=-1.0, use_pandas=True).collect()
    null_pair_scores = [r.cosine for r in pairs if 2 in (r.id_a, r.id_b)]
    assert null_pair_scores and all(s == 0.0 for s in null_pair_scores)


def test_embedding_neardup_empty_and_all_null_inputs(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_neardup(empty, threshold=0.5)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "cosine"}

    all_null = spark.createDataFrame([(1, None), (2, None)], "vec_id long, embedding array<double>")
    assert embedding_neardup(all_null, threshold=0.5).count() == 0


def test_vector_search_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert vector_search(empty, [1.0, 0.0], k=5, vector_col="embedding").count() == 0
