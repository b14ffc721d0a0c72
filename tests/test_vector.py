"""functions.vector vs numpy: cosine, dot, norms, zero-vector guards."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize,
)


def _one(spark, a, b=None):
    if b is None:
        df = spark.createDataFrame([(a,)], "a array<double>")
    else:
        df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    return df


def test_cosine_matches_numpy(spark):
    rng = np.random.RandomState(0)
    a, b = rng.randn(32).tolist(), rng.randn(32).tolist()
    got = _one(spark, a, b).select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first().c
    expect = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert math.isclose(got, expect, rel_tol=1e-12)


def test_cosine_zero_vector_is_zero(spark):
    # ANSI mode would raise DIVIDE_BY_ZERO without the guard
    got = (
        _one(spark, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0])
        .select(cosine_similarity(F.col("a"), F.col("b")).alias("c"))
        .first()
        .c
    )
    assert got == 0.0


def test_dot_and_norm(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, -5.0, 6.0]
    row = (
        _one(spark, a, b)
        .select(
            dot_product(F.col("a"), F.col("b")).alias("d"),
            l2_norm(F.col("a")).alias("n"),
        )
        .first()
    )
    assert row.d == pytest.approx(4 - 10 + 18)
    assert row.n == pytest.approx(math.sqrt(14))


def test_normalize_unit_norm_and_zero_guard(spark):
    row = (
        spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "a array<double>")
        .select(normalize(F.col("a")).alias("n"))
        .collect()
    )
    assert row[0].n == pytest.approx([0.6, 0.8])
    # zero vector passes through unchanged instead of raising
    assert row[1].n == [0.0, 0.0]


def test_cosine_literal_query_vector(spark):
    a = [1.0, 0.0, 0.0]
    got = _one(spark, a).select(cosine_similarity(F.col("a"), [0.0, 1.0, 0.0]).alias("c")).first().c
    assert got == pytest.approx(0.0)


def test_stack_vectors_raises_on_dimension_mismatch(spark):
    """A non-null 63-dim row among 64-dim vectors must raise, not silently
    truncate/pad into quietly-wrong cosine scores."""
    import pandas as pd

    from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import stack_vectors

    good = pd.Series([[1.0] * 64, [2.0] * 64])
    assert stack_vectors(good, dims=64).shape == (2, 64)

    bad = pd.Series([[1.0] * 64, [2.0] * 63])
    with pytest.raises(ValueError, match="mixed vector dimensions"):
        stack_vectors(bad)
    with pytest.raises(ValueError, match="expected 64-dim"):
        stack_vectors(pd.Series([[2.0] * 63]), dims=64)

    # nulls/empties still zero-fill (the documented hygiene contract)
    mixed = pd.Series([[1.0] * 4, None, []])
    m = stack_vectors(mixed, dims=4)
    assert m.shape == (3, 4)
    assert (m[1] == 0).all() and (m[2] == 0).all()
