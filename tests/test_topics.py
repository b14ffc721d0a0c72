"""Topic clustering: total assignment, determinism, and cluster recovery on
structured data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.topics import (
    cluster_topics,
    topic_sizes,
)


def test_every_row_assigned_exactly_once(spark, tables):
    emb = tables["embeddings"]
    out = cluster_topics(emb, k=4)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    assert out.select("topic_id").distinct().count() <= 4


def test_deterministic_under_seed(spark, tables):
    a = {(r.vec_id, r.topic_id) for r in cluster_topics(tables["embeddings"], k=4, seed=7).collect()}
    b = {(r.vec_id, r.topic_id) for r in cluster_topics(tables["embeddings"], k=4, seed=7).collect()}
    assert a == b


def test_recovers_planted_clusters(spark):
    rng = np.random.RandomState(1)
    centers = rng.randn(3, 12) * 6
    rows = [
        (i, (centers[i % 3] + rng.randn(12) * 0.2).astype(float).tolist()) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_topics(df, k=3, seed=3).collect()
    # purity: every planted group maps to one dominant topic
    from collections import Counter

    by_truth = {}
    for r in out:
        by_truth.setdefault(r.vec_id % 3, Counter())[r.topic_id] += 1
    for truth, counts in by_truth.items():
        assert counts.most_common(1)[0][1] >= 95  # >= 95/100 in the dominant topic


def test_topic_sizes_rollup(spark, tables):
    sizes = topic_sizes(tables["embeddings"], k=4)
    total = sizes.agg(F.sum("n_docs").alias("s")).first().s
    assert total == tables["embeddings"].count()
