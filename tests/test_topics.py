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


# ---------------------------------------------------------------------------
# fit_topics_local + assign_topics_col: the oracle-pairing deterministic
# variant (round 13 — the corpus_enrichment hash gate serves these)


@pytest.fixture(scope="module")
def emb_parquet(spark, tables, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("topics") / "emb.parquet")
    tables["embeddings"].select("vec_id", "embedding").coalesce(1).write.parquet(p)
    import glob

    return glob.glob(p + "/part-*.parquet")[0]


def test_fit_topics_local_bit_deterministic(emb_parquet):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.topics import fit_topics_local

    a = fit_topics_local(emb_parquet, k=4)
    b = fit_topics_local(emb_parquet, k=4)
    assert a == b  # exact float equality, not approx
    assert len(a) == 4 and all(len(c) == len(a[0]) for c in a)


def test_assign_topics_col_matches_numpy_rule(spark, tables, emb_parquet):
    """The Spark codegen argmax replays the fit's own assignment rule:
    argmax_c(x_hat . c - |c|^2/2), first max on ties."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.topics import (
        assign_topics_col,
        fit_topics_local,
    )

    cents = np.array(fit_topics_local(emb_parquet, k=4))
    got = {
        r.vec_id: r.t
        for r in tables["embeddings"]
        .select("vec_id", assign_topics_col(cents.tolist(), "embedding").alias("t"))
        .collect()
    }
    rows = tables["embeddings"].select("vec_id", "embedding").collect()
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        n = np.linalg.norm(x)
        xh = x / n if n > 0 else x * 0.0
        want = int(np.argmax(xh @ cents.T - 0.5 * (cents * cents).sum(1)))
        assert got[r.vec_id] == want, r.vec_id


def test_assign_topics_col_zero_vector_first_min_norm(spark):
    """A zero embedding scores 0 - |c|^2/2 for every centroid -> the
    min-norm centroid wins (first on ties); no divide-by-zero under ANSI."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.topics import assign_topics_col

    cents = [[2.0, 0.0], [0.5, 0.5], [1.0, 0.0]]
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.1])], "i long, embedding array<double>"
    )
    got = {r.i: r.t for r in df.select("i", assign_topics_col(cents, "embedding").alias("t")).collect()}
    assert got[0] == 1  # min |c|^2 centroid
    assert got[1] == 2  # x_hat ~ [1,0]: nearest unit-space centroid is [1,0]


def test_assign_topics_is_pure_codegen(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.topics import (
        assign_topics_col,
        fit_topics_local,
    )
    import re

    df = tables["embeddings"].select(
        assign_topics_col([[0.1] * 64, [0.2] * 64], "embedding").alias("t")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.findall(r"ArrowEvalPython|BatchEvalPython", plan)
    assert "Exchange" not in plan
