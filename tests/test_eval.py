"""Retrieval metrics (operators/eval.py) vs hand-computed and random
python-oracle cases."""

from __future__ import annotations

import math
import random

import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.eval import evaluate_retrieval


def _run(spark, results, qrels, k=10):
    r = spark.createDataFrame(results, "query_id long, doc_id long, rank int")
    q = spark.createDataFrame(qrels, "query_id long, doc_id long, rel int")
    return evaluate_retrieval(r, q, k=k).collect()[0]


def test_perfect_retrieval(spark):
    res = [(1, 10, 1), (1, 11, 2)]
    qrels = [(1, 10, 2), (1, 11, 1)]
    m = _run(spark, res, qrels, k=10)
    assert m["n_queries"] == 1
    assert m["recall_at_10"] == 1.0
    assert m["mrr"] == 1.0
    assert m["ndcg_at_10"] == pytest.approx(1.0)


def test_total_miss_and_macro_average(spark):
    res = [(1, 10, 1), (2, 99, 1)]  # q2 retrieved nothing relevant
    qrels = [(1, 10, 1), (2, 20, 1)]
    m = _run(spark, res, qrels)
    assert m["n_queries"] == 2
    assert m["recall_at_10"] == 0.5
    assert m["mrr"] == 0.5
    assert m["ndcg_at_10"] == pytest.approx(0.5)


def test_rank_position_matters(spark):
    # relevant doc at rank 3: RR = 1/3, DCG = 1/log2(4), IDCG = 1
    res = [(1, 7, 1), (1, 8, 2), (1, 9, 3)]
    qrels = [(1, 9, 1)]
    m = _run(spark, res, qrels)
    assert m["mrr"] == pytest.approx(1 / 3)
    assert m["ndcg_at_10"] == pytest.approx(1 / math.log2(4))


def test_query_without_rels_excluded(spark):
    res = [(1, 10, 1), (3, 30, 1)]
    qrels = [(1, 10, 1), (3, 30, 0)]  # q3 has only rel=0 -> excluded
    m = _run(spark, res, qrels)
    assert m["n_queries"] == 1


def test_k_cutoff(spark):
    res = [(1, 10, 11)]  # outside k=10
    qrels = [(1, 10, 1)]
    m = _run(spark, res, qrels, k=10)
    assert m["recall_at_10"] == 0.0 and m["mrr"] == 0.0


def test_random_against_python_oracle(spark):
    rng = random.Random(7)
    results, qrels = [], []
    for qid in range(12):
        docs = rng.sample(range(100), 10)
        results += [(qid, d, i + 1) for i, d in enumerate(docs)]
        rels = {d: rng.randint(1, 3) for d in rng.sample(range(100), 5)}
        qrels += [(qid, d, r) for d, r in rels.items()]

    k = 10
    by_q = {}
    for qid in range(12):
        ranked = sorted(
            [(r, d) for (q, d, r) in results if q == qid and r <= k]
        )
        rels = {d: r for (q, d, r) in qrels if q == qid and r > 0}
        hits = [(r, d) for r, d in ranked if d in rels]
        recall = len(hits) / min(len(rels), k)
        rr = 1 / hits[0][0] if hits else 0.0
        dcg = sum(rels[d] / math.log2(r + 1) for r, d in hits)
        ideal = sorted(rels.values(), reverse=True)[:k]
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal))
        by_q[qid] = (recall, rr, dcg / idcg if idcg else 0.0)

    m = _run(spark, results, qrels, k=k)
    n = len(by_q)
    assert m["recall_at_10"] == pytest.approx(sum(v[0] for v in by_q.values()) / n)
    assert m["mrr"] == pytest.approx(sum(v[1] for v in by_q.values()) / n)
    assert m["ndcg_at_10"] == pytest.approx(sum(v[2] for v in by_q.values()) / n)


def test_end_to_end_engine_recall(spark, tables):
    """Measure the LSH index against exact top-k as qrels — the operator
    consuming the engine's own outputs."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import cosine_similarity
    from vector_search_ai_assistant_mongodbvcore_spark.operators import keyword_search as KW

    emb = tables["embeddings"]
    qv = [float(x) for x in np.random.RandomState(3).randn(64)]
    exact = KW.ranked_topk(
        emb.select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding").cast("array<double>"), qv).alias("s"),
        ),
        "s", "doc_id", k=10,
    )
    qrels = exact.select(
        F.lit(1).alias("query_id"), F.col("doc_id"), F.lit(1).alias("rel")
    )
    results = exact.select(
        F.lit(1).alias("query_id"), F.col("doc_id"), F.col("rank").alias("rank")
    )
    m = evaluate_retrieval(results, qrels, k=10).collect()[0]
    assert m["recall_at_10"] == 1.0 and m["ndcg_at_10"] == pytest.approx(1.0)
