"""Top-k retrieval (V1/V2/W4) vs a numpy brute-force oracle + determinism +
payload contract (P1/P2/A1) + the TakeOrderedAndProject plan guarantee."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
    vector_search,
    vector_search_payload,
)
from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report


@pytest.fixture(scope="module")
def emb_pdf(tables):
    pdf = tables["embeddings"].select("vec_id", "embedding").toPandas()
    return pdf


def _numpy_topk(pdf, q, k):
    m = np.vstack(pdf.embedding.to_numpy()).astype(np.float64)
    qv = np.asarray(q, dtype=np.float64)
    sims = (m / np.linalg.norm(m, axis=1, keepdims=True)) @ (qv / np.linalg.norm(qv))
    order = sorted(zip(-sims, pdf.vec_id))[:k]  # score desc, id asc tiebreak
    return [int(v) for _, v in order]


@pytest.mark.parametrize("seed,k", [(1, 10), (2, 1), (3, 25)])
def test_topk_matches_numpy_oracle(spark, tables, emb_pdf, seed, k):
    q = list(map(float, np.random.RandomState(seed).randn(64)))
    got = [
        r.vec_id
        for r in vector_search(
            tables["embeddings"], q, k=k, vector_col="embedding", id_col="vec_id"
        ).collect()
    ]
    assert got == _numpy_topk(emb_pdf, q, k)


def test_pandas_path_same_ranking(spark, tables, emb_pdf):
    q = list(map(float, np.random.RandomState(9).randn(64)))
    native = vector_search(tables["embeddings"], q, k=10, vector_col="embedding", id_col="vec_id")
    arrow = vector_search(
        tables["embeddings"], q, k=10, vector_col="embedding", id_col="vec_id", use_pandas=True
    )
    assert [r.vec_id for r in native.collect()] == [r.vec_id for r in arrow.collect()]


def test_k_larger_than_table(spark, tables):
    n = tables["embeddings"].count()
    out = vector_search(tables["embeddings"], [0.1] * 64, k=n + 100, vector_col="embedding")
    assert out.count() == n


def test_tiebreak_makes_equal_scores_deterministic(spark):
    # 4 identical vectors -> identical scores; tiebreak must pick lowest ids
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in (7, 3, 9, 5)], "id long, v array<float>"
    )
    for _ in range(3):
        got = [r.id for r in vector_search(df, [1.0, 2.0, 3.0], k=2, vector_col="v", id_col="id").collect()]
        assert got == [3, 5]


def test_payload_contract(spark):
    # MongoDbService.cs:227-229: docs joined with SPACES, score-descending,
    # _id and vector excluded from the serialized docs (:213-222, :397-413)
    df = spark.createDataFrame(
        [
            ("a", "far", [1.0, 0.0]),
            ("b", "near", [0.0, 1.0]),
            ("c", "mid", [0.5, 0.5]),
        ],
        "_id string, name string, vector array<float>",
    )
    row = vector_search_payload(df, [0.0, 1.0], k=3, vector_col="vector").first()
    assert '"vector"' not in row.payload and '"_id"' not in row.payload
    # space-joined, best score first
    assert row.payload.index("near") < row.payload.index("mid") < row.payload.index("far")
    assert row.payload.count(" ") >= 2


def test_topk_plans_as_take_ordered(spark, tables):
    q = [0.5] * 64
    rep = plan_report(
        vector_search(tables["embeddings"], q, k=10, vector_col="embedding", id_col="vec_id")
    )
    assert rep.take_ordered, "ORDER BY score LIMIT k must plan as TakeOrderedAndProject"
    assert rep.global_sorts == 0, "top-k must not global-sort the table"
