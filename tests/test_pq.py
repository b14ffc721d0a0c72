"""Product quantization (operators/pq.py): encode parity with numpy, ADC
score exactness vs the LUT definition, recall floor against exact cosine,
determinism, and compression accounting."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import pq

DIMS, M, BITS = 16, 4, 4


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(DIMS)]) for i in range(300)]
    rows.append((300, None))  # NULL vector: dropped by encode
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def model(vectors):
    return pq.fit_pq(vectors, m=M, bits=BITS, seed=7, iters=10)


@pytest.fixture(scope="module")
def encoded(vectors, model):
    return pq.encode_pq(vectors, model).cache()


def test_model_shape_and_size(model):
    assert model["dims"] == DIMS and model["m"] == M
    cbs = np.array(model["codebooks"])
    assert cbs.shape == (M, 1 << BITS, DIMS // M)
    assert pq.pq_model_bytes(model) == M * (1 << BITS) * (DIMS // M) * 4


def test_encode_matches_numpy(encoded, vectors, model):
    got = {r["vec_id"]: list(r["codes"]) for r in encoded.collect()}
    raw = {r["vec_id"]: r["embedding"] for r in vectors.collect() if r["embedding"]}
    assert set(got) == set(raw)  # NULL row dropped
    cbs = [np.array(cb) for cb in model["codebooks"]]
    dsub = DIMS // M
    for vid, vec in raw.items():
        x = np.array(vec)
        x = x / np.linalg.norm(x)
        want = [
            int(((cbs[j] - x[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1).argmin())
            for j in range(M)
        ]
        assert got[vid] == want, vid


def test_adc_equals_lut_sum(encoded, model):
    q = [0.3] * DIMS
    top = pq.adc_topk(encoded, model, q, k=5).collect()
    qn = np.array(q) / np.linalg.norm(q)
    lut = [
        np.array(model["codebooks"][j]) @ qn[j * (DIMS // M) : (j + 1) * (DIMS // M)]
        for j in range(M)
    ]
    codes = {r["vec_id"]: r["codes"] for r in encoded.collect()}
    scores = {
        vid: round(sum(float(lut[j][c[j]]) for j in range(M)), 6)
        for vid, c in codes.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["vec_id"], r["score"]) for r in top] == want


def test_recall_floor_vs_exact_cosine(encoded, vectors, model):
    """PQ is for candidate generation: recall@10 of the exact top-10 must
    clear a floor on this easy fixture (random gaussians, 16 dims)."""
    rng = np.random.RandomState(11)
    raw = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect() if r["embedding"]}
    hits = total = 0
    for _ in range(20):
        q = rng.randn(DIMS)
        cos = {
            vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            for vid, v in raw.items()
        }
        exact = {v for v, _ in sorted(cos.items(), key=lambda kv: -kv[1])[:10]}
        got = {r["vec_id"] for r in pq.adc_topk(encoded, model, list(q), k=10).collect()}
        hits += len(exact & got)
        total += 10
    # 20 queries x 10 = 200 draws; random guessing scores 10/300 =
    # 0.033, so 0.45 is a strong floor while absorbing the ~±0.05 noise a
    # 4-bit / 4-subspace quantizer shows on random gaussians
    assert hits / total >= 0.45, hits / total


def test_encode_deterministic_across_partitionings(vectors, model):
    a = {r["vec_id"]: list(r["codes"]) for r in pq.encode_pq(vectors, model).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq.encode_pq(vectors.repartition(7), model).collect()
    }
    assert a == b


def test_fit_is_deterministic(vectors):
    m1 = pq.fit_pq(vectors, m=M, bits=BITS, seed=7, iters=5)
    m2 = pq.fit_pq(vectors.repartition(5), m=M, bits=BITS, seed=7, iters=5)
    assert m1 == m2


def test_bad_dims_raise(vectors):
    with pytest.raises(ValueError, match="not divisible"):
        pq.fit_pq(vectors, m=5, bits=2)


def test_adc_topk_edge_cases(encoded, model):
    # k > table size: returns all rows, no error
    assert pq.adc_topk(encoded, model, [0.2] * DIMS, k=10_000).count() == 300
    # zero query vector: all scores 0.0, order falls back to id tiebreak
    rows = pq.adc_topk(encoded, model, [0.0] * DIMS, k=3).collect()
    assert [r["vec_id"] for r in rows] == [0, 1, 2]
    assert all(r["score"] == 0.0 for r in rows)


def test_fit_pq_rejects_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq.fit_pq(empty, m=2, bits=2)
    nulls = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq.fit_pq(nulls, m=2, bits=2)


def test_fit_sample_margin_survives_small_max_sample(spark):
    """Round-8 review finding: the old fixed 1.2x over-draw failed a few
    percent of (data, seed) pairs at small max_sample. The
    cap_per_group-style sigma margin must fit reliably; the knob is
    exposed for the ~1e-9 tail."""
    rng = np.random.RandomState(0)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(10_000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for seed in range(5):
        m = pq.fit_pq(df, m=2, bits=2, seed=seed, max_sample=100, iters=2)
        assert len(m["codebooks"]) == 2
