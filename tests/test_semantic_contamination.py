"""Embedding-space decontamination (operators/decontam.py
semantic_contamination): numpy parity, NULL-vector contract, rounded-score
argmax tiebreak, and the no-window/broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
    semantic_contamination,
)

CORPUS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0]),
    (2, [1.0, 1.0, 0.0]),
    (3, None),
    (4, [0.5, 0.5, 0.5]),
]
BENCH = [
    (100, [1.0, 0.0, 0.0]),
    (101, [0.0, 0.0, 1.0]),
    (102, None),  # dropped up front
]


@pytest.fixture(scope="module")
def frames(spark):
    c = spark.createDataFrame(CORPUS, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(BENCH, "vec_id long, embedding array<double>")
    return c, b


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    return num / (na * nb)


def test_matches_python_oracle(frames):
    c, b = frames
    out = {r["vec_id"]: r.asDict() for r in semantic_contamination(c, b, threshold=0.9).collect()}
    for vid, vec in CORPUS:
        row = out[vid]
        if vec is None:
            assert row["best_cos"] is None and row["bench_id"] is None
            assert row["contaminated"] is False
            continue
        scored = sorted(
            ((round(_cos(vec, bv), 4), bid) for bid, bv in BENCH if bv is not None),
            key=lambda t: (-t[0], t[1]),
        )
        assert (row["best_cos"], row["bench_id"]) == scored[0]
        assert row["contaminated"] == (scored[0][0] >= 0.9)


def test_exact_match_is_contaminated(frames):
    c, b = frames
    out = {r["vec_id"]: r for r in semantic_contamination(c, b, threshold=0.99).collect()}
    assert out[0]["contaminated"] is True and out[0]["bench_id"] == 100
    assert out[1]["contaminated"] is False


def test_tie_breaks_to_smallest_bench_id(spark):
    c = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    # two benchmark vectors at identical rounded cosine to the query
    b = spark.createDataFrame(
        [(7, [2.0, 0.0]), (3, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = semantic_contamination(c, b).first()
    assert row["bench_id"] == 3 and row["best_cos"] == 1.0


def test_all_corpus_rows_survive(frames):
    c, b = frames
    assert semantic_contamination(c, b).count() == len(CORPUS)


def test_plan_shapes(frames):
    c, b = frames
    # default pandas path: one Arrow pass, no join of the benchmark, no window
    plan = semantic_contamination(c, b)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInPandas" in plan
    # JVM path: benchmark broadcast-joined, still no window
    plan_j = (
        semantic_contamination(c, b, use_pandas=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan_j
    assert "Broadcast" in plan_j


def test_pandas_and_jvm_paths_agree(frames):
    c, b = frames
    a = sorted(
        tuple(r) for r in semantic_contamination(c, b, threshold=0.9, use_pandas=True).collect()
    )
    j = sorted(
        tuple(r) for r in semantic_contamination(c, b, threshold=0.9, use_pandas=False).collect()
    )
    assert a == j


def test_empty_benchmark_flags_nothing(spark, frames):
    c, _ = frames
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    rows = semantic_contamination(c, empty).collect()
    assert len(rows) == len(CORPUS)
    assert all(r["contaminated"] is False and r["bench_id"] is None for r in rows)
