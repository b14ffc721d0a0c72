"""int8 embedding quantization (functions/vector.py): round-trip error,
cosine preservation, top-k recall on the real embeddings table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import (
    cosine_similarity,
    dequantize_int8,
    quantize_int8,
)


def test_roundtrip_error_bound(spark):
    rng = np.random.RandomState(0)
    vecs = [(i, [float(x) for x in rng.randn(64)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "id long, v array<double>")
    rows = df.select(
        "id", "v", dequantize_int8(quantize_int8("v")).alias("dq")
    ).collect()
    for r in rows:
        v = np.array(r["v"])
        dq = np.array(r["dq"])
        # symmetric int8: |err| <= scale/2 per element = max|v|/254
        assert np.max(np.abs(v - dq)) <= np.max(np.abs(v)) / 254 + 1e-9


def test_zero_vector_roundtrip(spark):
    df = spark.createDataFrame([(0, [0.0] * 8)], "id long, v array<double>")
    row = df.select(
        quantize_int8("v").alias("qs"), dequantize_int8(quantize_int8("v")).alias("dq")
    ).collect()[0]
    assert row["qs"]["scale"] == 0.0
    assert row["dq"] == [0.0] * 8


def test_schema_is_tinyint(spark):
    df = spark.createDataFrame([(0, [1.0, -1.0])], "id long, v array<double>")
    q = df.select(quantize_int8("v").alias("qs"))
    assert q.schema["qs"].dataType["q"].dataType.elementType.simpleString() == "tinyint"
    assert q.schema["qs"].dataType["scale"].dataType.simpleString() == "float"


def test_cosine_preserved_and_topk_recall(spark, tables):
    emb = tables["embeddings"]
    qv = [float(x) for x in np.random.RandomState(7).randn(64)]
    scored = emb.select(
        "vec_id",
        cosine_similarity(F.col("embedding").cast("array<double>"), qv).alias("exact"),
        cosine_similarity(
            dequantize_int8(quantize_int8(F.col("embedding").cast("array<double>"))), qv
        ).alias("quant"),
    ).collect()
    exact = {r["vec_id"]: r["exact"] for r in scored}
    quant = {r["vec_id"]: r["quant"] for r in scored}
    # per-vector cosine error small
    for vid in exact:
        assert quant[vid] == pytest.approx(exact[vid], abs=0.02)
    top_exact = sorted(exact, key=lambda i: (-exact[i], i))[:10]
    top_quant = sorted(quant, key=lambda i: (-quant[i], i))[:10]
    assert len(set(top_exact) & set(top_quant)) >= 8  # recall@10 >= 0.8
