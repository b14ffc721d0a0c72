"""S8/A6: embedders — vectorized kernel vs the scalar FNV-1a definition
(golden), usage struct output, and RemoteEmbedder retry/batching with
injected transports (OpenAiService.cs:97-105 policy)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import (
    HashNgramEmbedder,
    RemoteEmbedder,
)

TEXTS = ["hello world", "", "ab", "the quick brown fox", "ünïcødé tëxt!", "x" * 300]


def _scalar_reference(texts, dims, lo, hi):
    """The original per-byte FNV-1a definition, kept as the golden oracle
    for the vectorized kernel."""
    out = np.zeros((len(texts), dims), dtype=np.float32)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8", "ignore")
        if not b:
            out[i, 0] = 1.0
            continue
        acc = out[i]
        for n in range(lo, hi + 1):
            for j in range(len(b) - n + 1):
                h = 2166136261
                for ch in b[j : j + n]:
                    h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
                acc[h % dims] += 1.0 if (h >> 31) else -1.0
        norm = np.linalg.norm(acc)
        if norm > 0:
            acc /= norm
    return out


def test_vectorized_kernel_bit_identical_to_scalar():
    e = HashNgramEmbedder(dims=64)
    assert np.array_equal(e.embed_numpy(TEXTS), _scalar_reference(TEXTS, 64, 3, 5))


def test_output_is_unit_norm_and_deterministic():
    e = HashNgramEmbedder(dims=128)
    v1, v2 = e.embed_numpy(["some document text"]), e.embed_numpy(["some document text"])
    assert np.array_equal(v1, v2)
    assert np.linalg.norm(v1[0]) == pytest.approx(1.0, abs=1e-5)


def test_similar_texts_are_closer_than_dissimilar():
    e = HashNgramEmbedder(dims=256)
    a, b, c = e.embed_numpy(
        ["the mountain bike with red frame", "the mountain bike with blue frame", "socks"]
    )
    assert float(a @ b) > float(a @ c)


def test_usage_struct_udf(spark):
    e = HashNgramEmbedder(dims=32)
    df = spark.createDataFrame([("hello world",), ("",)], "text string")
    rows = df.select(e.usage_udf()(F.col("text")).alias("u")).collect()
    assert len(rows[0].u.vector) == 32
    assert rows[0].u.token_count == 2  # "hello", " world"
    assert rows[1].u.token_count == 0


def test_remote_embedder_requires_transport():
    with pytest.raises(NotImplementedError):
        RemoteEmbedder(dims=8)._call_api(["x"])


def test_remote_embedder_retries_then_succeeds():
    calls = {"n": 0}

    def flaky(texts):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return np.ones((len(texts), 8), dtype=np.float32)

    emb = RemoteEmbedder(dims=8, transport=flaky, base_delay_s=0.0)
    v, counts = emb._embed_batches(["a", "b"])
    assert calls["n"] == 3 and v.shape == (2, 8)
    assert counts.tolist() == [1, 1]  # fallback: engine tokenizer counts


def test_remote_embedder_exhausts_retries():
    def always_down(texts):
        raise ConnectionError("down")

    emb = RemoteEmbedder(dims=8, transport=always_down, base_delay_s=0.0, max_retries=3)
    with pytest.raises(ConnectionError):
        emb._embed_batches(["a"])


def test_remote_embedder_batching_and_usage_passthrough():
    batches = []

    def transport(texts):
        batches.append(len(texts))
        return (
            np.zeros((len(texts), 8), dtype=np.float32),
            np.array([100 + i for i in range(len(texts))], dtype=np.int32),
        )

    emb = RemoteEmbedder(dims=8, batch_size=2, transport=transport)
    v, counts = emb._embed_batches(["a", "b", "c", "d", "e"])
    assert batches == [2, 2, 1]  # API-size chunking inside the Arrow batch
    assert v.shape == (5, 8)
    assert counts[0] == 100  # API-provided usage wins over local estimate


def test_remote_embedder_udf_in_plan(spark):
    def transport(texts):
        return np.full((len(texts), 4), 0.5, dtype=np.float32)

    emb = RemoteEmbedder(dims=4, transport=transport)
    df = spark.createDataFrame([("a",), ("b",)], "text string")
    rows = df.select(emb.udf()(F.col("text")).alias("v")).collect()
    assert all(len(r.v) == 4 for r in rows)
