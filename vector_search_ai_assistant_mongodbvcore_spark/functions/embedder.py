"""Pluggable embedding sources.

Reference: OpenAiService.GetEmbeddingsAsync
(/root/reference/SharedLib/Services/OpenAiService.cs:122-155) — text ->
(float[1536], token_count), called once per document, sequentially, with a
10×-exponential-backoff retry (:97-105). That sequential per-doc HTTPS loop is
the reference's ingest bottleneck (README.md:154: 5-10 minutes for the
sample).

Spark-first replacement: an Arrow-batched `mapInPandas`/pandas_udf that embeds
hundreds of rows per invocation. Two implementations share one interface:

  * HashNgramEmbedder — deterministic, hermetic, pure numpy. Character
    n-grams hashed into a D-dim float space, unit-normalized. Every test and
    the whole correctness harness run on this; similar texts get similar
    vectors (shared n-grams), so near-dup semantics are realistic.
  * RemoteEmbedder — the production shape: batches texts per API call with
    retry/backoff. The HTTP call itself is stubbed (no network, no key in
    this environment) behind NotImplementedError; partitioning, batching,
    retry and schema are real.

At 100 TB: embedding is embarrassingly parallel over partitions; the only
scale knobs are Arrow batch size and API concurrency per executor. Output is
written once (idempotent MERGE by id downstream), so task retries are safe.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType, IntegerType, StructField, StructType

DEFAULT_DIMS = 1536


class FatalTransportError(RuntimeError):
    """A transport error retrying cannot fix (auth failure, bad request,
    content filter): the retry loops re-raise it immediately instead of
    burning the x10 exponential budget on a deterministic failure. The
    reference's Polly policy retries blindly (OpenAiService.cs:97-105);
    distinguishing fatal from transient is the one deliberate deviation —
    a 401 retried 10 times with exponential sleeps is ~34 minutes of
    guaranteed-failing wait per PARTITION at base_delay 2s."""

# (array<float> vector, int token_count) — the reference's embedding API
# returns BOTH the vector and the usage token count (OpenAiService.cs:142),
# which feeds the session token rollup (ChatService.cs:130, :313-316).
EMBEDDING_USAGE_TYPE = StructType(
    [
        StructField("vector", ArrayType(FloatType())),
        StructField("token_count", IntegerType()),
    ]
)


def _token_count_py(text: str) -> int:
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import _encode_py

    return len(_encode_py(text or ""))


class HashNgramEmbedder:
    """Deterministic char-ngram hashing embedder (unit-norm output).

    embed_numpy is fully vectorized: per n-gram length, a sliding byte
    window + uint32 FNV-1a computed across ALL positions at once (numpy
    uint32 arithmetic wraps mod 2^32 exactly like the scalar hash), then one
    bincount scatter per length. Bucket increments are ±1 integers, so the
    accumulation is exact and bit-identical to the scalar definition
    regardless of summation order.
    """

    def __init__(self, dims: int = DEFAULT_DIMS, ngram: tuple[int, int] = (3, 5), seed: int = 42):
        self.dims = dims
        self.ngram = ngram
        self.seed = seed

    def embed_numpy(self, texts: Sequence[str]) -> np.ndarray:
        dims = self.dims
        lo, hi = self.ngram
        prime = np.uint32(16777619)
        out = np.zeros((len(texts), dims), dtype=np.float32)
        for i, t in enumerate(texts):
            b = np.frombuffer((t or "").encode("utf-8", "ignore"), dtype=np.uint8)
            if b.size == 0:
                out[i, 0] = 1.0
                continue
            acc = out[i]
            for n in range(lo, hi + 1):
                if b.size < n:
                    continue
                win = np.lib.stride_tricks.sliding_window_view(b, n)  # (L-n+1, n)
                h = np.full(win.shape[0], 2166136261, dtype=np.uint32)
                for j in range(n):  # FNV-1a, one vectorized step per byte position
                    h = (h ^ win[:, j].astype(np.uint32)) * prime
                sign = np.where(h >> np.uint32(31), 1.0, -1.0)
                acc += np.bincount(h % np.uint32(dims), weights=sign, minlength=dims).astype(
                    np.float32
                )
            norm = np.linalg.norm(acc)
            if norm > 0:
                acc /= norm
        return out

    def embed_with_usage_numpy(self, texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
        """A6/S8: (vectors, token_counts) — the reference's (float[], int)
        pair (OpenAiService.cs:122-155); counts come from the engine's own
        tokenizer (the local stand-in for API usage)."""
        vectors = self.embed_numpy(texts)
        counts = np.array([_token_count_py(t) for t in texts], dtype=np.int32)
        return vectors, counts

    def udf(self):
        dims, ngram, seed = self.dims, self.ngram, self.seed

        @pandas_udf(ArrayType(FloatType()))
        def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            emb = HashNgramEmbedder(dims, ngram, seed)
            for s in batches:
                m = emb.embed_numpy(s.fillna("").tolist())
                yield pd.Series(list(m))

        return embed

    def usage_udf(self):
        """Struct-returning variant: embed(text) -> (vector, token_count)."""
        dims, ngram, seed = self.dims, self.ngram, self.seed

        @pandas_udf(EMBEDDING_USAGE_TYPE)
        def embed_usage(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            emb = HashNgramEmbedder(dims, ngram, seed)
            for s in batches:
                texts = s.fillna("").tolist()
                m, counts = emb.embed_with_usage_numpy(texts)
                yield pd.DataFrame({"vector": list(m), "token_count": counts})

        return embed_usage


class RemoteEmbedder:
    """Production embedding source shape (stubbed transport).

    Mirrors the reference's retry policy (OpenAiService.cs:97-105):
    `max_retries` attempts, exponential backoff from `base_delay_s`. The
    transport (`_call_api`) raises NotImplementedError here — no network in
    this container — but batching/retry/partition plumbing is real and
    tested (tests/test_embedder.py injects fake/flaky transports).

    Transport contract: texts -> vectors ndarray, or (vectors, token_counts)
    — the latter mirrors the API's usage field (OpenAiService.cs:142). When
    a transport returns no counts, `usage_udf` falls back to the engine
    tokenizer's counts.
    """

    def __init__(
        self,
        dims: int = DEFAULT_DIMS,
        batch_size: int = 256,
        max_retries: int = 10,
        base_delay_s: float = 2.0,
        transport: Callable[[list[str]], np.ndarray] | None = None,
    ):
        self.dims = dims
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.base_delay_s = base_delay_s
        self.transport = transport

    def _call_api(self, texts: list[str]) -> np.ndarray:
        if self.transport is not None:
            return self.transport(texts)
        raise NotImplementedError(
            "RemoteEmbedder has no network transport in this environment; "
            "inject `transport=` or use HashNgramEmbedder."
        )

    def _embed_with_retry(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray | None]:
        """Returns (vectors, token_counts-or-None), retrying per the
        reference's backoff policy."""
        delay = self.base_delay_s
        for attempt in range(self.max_retries):
            try:
                result = self._call_api(texts)
                if isinstance(result, tuple):
                    vectors, counts = result
                    return np.asarray(vectors), np.asarray(counts, dtype=np.int32)
                return np.asarray(result), None
            except (NotImplementedError, FatalTransportError):
                raise
            except Exception:
                if attempt == self.max_retries - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        raise RuntimeError("unreachable")

    def _embed_batches(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        chunks = [
            self._embed_with_retry(texts[i : i + self.batch_size])
            for i in range(0, len(texts), self.batch_size)
        ]
        if not chunks:
            return np.zeros((0, self.dims), np.float32), np.zeros(0, np.int32)
        vectors = np.vstack([v for v, _ in chunks]).astype(np.float32)
        counts = (
            np.concatenate([c for _, c in chunks])
            if all(c is not None for _, c in chunks)
            else np.array([_token_count_py(t) for t in texts], dtype=np.int32)
        )
        return vectors, counts

    def udf(self):
        cfg = self

        @pandas_udf(ArrayType(FloatType()))
        def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in batches:
                m, _ = cfg._embed_batches(s.fillna("").tolist())
                yield pd.Series(list(m))

        return embed

    def usage_udf(self):
        cfg = self

        @pandas_udf(EMBEDDING_USAGE_TYPE)
        def embed_usage(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            for s in batches:
                m, counts = cfg._embed_batches(s.fillna("").tolist())
                yield pd.DataFrame({"vector": list(m), "token_count": counts})

        return embed_usage


def embed_column(text_col: Column | str, embedder=None) -> Column:
    """Convenience: vectorize a text column with the given embedder
    (default: deterministic local HashNgramEmbedder, 1536 dims)."""
    from pyspark.sql import functions as F

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if embedder is None:
        embedder = HashNgramEmbedder()
    return embedder.udf()(c)
