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
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIMS = 1536


class HashNgramEmbedder:
    """Deterministic char-ngram hashing embedder (unit-norm output).

    embed(texts) vectorized in numpy; `udf(dims)` returns a pandas UDF column
    factory usable in any DataFrame plan.
    """

    def __init__(self, dims: int = DEFAULT_DIMS, ngram: tuple[int, int] = (3, 5), seed: int = 42):
        self.dims = dims
        self.ngram = ngram
        self.seed = seed

    def embed_numpy(self, texts: Sequence[str]) -> np.ndarray:
        dims = self.dims
        lo, hi = self.ngram
        out = np.zeros((len(texts), dims), dtype=np.float32)
        for i, t in enumerate(texts):
            t = t or ""
            b = t.encode("utf-8", "ignore")
            if not b:
                out[i, 0] = 1.0
                continue
            acc = out[i]
            for n in range(lo, hi + 1):
                if len(b) < n:
                    continue
                for j in range(len(b) - n + 1):
                    # FNV-1a over the n-gram; bucket + sign from the hash
                    h = 2166136261
                    for ch in b[j : j + n]:
                        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
                    acc[h % dims] += 1.0 if (h >> 31) else -1.0
            norm = np.linalg.norm(acc)
            if norm > 0:
                acc /= norm
        return out

    def udf(self):
        dims, ngram, seed = self.dims, self.ngram, self.seed

        @pandas_udf(ArrayType(FloatType()))
        def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            emb = HashNgramEmbedder(dims, ngram, seed)
            for s in batches:
                m = emb.embed_numpy(s.fillna("").tolist())
                yield pd.Series(list(m))

        return embed


class RemoteEmbedder:
    """Production embedding source shape (stubbed transport).

    Mirrors the reference's retry policy (OpenAiService.cs:97-105):
    `max_retries` attempts, exponential backoff from `base_delay_s`. The
    transport (`_call_api`) raises NotImplementedError here — no network in
    this container — but batching/retry/partition plumbing is real and
    tested by injecting a fake transport.
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

    def _embed_with_retry(self, texts: list[str]) -> np.ndarray:
        delay = self.base_delay_s
        for attempt in range(self.max_retries):
            try:
                return self._call_api(texts)
            except NotImplementedError:
                raise
            except Exception:
                if attempt == self.max_retries - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        raise RuntimeError("unreachable")

    def udf(self):
        cfg = self

        @pandas_udf(ArrayType(FloatType()))
        def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in batches:
                texts = s.fillna("").tolist()
                chunks = [
                    cfg._embed_with_retry(texts[i : i + cfg.batch_size])
                    for i in range(0, len(texts), cfg.batch_size)
                ]
                m = np.vstack(chunks) if chunks else np.zeros((0, cfg.dims), np.float32)
                yield pd.Series(list(m.astype(np.float32)))

        return embed


def embed_column(text_col: Column | str, embedder=None) -> Column:
    """Convenience: vectorize a text column with the given embedder
    (default: deterministic local HashNgramEmbedder, 1536 dims)."""
    from pyspark.sql import functions as F

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if embedder is None:
        embedder = HashNgramEmbedder()
    return embedder.udf()(c)
