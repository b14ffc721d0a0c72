"""Product quantization (PQ) for the vector-serving tier: compress
embeddings to m sub-codes and serve top-k with asymmetric distance
computation (ADC) — Jégou et al. 2011 ("Product quantization for nearest
neighbor search"), the codebook layout behind FAISS IVF-PQ.

Where int8 quantization (functions/vector.py quantize_int8) cuts vector
IO 4x, PQ cuts it 16-64x: a 64-dim float32 vector (256 B) becomes m=8
one-byte codes (8 B) at 32x. The price is coarser scores, so PQ serves
the same role here as everywhere: candidate generation, with exact
rerank on the full vectors for the short list (operators/rerank.py /
the IVF index's quantized-rerank pattern).

Cosine is served exactly in ADC form by L2-normalizing vectors BEFORE
codebook fit and encoding: cosine(q, x) = <q/|q|, x/|x|>, and the inner
product decomposes over subspaces as sum_j <q_j, c_j(code_j)> — so one
m x k lookup table per query replaces every per-vector float read.

Scale shape:
  * fit: per-subspace Lloyd KMeans runs on the DRIVER over a bounded,
    deterministic md5-sampled collect (<= max_sample rows; codebooks are
    m * k * (dims/m) floats — KBs). Same sampled-fit discipline as the
    IVF index.
  * encode: one Arrow-batched mapInPandas pass, narrow (no shuffle);
    codes persist wherever the corpus lives and are 16-64x smaller than
    the vectors they replace.
  * serve: the query's LUT broadcasts inside a pandas_udf closure (m*k
    floats); scoring is a numpy gather + sum per batch, then
    TakeOrderedAndProject top-k — per-query cost scans CODES, never the
    float vectors.

No registry slot: KMeans codebooks are approximate by construction, so
this could only ever be a rows-only gate row (the same reason
ivf_search_pruned was retired); exactness properties that CAN be pinned
are pytest-pinned instead (encode parity with numpy, ADC == table
lookup, recall floor vs exact cosine, determinism across partitionings).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import stack_vectors

__all__ = ["fit_pq", "encode_pq", "adc_topk", "pq_model_bytes", "pq_encode_col", "adc_score_col"]


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Deterministic Lloyd KMeans (numpy): seeded sample init, empty
    clusters re-seeded from the farthest points. x: (n, d) -> (k, d).

    Distances use the |x|^2 - 2 x@c.T + |c|^2 matmul form (same as
    encode_pq): O(n*k) memory per iteration. The 3-D broadcast form
    allocates n*k*dsub float64 temporaries — ~1.6 GB per temporary at
    the documented defaults (n=100k, k=256, dsub=8), a driver OOM at
    exactly the scale this module claims to support."""
    rng = np.random.RandomState(seed)
    n = x.shape[0]
    if n == 0:
        raise ValueError("cannot fit PQ codebook on zero sample rows")
    init = rng.choice(n, size=min(k, n), replace=False)
    cents = x[init].copy()
    if cents.shape[0] < k:  # fewer points than centroids: pad with jitter
        pad = cents[rng.choice(cents.shape[0], k - cents.shape[0])]
        cents = np.vstack([cents, pad + rng.normal(0, 1e-6, pad.shape)])
    x2 = (x * x).sum(axis=1)[:, None]
    for _ in range(iters):
        c2 = (cents * cents).sum(axis=1)[None, :]
        d2 = x2 - 2.0 * (x @ cents.T) + c2
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
            else:
                cents[j] = x[d2.min(axis=1).argmax()]
    return cents


def fit_pq(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    bits: int = 8,
    seed: int = 42,
    max_sample: int = 100_000,
    iters: int = 20,
    overshoot_sigmas: float = 6.0,
) -> dict:
    """Fit per-subspace codebooks on a bounded deterministic sample.

    Returns {"m", "bits", "dims", "codebooks"} with codebooks an
    m x 2^bits x (dims/m) nested list (JSON-serializable; KBs). Vectors
    are L2-normalized before fitting so ADC scores approximate cosine.
    The sample is the smallest-bucket prefix under the stage-namespaced
    md5 hash (id tiebreak) — a uniform draw, stable across runs and
    partitionings, never a full collect: the only driver transfer is
    <= max_sample vectors. A keep-rate prefilter bounds the sort input
    with an overshoot margin of `overshoot_sigmas` binomial standard
    deviations (same guard as splits.cap_per_group; failure probability
    ~1e-9 at the default 6); if the margin still randomly undershoots
    min(n, max_sample) survivors the fit raises (deterministically,
    naming the knob) instead of silently training codebooks on a
    thinner sample.
    """
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import split_bucket

    clean = df.filter(F.col(vector_col).isNotNull())
    n = clean.count()
    if n == 0:
        raise ValueError("cannot fit PQ on an empty vector table")
    bucket = split_bucket(F.col(id_col), seed=seed, stage="pq")
    if n > max_sample:
        # keep-rate prefilter on the portable bucket; over-draw then
        # exact bucket-order truncation keeps the sample deterministic
        # AND equal to the global smallest-bucket prefix whenever enough
        # rows survive (checked below)
        import math as _math

        want = max_sample + overshoot_sigmas * _math.sqrt(max_sample) + 10
        rate = min(1.0, want / n)
        clean = clean.filter(bucket < int(rate * (1 << 32)))
        survivors = clean.count()
        if survivors < min(n, max_sample):
            raise ValueError(
                f"pq sample prefilter undershoot ({survivors} < "
                f"{min(n, max_sample)}); raise overshoot_sigmas"
            )
    rows = (
        clean.select(id_col, vector_col)
        .orderBy(bucket.asc(), F.col(id_col).asc())
        .limit(max_sample)
        .collect()
    )
    mat = _normalize_rows(
        np.array([r[vector_col] for r in rows], dtype=np.float64)
    )
    dims = mat.shape[1]
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    k = 1 << bits
    codebooks = [
        _lloyd(mat[:, j * dsub : (j + 1) * dsub], k, seed=seed + j, iters=iters)
        for j in range(m)
    ]
    return {
        "m": m,
        "bits": bits,
        "dims": dims,
        "codebooks": [cb.tolist() for cb in codebooks],
    }


def pq_model_bytes(model: dict) -> int:
    """Serialized codebook size in bytes (float32) — the broadcast cost."""
    return model["m"] * (1 << model["bits"]) * (model["dims"] // model["m"]) * 4


def encode_pq(
    df: DataFrame,
    model: dict,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, codes array<int>) — one narrow Arrow pass; NULL vectors
    are dropped (they cannot be searched). Codes are the per-subspace
    argmin centroid over the L2-normalized vector."""
    cbs = [np.array(cb, dtype=np.float64) for cb in model["codebooks"]]
    m, dims = model["m"], model["dims"]
    dsub = dims // m
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize_rows(stack_vectors(pdf[vector_col], dims=dims))
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                # (n, k) distances via |x|^2 - 2 x.c + |c|^2; |x|^2 constant per argmin
                d = -2.0 * sub @ cbs[j].T + (cbs[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col].values, "codes": list(codes)})

    clean = df.filter(F.col(vector_col).isNotNull()).select(id_col, vector_col)
    return (
        clean.mapInPandas(encode, out_schema)
        .withColumnRenamed("id", id_col)
    )


def adc_topk(
    encoded: DataFrame,
    model: dict,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    round_scores: int = 6,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes (asymmetric distance
    computation): build the query's m x 2^bits inner-product lookup
    table once, score every code row with a numpy gather, and take the
    global top-k via TakeOrderedAndProject. Output: (id_col, score).

    Scores round to `round_scores` with an id tiebreak so results are
    deterministic across partitionings."""
    q = np.asarray(list(query), dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    m, dims = model["m"], model["dims"]
    dsub = dims // m
    lut = np.stack(
        [
            np.array(model["codebooks"][j], dtype=np.float64)
            @ q[j * dsub : (j + 1) * dsub]
            for j in range(m)
        ]
    )  # (m, k)

    @F.pandas_udf(T.DoubleType())
    def adc(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.values).astype(np.int64)  # (n, m)
        return pd.Series(lut[np.arange(m)[None, :], c].sum(axis=1))

    return (
        encoded.select(id_col, F.round(adc(F.col("codes")), round_scores).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_encode_col(model: dict, vector_col) -> "F.Column":
    """Column form of encode_pq for embedding PQ codes inside another
    operator's projection (IvfIndex build/add): array<int> codes from the
    broadcast codebooks, one Arrow batch at a time. NULL vectors -> NULL
    codes (callers decide their policy)."""
    cbs = [np.array(cb, dtype=np.float64) for cb in model["codebooks"]]
    m, dims = model["m"], model["dims"]
    dsub = dims // m

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(v: pd.Series) -> pd.Series:
        mask = v.notna().values
        vals: list = [None] * len(v)
        if mask.any():
            mat = _normalize_rows(stack_vectors(v[mask], dims=dims))
            codes = np.empty((mask.sum(), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d = -2.0 * sub @ cbs[j].T + (cbs[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d.argmin(axis=1)
            it = iter(codes)
            for i, ok in enumerate(mask):
                if ok:
                    vals[i] = [int(x) for x in next(it)]
        return pd.Series(vals, dtype=object)

    c = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    return enc(c)


def adc_score_col(model: dict, query: Sequence[float], codes_col) -> "F.Column":
    """Column form of the ADC score: the query's LUT closes over the UDF
    and each batch is one numpy gather+sum. Compose with the caller's own
    ordering/limit."""
    q = np.asarray(list(query), dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    m, dims = model["m"], model["dims"]
    dsub = dims // m
    lut = np.stack(
        [
            np.array(model["codebooks"][j], dtype=np.float64)
            @ q[j * dsub : (j + 1) * dsub]
            for j in range(m)
        ]
    )

    @F.pandas_udf(T.DoubleType())
    def sc(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.values).astype(np.int64)
        return pd.Series(lut[np.arange(m)[None, :], c].sum(axis=1))

    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return sc(c)
