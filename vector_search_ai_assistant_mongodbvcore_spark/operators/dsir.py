"""DSIR — Data Selection via Importance Resampling (arXiv:2302.03169).

Scores every raw-corpus document by how target-domain-like it is under a
pair of bag-of-hashed-n-gram unigram language models, then resamples the
corpus with Gumbel-top-k on the importance weights. This is the data-
selection operator a pretraining pipeline runs between raw ingest and
mixture planning: "keep the 10% of the crawl that looks like Wikipedia".

The reference app has no analog (its corpus is a curated retail sample);
the operator follows the published recipe:

  * features: hashed word unigrams + bigrams, `num_buckets` buckets
    (paper: 10k buckets over uni+bi-grams).
  * bucket LMs: additive (Laplace) smoothing with `alpha`,
    p_b = (c_b + alpha) / (T + alpha * B) for target and raw separately.
  * log importance weight of doc i: log w_i = sum_b c_ib * lambda_b with
    lambda_b = log p_target(b) - log p_raw(b).
  * selection: top-k on log w_i / temperature + Gumbel(0,1) noise, the
    paper's importance-resampling-without-replacement trick.

Scale shape (the part that must survive 100 TB):
  * the per-bucket count tables are bounded by `num_buckets` rows no
    matter the corpus size — map-side-combined hash aggregates.
  * fit() therefore ends with a lambda table small enough to collect;
    serving inlines it as a literal map and scores each document with a
    single codegen'd F.aggregate over its gram array — a map-only plan
    with ZERO shuffles, the same fit-small/serve-narrow split the
    quality classifier uses. (For num_buckets too large to inline there
    is a broadcast-join serving path.)
  * Gumbel top-k is `TakeOrderedAndProject` — no global sort.

Determinism (so the DuckDB oracle hash-matches): gram hashing is
md5-based (portable, no murmur3); lambda is rounded to `lam_decimals`
and carried as an exact integer in micro-units (lambda * 10^6 as long),
so per-doc sums are order-independent long additions in both engines;
the Gumbel uniform is the md5 bucket of (seed, doc_id) — not an RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.text import words

__all__ = [
    "gram_array",
    "hashed_gram_buckets",
    "fit_lambda",
    "importance_weights",
    "gumbel_resample",
]

_LAM_DECIMALS = 6
_MICRO = 10 ** _LAM_DECIMALS


def gram_array(text_col: Column | str, num_buckets: int) -> Column:
    """array<long> of hashed (unigram + bigram) buckets for one document.

    Portable 32-bit md5 bucket per gram, reduced mod `num_buckets` —
    DuckDB twin: CAST('0x' || substr(md5(g), 1, 8) AS UBIGINT) % B.
    Empty/NULL text -> empty array. Pure column expression (no shuffle,
    no UDF).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # NULL text == empty text: no grams (mirrors hashed_gram_buckets, where
    # exploding a NULL array simply yields no rows).
    w = words(F.lower(F.coalesce(c, F.lit(""))))
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(w, bigrams),
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % num_buckets,
    )


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
) -> DataFrame:
    """Explode each document into (id_col, bucket) gram-occurrence rows —
    the raw material for the bucket LMs. Narrow plan: the explode runs in
    the scan's stage."""
    return df.select(
        F.col(id_col), F.explode(gram_array(text_col, num_buckets)).alias("bucket")
    )


def fit_lambda(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 10_000,
    alpha: float = 1.0,
) -> dict[int, int]:
    """Fit the two bucket LMs and return {bucket: lambda_micro} — the
    rounded log-likelihood-ratio per bucket in 1e-6 units, for buckets
    observed on either side (unseen buckets never occur in any doc).

    Both count tables are bounded by `num_buckets` rows; collecting the
    joined result is a driver transfer of <= num_buckets (bucket, long)
    pairs regardless of corpus size.
    """
    raw_counts = (
        hashed_gram_buckets(df.select(F.lit(0).alias("_i"), text_col), "_i", text_col, num_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_raw"))
    )
    tgt_counts = (
        hashed_gram_buckets(target.select(F.lit(0).alias("_i"), text_col), "_i", text_col, num_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    joined = raw_counts.join(tgt_counts, "bucket", "outer").select(
        "bucket",
        F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
        F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
    )
    rows = joined.collect()
    t_raw = sum(r["c_raw"] for r in rows)
    t_tgt = sum(r["c_tgt"] for r in rows)
    denom_raw = float(t_raw) + alpha * num_buckets
    denom_tgt = float(t_tgt) + alpha * num_buckets

    import math

    out: dict[int, int] = {}
    for r in rows:
        lam = math.log((r["c_tgt"] + alpha) / denom_tgt) - math.log(
            (r["c_raw"] + alpha) / denom_raw
        )
        out[int(r["bucket"])] = int(round(round(lam, _LAM_DECIMALS) * _MICRO))
    return out


def importance_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    alpha: float = 1.0,
    serve: str = "inline",
) -> DataFrame:
    """Attach the DSIR log importance weight to every row of `df`.

    `target` is the (usually much smaller) target-domain sample; only its
    `text_col` is read. Output: df columns + `logw` (double). Docs with
    no grams (empty/NULL text) get logw = 0.0 — an empty product, i.e.
    "no evidence either way".

    serve='inline' (default): the fitted lambda table is inlined as a
    literal map and each doc is scored by one F.aggregate over its gram
    array — map-only, zero-shuffle serving. serve='join': exploded grams
    broadcast-join the lambda table and re-aggregate per doc (one keyed
    shuffle) — for num_buckets too large to inline in the plan.
    """
    lam = fit_lambda(df, target, text_col, num_buckets, alpha)

    if serve == "inline":
        if lam:
            items: list[Column] = []
            for b, m in sorted(lam.items()):
                items.append(F.lit(b).cast("long"))
                items.append(F.lit(m).cast("long"))
            lam_map = F.create_map(*items)
            micro_sum = F.aggregate(
                gram_array(text_col, num_buckets),
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.coalesce(F.element_at(lam_map, b), F.lit(0).cast("long")),
            )
        else:
            micro_sum = F.lit(0).cast("long")
        return df.withColumn(
            "logw", (micro_sum.cast("double") / F.lit(float(_MICRO)))
        )

    if serve != "join":
        raise ValueError(f"serve must be 'inline' or 'join', got {serve!r}")

    spark = df.sparkSession
    lam_df = spark.createDataFrame(
        [(b, m) for b, m in sorted(lam.items())], "bucket long, lam_micro long"
    )
    doc_sums = (
        hashed_gram_buckets(df, id_col, text_col, num_buckets)
        .join(F.broadcast(lam_df), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lam_micro").alias("_micro"))
    )
    return (
        df.join(doc_sums, id_col, "left")
        .withColumn(
            "logw",
            F.coalesce(F.col("_micro").cast("double") / F.lit(float(_MICRO)), F.lit(0.0)),
        )
        .drop("_micro")
    )


def gumbel_resample(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    seed: int = 42,
    temperature: float = 1.0,
) -> DataFrame:
    """Importance-resample k docs without replacement (Gumbel-top-k).

    key_i = logw_i / temperature + g_i with g_i = -ln(-ln(u_i)) and u_i a
    deterministic md5-derived uniform in (0,1) — reproducible across runs,
    engines and partitionings (no RNG state). Top-k executes as
    TakeOrderedAndProject: per-partition heaps, no global sort.
    """
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import split_bucket

    u = (split_bucket(F.col(id_col), seed=seed) + F.lit(0.5)) / F.lit(float(1 << 32))
    g = -F.log(-F.log(u))
    key = F.col(logw_col) / F.lit(float(temperature)) + g
    return (
        weighted.withColumn("_gumbel_key", key)
        .orderBy(F.col("_gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_gumbel_key")
    )
