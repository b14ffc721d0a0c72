"""Language-model perplexity quality scoring (the CCNet recipe family):
fit a small n-gram LM on an in-domain sample, score every document by
perplexity, filter or bucket on the score.

Published pipelines do this with KenLM on Wikipedia; the Spark-first
equivalent keeps both phases declarative:

  fit_bigram_lm    ONE pass over a SAMPLE: top-V vocabulary by unigram
                   count (everything else folds to <unk>), unigram +
                   bigram count tables — three keyed aggregates over the
                   sampled token stream, each bounded by V / V² rows.
                   The model IS two small DataFrames; nothing collects to
                   the driver.
  score_perplexity per-doc perplexity = exp(-avg log P(w2|w1)) with add-α
                   smoothing: explode each doc's adjacent word pairs, map
                   both sides through the vocab (broadcast join), join the
                   count tables (broadcast), one groupBy(doc) average.
                   Docs with < 2 words get NULL (no bigram evidence).

Scale: the fit tables are size-capped by construction (top-V vocab); the
scoring pass is the usual explode -> broadcast joins -> per-doc aggregate,
shuffling one row per document at the end. Smoothing: P(w2|w1) =
(c(w1,w2) + α) / (c(w1) + α·(V+1)) — every probability positive, unseen
bigrams pay the α floor, <unk> is the (V+1)-th vocabulary entry.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"


def _word_pairs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) for adjacent lowercase-alnum token pairs — the same
    posexplode + self-zip trick as chunking, no window, no shuffle."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import tokenize

    toks = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("_w")).filter(
        F.size("_w") >= 2
    )
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_w", 1, F.size("_w") - 1),
                F.slice("_w", 2, F.size("_w") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    )
    return pairs.select(id_col, "p.w1", "p.w2")


@dataclass
class BigramLm:
    vocab: DataFrame      # (word,)            top-V by count
    unigrams: DataFrame   # (w1, c1)           vocab-mapped counts incl. <unk>
    bigrams: DataFrame    # (w1, w2, c2)       vocab-mapped counts
    vocab_size: int       # V + 1 (the <unk> slot)
    alpha: float


def fit_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 10_000,
    sample_fraction: float | None = None,
    alpha: float = 0.1,
    seed: int = 42,
) -> BigramLm:
    """Fit on (a sample of) `docs`. At 100 TB always pass sample_fraction —
    the model only needs representative counts, exactly the IVF
    fit_fraction argument."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import tokenize

    fit = (
        docs.sample(fraction=sample_fraction, seed=seed)
        if sample_fraction is not None and sample_fraction < 1.0
        else docs
    )
    words = fit.select(F.explode(tokenize(F.col(text_col))).alias("w"))
    vocab = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(vocab_size)
        .select(F.col("w").alias("word"))
    )
    pairs = _word_pairs(fit, text_col, id_col)
    mapped = _map_unk(pairs, vocab)
    unigrams = mapped.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bigrams = mapped.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return BigramLm(
        vocab=vocab,
        unigrams=unigrams,
        bigrams=bigrams,
        vocab_size=vocab_size + 1,
        alpha=alpha,
    )


def _map_unk(pairs: DataFrame, vocab: DataFrame) -> DataFrame:
    v1 = F.broadcast(vocab.select(F.col("word").alias("w1"), F.lit(1).alias("_in1")))
    v2 = F.broadcast(vocab.select(F.col("word").alias("w2"), F.lit(1).alias("_in2")))
    return (
        pairs.join(v1, "w1", "left")
        .join(v2, "w2", "left")
        .select(
            *[c for c in pairs.columns if c not in ("w1", "w2")],
            F.when(F.col("_in1").isNotNull(), F.col("w1")).otherwise(UNK).alias("w1"),
            F.when(F.col("_in2").isNotNull(), F.col("w2")).otherwise(UNK).alias("w2"),
        )
    )


DEFAULT_MAX_BROADCAST_BIGRAMS = 2_000_000  # ~50 MB of (str, str, long) rows


def score_perplexity(
    docs: DataFrame,
    lm: BigramLm,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_bigrams: int | None = DEFAULT_MAX_BROADCAST_BIGRAMS,
) -> DataFrame:
    """(id, n_bigrams, perplexity): exp(-mean log P) per document; lower is
    more in-domain. Docs with < 2 tokens are absent from the result.

    The bigram table is bounded only by observed bigrams in the fit sample
    (worst case V², V=10k -> 1e8 rows) — far past broadcast limits on a
    large in-domain sample, so it is NOT broadcast unconditionally: if its
    row count exceeds `max_broadcast_bigrams` the table is truncated to the
    top-M bigrams by count before broadcasting. Truncation only perturbs
    rare-bigram mass: a dropped (w1, w2) scores as unseen and pays the
    α floor — the same floor every genuinely-unseen bigram already pays —
    so scores stay finite and the head of the distribution (which carries
    the perplexity signal) is exact. Pass None to broadcast the full table
    (only when the caller KNOWS the fit sample is small). The unigram table
    is vocab-bounded (≤ V+1 rows) and always broadcasts."""
    pairs = _map_unk(_word_pairs(docs, text_col, id_col), lm.vocab)
    bigrams = lm.bigrams
    if max_broadcast_bigrams is not None:
        n_bigrams = bigrams.count()
        if n_bigrams > max_broadcast_bigrams:
            bigrams = (
                bigrams.orderBy(F.col("c2").desc(), "w1", "w2")
                .limit(max_broadcast_bigrams)
            )
    scored = (
        pairs.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(lm.unigrams), "w1", "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + lm.alpha)
                / (F.coalesce(F.col("c1"), F.lit(0)) + lm.alpha * lm.vocab_size)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.exp(-F.avg("_lp")).alias("perplexity"),
    )
