"""Linear quality classifier over engineered text features — the
fastText-style "does this look like reference text?" scorer every
large-scale corpus pipeline runs (CCNet, GPT-3's WebText classifier,
RefinedWeb), minus the external model artifact.

Not in the reference; part of the extended LLM-training-pipeline surface.
Two halves:

  featurize(df)           the engine's quality signals as ONE narrow
                          projection: word/char counts, avg word length,
                          punct/stopword ratios, repetition fractions —
                          pure codegen column exprs (functions/text.py),
                          zero shuffle, zero UDF.
  score_quality(df, w)    sigmoid(w . x + b) written out as column
                          arithmetic with the weights inlined as literals
                          — the model is broadcast BY THE PLAN (constants
                          in the codegen'd expression), so scoring is a
                          map-only pass at any corpus size.
  fit_quality_classifier  MLlib LogisticRegression on a labeled sample
                          (fit_fraction caps the fit input exactly like
                          topics/ivf); returns the plain python weight
                          dict score_quality consumes — nothing of MLlib
                          survives into the serving plan.

Standardization: features are z-scored with means/stds captured at fit
time and inlined as literals too, so serve-time distributions can drift
without silently rescaling the model.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX

FEATURES = (
    "n_words",
    "avg_word_len",
    "punct_ratio",
    "stopword_ratio",
    "dup_line_frac",
    "rep_word_frac",
)


def featurize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id_col, *FEATURES): the quality feature vector as plain columns."""
    return df.select(
        F.col(id_col),
        TX.word_count(text_col).cast("double").alias("n_words"),
        TX.avg_word_length(text_col).alias("avg_word_len"),
        TX.punct_ratio(text_col).alias("punct_ratio"),
        TX.stopword_ratio(text_col).alias("stopword_ratio"),
        TX.duplicate_line_fraction(text_col).alias("dup_line_frac"),
        TX.repeated_word_fraction(text_col).alias("rep_word_frac"),
    )


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, quality_prob): P(high quality) per doc.

    `model` = {"weights": {feature: w}, "bias": b,
               "means": {feature: m}, "stds": {feature: s}}
    (means/stds optional — identity standardization when absent).
    The whole scorer is one codegen expression; nothing leaves the JVM."""
    weights = model["weights"]
    bias = float(model.get("bias", 0.0))
    means = model.get("means", {})
    stds = model.get("stds", {})
    unknown = set(weights) - set(FEATURES)
    if unknown:
        raise ValueError(f"unknown features {sorted(unknown)}; valid: {FEATURES}")
    feats = featurize(df, text_col, id_col)
    z = F.lit(bias)
    for name, w in weights.items():
        m = float(means.get(name, 0.0))
        s = float(stds.get(name, 1.0)) or 1.0
        z = z + F.lit(float(w)) * ((F.col(name) - F.lit(m)) / F.lit(s))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(F.col(id_col), prob.alias("quality_prob"))


def fit_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    fit_fraction: float | None = None,
    seed: int = 42,
    reg_param: float = 0.0,
    max_iter: int = 50,
) -> dict:
    """Fit the linear model on (text, 0/1 label) rows; returns the plain
    model dict for score_quality. The fit collects nothing but the final
    coefficients (driver-side: len(FEATURES) floats + 2 stat rows); at
    100 TB fit_fraction bounds the iterative MLlib input."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = featurize(labeled, text_col, id_col).join(
        labeled.select(id_col, F.col(label_col).cast("double").alias("_y")), id_col
    )
    if fit_fraction is not None and fit_fraction < 1.0:
        feats = feats.sample(fraction=fit_fraction, seed=seed)
    stats_row = feats.select(
        *[F.avg(c).alias(f"m_{c}") for c in FEATURES],
        *[F.coalesce(F.stddev_pop(c), F.lit(1.0)).alias(f"s_{c}") for c in FEATURES],
    ).first()
    means = {c: float(stats_row[f"m_{c}"]) for c in FEATURES}
    stds = {c: (float(stats_row[f"s_{c}"]) or 1.0) for c in FEATURES}
    std_cols = [
        ((F.col(c) - F.lit(means[c])) / F.lit(stds[c])).alias(c) for c in FEATURES
    ]
    prepped = feats.select(*std_cols, "_y")
    asm = VectorAssembler(inputCols=list(FEATURES), outputCol="_x")
    lr = LogisticRegression(
        featuresCol="_x", labelCol="_y", regParam=reg_param, maxIter=max_iter
    )
    fitted = lr.fit(asm.transform(prepped))
    coef = fitted.coefficients.toArray()
    return {
        "weights": {c: float(w) for c, w in zip(FEATURES, coef)},
        "bias": float(fitted.intercept),
        "means": means,
        "stds": stds,
    }


def sigmoid(x: float) -> float:
    """Python twin of the serving expression (tests)."""
    return 1.0 / (1.0 + math.exp(-x))
