"""Quality classifier (operators/quality_classifier.py): feature parity,
hand-computed sigmoid scoring, MLlib fit round-trip, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import quality_classifier as QC


def test_hand_computed_score(spark):
    docs = spark.createDataFrame([(1, "the of and to a in is it")], ["doc_id", "text"])
    feats = QC.featurize(docs).first()
    model = {
        "weights": {"n_words": 0.5, "stopword_ratio": -2.0},
        "bias": 0.25,
    }
    z = 0.25 + 0.5 * feats.n_words - 2.0 * feats.stopword_ratio
    got = QC.score_quality(docs, model).first().quality_prob
    assert got == pytest.approx(QC.sigmoid(z), rel=1e-12)


def test_standardization_applied(spark):
    docs = spark.createDataFrame([(1, "alpha beta gamma delta")], ["doc_id", "text"])
    model = {
        "weights": {"n_words": 1.0},
        "bias": 0.0,
        "means": {"n_words": 4.0},
        "stds": {"n_words": 2.0},
    }
    # n_words = 4 -> z = (4-4)/2 = 0 -> prob 0.5 exactly
    assert QC.score_quality(docs, model).first().quality_prob == pytest.approx(0.5)


def test_unknown_feature_rejected(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        QC.score_quality(docs, {"weights": {"nonexistent": 1.0}})


def test_fit_separates_quality_classes(spark):
    # class 1: english-looking prose; class 0: repetitive punctuation junk
    good = [
        (i, "the quick brown fox jumps over the lazy dog and runs far away", 1)
        for i in range(20)
    ]
    bad = [
        (100 + i, "$$$ !!! ### " * 10 + "zzz zzz zzz zzz zzz", 0) for i in range(20)
    ]
    labeled = spark.createDataFrame(good + bad, ["doc_id", "text", "label"])
    model = QC.fit_quality_classifier(labeled)
    assert set(model["weights"]) == set(QC.FEATURES)
    scored = {r.doc_id: r.quality_prob for r in QC.score_quality(labeled, model).collect()}
    good_avg = sum(scored[i] for i, _, _ in good) / len(good)
    bad_avg = sum(scored[i] for i, _, _ in bad) / len(bad)
    assert good_avg > 0.9 > 0.1 > bad_avg


def test_fit_fraction_and_determinism(spark, tables):
    docs = tables["documents"].withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("int")
    )
    m1 = QC.fit_quality_classifier(docs, fit_fraction=0.5, seed=7)
    m2 = QC.fit_quality_classifier(docs, fit_fraction=0.5, seed=7)
    assert m1 == m2


def test_scoring_is_pure_codegen(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    model = {"weights": {c: 0.1 for c in QC.FEATURES}, "bias": -0.5}
    rep = plan_report(QC.score_quality(tables["documents"], model))
    assert rep.python_evals == 0
    assert rep.exchanges == 0  # map-only: scan -> project, nothing wide
