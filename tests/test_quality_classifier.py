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


# ---------------------------------------------------------------------------
# Hashed char n-gram features (r7)
# ---------------------------------------------------------------------------


def test_bucket_python_twin_matches_spark(spark):
    """_py_bucket (used by the fit UDF) must equal the serving expression's
    _bucket bit-for-bit — the portable-md5 contract."""
    samples = ["abc", "the", " qu", "x z", "héllo"[:3], "123", "!?.", "a b"]
    df = spark.createDataFrame([(s,) for s in samples], ["ng"])
    got = {
        r.ng: r.b
        for r in df.select("ng", QC._bucket(F.col("ng"), 257).alias("b")).collect()
    }
    for s in samples:
        assert got[s] == QC._py_bucket(s, 257), s


def test_char_ngrams_expression_matches_python(spark):
    texts = ["The quick  brown\tfox", "", "ab", "  x  "]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {
        r.doc_id: r.ngs
        for r in df.select("doc_id", QC.char_ngrams("text").alias("ngs")).collect()
    }
    for i, t in enumerate(texts):
        norm = " ".join(t.lower().split())
        want = []
        for n in range(3, 6):
            want += [norm[j : j + n] for j in range(len(norm) - n + 1)]
        assert got[i] == want, (i, norm)


def test_hashed_dot_hand_computed(spark):
    """w . x on a tiny vocab: the fold over occurrences / total equals the
    explicit normalized-bag dot product."""
    dims = 31
    text = "abcd"
    norm = text  # already normalized
    ngrams = [norm[i : i + n] for n in range(3, 6) for i in range(len(norm) - n + 1)]
    w = [0.0] * dims
    import random

    rnd = random.Random(5)
    for j in range(dims):
        w[j] = rnd.uniform(-1, 1)
    want = sum(w[QC._py_bucket(g, dims)] for g in ngrams) / len(ngrams)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = df.select(QC.hashed_ngram_dot("text", w).alias("d")).first().d
    assert got == pytest.approx(want, rel=1e-12)
    # empty text -> 0.0, not NULL/NaN
    empty = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    assert empty.select(QC.hashed_ngram_dot("text", w).alias("d")).first().d == 0.0


def _vocab_fixture(spark):
    """6-feature-blind quality split: identical shapes (word counts, word
    lengths, no punctuation, no repetition), different VOCABULARY — only
    character n-grams can tell these apart."""
    good_nouns = ["table", "chair", "house", "plant", "bread"]
    bad_nouns = ["xqzrv", "bpfkw", "vjqxz", "gzxqp", "qwzxv"]
    rows = []
    i = 0
    for nouns, label in ((good_nouns, 1), (bad_nouns, 0)):
        for a in nouns:
            for b in nouns:
                rows.append((i, f"the {a} is near the {b} and the {a}", label))
                i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_fit_serve_parity_with_mllib(spark):
    """Serving (inlined literals + hashed_ngram_dot fold) must reproduce
    the MLlib model's probabilities on the fit data itself."""
    from pyspark.ml.classification import LogisticRegression  # noqa: F401

    labeled = _vocab_fixture(spark)
    model = QC.fit_quality_classifier(labeled, ngram_dims=256, reg_param=0.01)
    got = {r.doc_id: r.quality_prob for r in QC.score_quality(labeled, model).collect()}
    # python twin: rebuild z per row from the model dict
    import math

    feats = {r.doc_id: r for r in QC.featurize(labeled, keep_cols=("text",)).collect()}
    for r in labeled.collect():
        f = feats[r.doc_id]
        z = model["bias"]
        for name, w in model["weights"].items():
            z += w * ((f[name] - model["means"][name]) / model["stds"][name])
        norm = " ".join(r.text.lower().split())
        ngs = [norm[j : j + n] for n in range(3, 6) for j in range(len(norm) - n + 1)]
        if ngs:
            z += sum(model["ngram_weights"][QC._py_bucket(g, 256)] for g in ngs) / len(ngs)
        assert got[r.doc_id] == pytest.approx(1.0 / (1.0 + math.exp(-z)), rel=1e-9)


def test_ngram_model_separates_where_aggregates_cannot(spark):
    """The measurable gain: on the vocabulary fixture the 6-feature model
    is at chance (every aggregate feature is identical across classes) while
    the hashed-n-gram model separates the classes completely."""
    labeled = _vocab_fixture(spark)
    base = QC.fit_quality_classifier(labeled, reg_param=0.01)
    ngram = QC.fit_quality_classifier(labeled, ngram_dims=256, reg_param=0.01)
    y = {r.doc_id: r.label for r in labeled.collect()}

    def min_margin(model):
        probs = {r.doc_id: r.quality_prob for r in QC.score_quality(labeled, model).collect()}
        lo_good = min(p for d, p in probs.items() if y[d] == 1)
        hi_bad = max(p for d, p in probs.items() if y[d] == 0)
        return lo_good - hi_bad

    assert min_margin(base) <= 0.01  # aggregates can't see vocabulary
    assert min_margin(ngram) > 0.2   # n-grams separate with a real margin


def test_ngram_serving_stays_codegen(spark, tables):
    """Serving plan with ngram weights: zero Exchange, zero Python nodes —
    the D-float weight array is inlined literals, the dot is a fold."""
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    model = {
        "weights": {c: 0.1 for c in QC.FEATURES},
        "bias": 0.0,
        "ngram_weights": [0.01] * 128,
        "ngram_range": [3, 5],
    }
    scored = QC.score_quality(tables["documents"], model)
    rep = plan_report(scored)
    assert rep.exchanges == 0
    assert rep.python_evals == 0
