"""Bigram LM perplexity scoring (operators/lm_quality.py)."""

from __future__ import annotations

import math

import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.lm_quality import (
    fit_bigram_lm,
    score_perplexity,
)

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "the cat ran to the dog"),
]


@pytest.fixture(scope="module")
def lm(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return fit_bigram_lm(docs, vocab_size=50, alpha=0.1)


def test_hand_computed_probability(spark, lm):
    """Score a doc that is exactly one training bigram and check the add-α
    arithmetic end to end."""
    probe = spark.createDataFrame([(0, "the cat")], "doc_id long, text string")
    row = score_perplexity(probe, lm).collect()[0]
    # c("the","cat") = 2; c1("the") = count of "the" as w1 in training pairs
    uni = {r["w1"]: r["c1"] for r in lm.unigrams.collect()}
    bi = {(r["w1"], r["w2"]): r["c2"] for r in lm.bigrams.collect()}
    p = (bi[("the", "cat")] + 0.1) / (uni["the"] + 0.1 * lm.vocab_size)
    assert row["n_bigrams"] == 1
    assert row["perplexity"] == pytest.approx(math.exp(-math.log(p)))


def test_in_domain_beats_gibberish(spark, lm):
    probe = spark.createDataFrame(
        [(0, "the cat sat on the rug"), (1, "zephyr qux glorble wibble frob")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["perplexity"] for r in score_perplexity(probe, lm).collect()}
    assert got[0] < got[1]


def test_short_docs_absent(spark, lm):
    probe = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, "two words")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in score_perplexity(probe, lm).collect()}
    assert ids == {2}


def test_deterministic_with_sampling(spark, tables):
    docs = tables["documents"]
    a = fit_bigram_lm(docs, vocab_size=500, sample_fraction=0.5, seed=7)
    b = fit_bigram_lm(docs, vocab_size=500, sample_fraction=0.5, seed=7)
    sa = {r["doc_id"]: r["perplexity"] for r in score_perplexity(docs.limit(50), a).collect()}
    sb = {r["doc_id"]: r["perplexity"] for r in score_perplexity(docs.limit(50), b).collect()}
    assert sa == sb


def test_real_corpus_scores_finite(spark, tables):
    docs = tables["documents"]
    lm2 = fit_bigram_lm(docs, vocab_size=1000, sample_fraction=0.5)
    rows = score_perplexity(docs, lm2).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["perplexity"] > 0 and math.isfinite(r["perplexity"])
