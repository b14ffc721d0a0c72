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


def test_bigram_broadcast_bounded_on_adversarial_vocab(spark):
    """A corpus engineered for near-V² distinct bigrams: the broadcast-side
    table must be capped at max_broadcast_bigrams, scores stay finite, and
    truncation can only RAISE perplexity (dropped pairs fall to the α floor
    that unseen pairs already pay). With a cap above the table size the
    result is bit-identical to the uncapped path."""
    import itertools

    words = [f"w{i}" for i in range(60)]
    # every ordered pair appears exactly once -> 60*59 distinct bigrams
    text = " ".join(a + " " + b for a, b in itertools.permutations(words, 2))
    docs = spark.createDataFrame(
        [(0, text), (1, "w0 w1 w0 w1 w0 w1"), (2, "w5 w6 w5 w6")],
        "doc_id long, text string",
    )
    lm = fit_bigram_lm(docs, vocab_size=100)
    n_bigrams = lm.bigrams.count()
    assert n_bigrams > 1000  # adversarial: far more bigrams than vocab

    full = {r["doc_id"]: r["perplexity"]
            for r in score_perplexity(docs, lm, max_broadcast_bigrams=None).collect()}
    capped = {r["doc_id"]: r["perplexity"]
              for r in score_perplexity(docs, lm, max_broadcast_bigrams=100).collect()}
    loose = {r["doc_id"]: r["perplexity"]
             for r in score_perplexity(docs, lm, max_broadcast_bigrams=10**9).collect()}

    assert full.keys() == capped.keys() == loose.keys()
    for d in full:
        assert math.isfinite(capped[d]) and capped[d] > 0
        assert capped[d] >= full[d] * (1 - 1e-12)  # floor only raises ppl
        assert loose[d] == full[d]  # cap above table size: identical
    # the top-count bigrams survive: the repetitive docs (1, 2) score close
    # to their uncapped perplexity (their bigrams are the head of the table)
    for d in (1, 2):
        assert capped[d] == pytest.approx(full[d], rel=0.35)
