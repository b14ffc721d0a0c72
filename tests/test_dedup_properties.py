"""Property tests: dedup operators vs plain-Python oracles over random
corpora (hypothesis drives corpus shape; Spark must agree exactly)."""

from itertools import combinations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import dedup as DD

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)


def _shingle_set(text: str, n: int) -> set:
    w = text.lower().split()
    if not w:
        return {""}  # shingles() emits one empty-join shingle for empty text
    if len(w) <= n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


@settings(max_examples=12, deadline=None)
@given(corpus=corpus_strategy)
def test_ngram_jaccard_matches_python_oracle(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in DD.ngram_jaccard_pairs(df, n=2, threshold=0.01).collect()
    }
    expect = {}
    sets = {i: _shingle_set(t, 2) for i, t in enumerate(corpus)}
    for a, b in combinations(sorted(sets), 2):
        union = sets[a] | sets[b]
        if union:
            j = len(sets[a] & sets[b]) / len(union)
            if j >= 0.01:
                expect[(a, b)] = round(j, 9)
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(corpus=corpus_strategy)
def test_exact_dedup_partitions_by_normalized_text(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    rows = DD.exact_dedup(df).collect()
    # groups partition the corpus
    assert sum(r.dup_count for r in rows) == len(corpus)
    # group count equals count of distinct normalized texts
    norm = {" ".join(t.lower().split()) for t in corpus}
    assert len(rows) == len(norm)
    # keep_id is the minimum member id of each group
    by_norm = {}
    for i, t in enumerate(corpus):
        by_norm.setdefault(" ".join(t.lower().split()), []).append(i)
    assert sorted(r.keep_id for r in rows) == sorted(min(v) for v in by_norm.values())


@settings(max_examples=8, deadline=None)
@given(corpus=corpus_strategy)
def test_identical_docs_always_become_band_pair_candidates(spark, corpus):
    # duplicate the first doc so at least one identical pair exists
    docs = list(enumerate(corpus + [corpus[0]]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in DD.minhash_lsh_pairs(df, num_hashes=8, bands=2, shingle_size=2).collect()
    }
    # identical text -> identical signature -> shares every band
    assert (0, len(corpus)) in pairs
