"""Property tests for the round-7 operators vs plain-Python oracles over
random inputs (hypothesis drives the shapes; Spark must agree exactly)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import splits, vocab

group_sizes = st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=4)


def _bucket(seed: int, i) -> int:
    # cap_per_group's stage-namespaced selection hash (see split_bucket)
    return int(hashlib.md5(f"cap:{seed}:{i}".encode()).hexdigest()[:8], 16)


@settings(max_examples=10, deadline=None)
@given(sizes=group_sizes, n=st.integers(min_value=1, max_value=8))
def test_cap_per_group_keeps_exactly_min_n_size(spark, sizes, n):
    rows, nid = [], 0
    for gi, sz in enumerate(sizes):
        for _ in range(sz):
            rows.append((nid, f"g{gi}"))
            nid += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = splits.cap_per_group(df, "source", n=n, seed=3).collect()
    by_group: dict[str, list] = {}
    for r in got:
        by_group.setdefault(r["source"], []).append(r)
    for gi, sz in enumerate(sizes):
        g = f"g{gi}"
        kept = by_group.get(g, [])
        assert len(kept) == min(n, sz)
        # the kept set is the md5-rank prefix — the python oracle agrees
        ids = [i for i, s in rows if s == g]
        want = set(sorted(ids, key=lambda i: (_bucket(3, i), i))[:n])
        assert {r["doc_id"] for r in kept} == want


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["aa", "ab", "bb", "cab"]), min_size=0, max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    ),
    merges=st.integers(min_value=1, max_value=6),
)
def test_bpe_encode_concatenation_invariant(spark, texts, merges):
    """Whatever the corpus and merge count, encoding any word and joining
    the pieces reproduces word + end marker — BPE is a segmentation, never
    a rewrite."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    model = vocab.learn_bpe(df, num_merges=merges)
    for t in texts:
        for w in t.split():
            assert "".join(vocab.bpe_encode(w, model)) == w + "</w>"


@settings(max_examples=10, deadline=None)
@given(
    weights=st.lists(
        st.tuples(st.integers(0, 1000), st.floats(-5, 5)), min_size=1, max_size=12
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_gumbel_resample_is_a_pure_function_of_ids_and_weights(spark, weights, k):
    """The selected set depends only on (id, logw, seed) — never on row
    order or partitioning."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators import dsir

    rows = [(i, float(w)) for i, (i2, w) in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, logw double")
    a = sorted(r["doc_id"] for r in dsir.gumbel_resample(df, k=k, seed=5).collect())
    b = sorted(
        r["doc_id"]
        for r in dsir.gumbel_resample(
            df.orderBy(F.desc("doc_id")).repartition(3), k=k, seed=5
        ).collect()
    )
    assert a == b and len(a) == min(k, len(rows))
