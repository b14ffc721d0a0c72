"""Sequence packing (operators/packing.py): chop + greedy policies,
python-oracle parity, conservation properties, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import packing as PK


def _docs(spark, lens, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, n) for i, n in enumerate(lens)], ["doc_id", "n_tokens"]
    )


def _py_chop(lens_by_id, L):
    """Reference implementation: (seq_id, doc_id, begin, n_toks) rows."""
    out, pos = [], 0
    for doc_id, n in sorted(lens_by_id.items()):
        if n <= 0:
            continue
        s, e = pos, pos + n
        for k in range(s // L, (e - 1) // L + 1):
            lo, hi = max(s, k * L), min(e, (k + 1) * L)
            out.append((k, doc_id, lo - s, hi - lo))
        pos = e
    return sorted(out)


def test_hand_computed_chop(spark):
    # lens 5,3,4 with L=4: stream |01234|567|89AB| -> blocks 0123 4567 89AB
    rows = sorted(
        tuple(r) for r in PK.pack_sequences(_docs(spark, [5, 3, 4]), 4).collect()
    )
    assert rows == [
        (0, 0, 0, 4),  # doc0 tokens 0-3
        (1, 0, 4, 1),  # doc0 straddles: token 4
        (1, 1, 0, 3),  # doc1 fills block 1
        (2, 2, 0, 4),  # doc2 exactly block 2
    ]


@pytest.mark.parametrize("group_size", [1, 3, 4096])
def test_python_oracle_parity_any_grouping(spark, group_size):
    import random

    rng = random.Random(42)
    lens = {i: rng.randint(0, 50) for i in range(80)}
    df = spark.createDataFrame(list(lens.items()), ["doc_id", "n_tokens"])
    got = sorted(
        tuple(r)
        for r in PK.pack_sequences(df, 32, group_size=group_size).collect()
    )
    assert got == _py_chop(lens, 32)


def test_conservation_properties(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import word_count

    L = 64
    docs = tables["documents"].select(
        "doc_id", word_count("text").cast("long").alias("n_tokens")
    )
    packed = PK.pack_sequences(docs, L, group_size=16).cache()
    # every doc's slices add back to its token count
    per_doc = {
        r.doc_id: r.tot
        for r in packed.groupBy("doc_id").agg(F.sum("n_toks").alias("tot")).collect()
    }
    for r in docs.collect():
        if r.n_tokens > 0:
            assert per_doc[r.doc_id] == r.n_tokens
    # every sequence is exactly L tokens except the last
    seqs = sorted(
        (r.seq_id, r.tot)
        for r in packed.groupBy("seq_id").agg(F.sum("n_toks").alias("tot")).collect()
    )
    assert all(t == L for _, t in seqs[:-1])
    assert 0 < seqs[-1][1] <= L
    # seq ids are dense from 0
    assert [s for s, _ in seqs] == list(range(len(seqs)))
    packed.unpersist()


def test_greedy_bins_respect_capacity_and_order(spark):
    lens = [10, 20, 30, 15, 25, 60, 5, 5, 5]
    out = PK.pack_sequences_greedy(_docs(spark, lens), 50, group_size=4096)
    rows = sorted((r.doc_id, r.bin_id, r.n_toks, r.overflow) for r in out.collect())
    fills, overflowed = {}, set()
    for doc_id, bin_id, n, ov in rows:
        fills.setdefault(bin_id, 0)
        fills[bin_id] += n
        assert ov == (n > 50)  # only the 60-token doc overflows
        if ov:
            overflowed.add(bin_id)
    assert all(f <= 50 for b, f in fills.items() if b not in overflowed)
    # greedy walk: 10+20 | 30+15 | 25 ... bins in doc order
    by_bin = {}
    for doc_id, bin_id, n, _ in rows:
        by_bin.setdefault(bin_id, []).append(doc_id)
    assert sorted(by_bin.values()) == [[0, 1], [2, 3], [4], [5], [6, 7, 8]]


def test_greedy_overflow_doc_gets_own_bin(spark):
    out = PK.pack_sequences_greedy(_docs(spark, [10, 99, 10]), 50)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].overflow
    bins = [r.bin_id for r in rows.values()]
    assert len({rows[0].bin_id, rows[1].bin_id, rows[2].bin_id}) == 3
    assert not rows[0].overflow and not rows[2].overflow


def test_greedy_bins_never_span_groups(spark):
    out = PK.pack_sequences_greedy(_docs(spark, [5] * 20), 1000, group_size=8)
    rows = sorted((r.doc_id, r.bin_id) for r in out.collect())
    for doc_id, bin_id in rows:
        assert bin_id >> 32 == doc_id // 8


def test_zero_and_empty_docs_excluded(spark):
    out = PK.pack_sequences(_docs(spark, [0, 5, 0]), 4).collect()
    assert sorted(set(r.doc_id for r in out)) == [1]


def test_no_global_corpus_sort_in_plan(spark, tables):
    """The whole point: the corpus-sized side must never hit a
    single-partition window. The only unpartitioned window runs over the
    per-group totals (rows = n_groups). We assert the plan has at most one
    Exchange SinglePartition and that it sits above the totals aggregate,
    not the corpus scan — by checking the corpus-side window is hash
    partitioned."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import word_count
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    docs = tables["documents"].select(
        "doc_id", word_count("text").cast("long").alias("n_tokens")
    )
    rep = plan_report(PK.pack_sequences(docs, 64, group_size=16))
    assert rep.raw.count("Exchange SinglePartition") <= 1
    assert "hashpartitioning(_g" in rep.raw
    assert rep.python_evals == 0


def test_pack_corpus_chunks_per_split_no_leakage(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.packing import pack_corpus_chunks
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    chunks = prepare_training_corpus(tables["documents"]).cache()
    packed = pack_corpus_chunks(chunks, seq_len=64, group_size=32).cache()
    # sequences are split-pure by construction; per-(split, seq) totals
    # are exactly 64 except each split's tail
    per_seq = (
        packed.groupBy("split", "seq_id").agg(F.sum("n_toks").alias("t")).collect()
    )
    tails = {}
    for r in per_seq:
        if r.t != 64:
            tails.setdefault(r.split, []).append(r.t)
    for s, ts in tails.items():
        assert len(ts) == 1 and 0 < ts[0] <= 64, (s, ts)
    # every chunk's tokens are fully laid out
    chunk_tot = {
        (r.split, r.doc_id, r.chunk_id): r.n_tokens
        for r in chunks.select("split", "doc_id", "chunk_id", "n_tokens").collect()
    }
    laid = {
        (r.split, r.doc_id, r.chunk_id): r.t
        for r in packed.groupBy("split", "doc_id", "chunk_id")
        .agg(F.sum("n_toks").alias("t"))
        .collect()
    }
    assert laid == chunk_tot
    chunks.unpersist(); packed.unpersist()


def test_pack_corpus_chunks_guards_chunk_id_overflow(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.packing import pack_corpus_chunks
    from pyspark.sql.utils import AnalysisException

    bad = spark.createDataFrame(
        [("train", 1, 5, 10)], ["split", "doc_id", "chunk_id", "n_tokens"]
    )
    with pytest.raises(Exception, match="chunk_id|ASSERT"):
        pack_corpus_chunks(bad, seq_len=8, chunk_bits=2).collect()


def test_pack_corpus_chunks_groups_span_documents_not_chunks(spark, monkeypatch):
    """Regression: the surrogate id doc_id*2^chunk_bits+chunk_id lives in a
    space where consecutive documents are 2^chunk_bits apart, so the
    grouping passed to pack_sequences must be scaled by 2^chunk_bits —
    otherwise every id-range group holds chunks of ~one document and the
    per-group totals frame (single-partition window + broadcast) becomes
    corpus-sized."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators import packing as P

    seen = []
    real = P.pack_sequences

    def spy(*a, **kw):
        seen.append(kw.get("group_size"))
        return real(*a, **kw)

    monkeypatch.setattr(P, "pack_sequences", spy)
    chunks = spark.createDataFrame(
        [("train", d, c, 7) for d in range(6) for c in range(3)],
        ["split", "doc_id", "chunk_id", "n_tokens"],
    )
    out = P.pack_corpus_chunks(chunks, seq_len=16, chunk_bits=20, group_size=4096)
    assert seen == [4096 << 20]
    # and the layout is still exact: every chunk fully laid out
    laid = {
        (r.doc_id, r.chunk_id): r.t
        for r in out.groupBy("doc_id", "chunk_id").agg(F.sum("n_toks").alias("t")).collect()
    }
    assert laid == {(d, c): 7 for d in range(6) for c in range(3)}
