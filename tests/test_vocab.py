"""Vocabulary induction (operators/vocab.py): exact counts vs a python
oracle, coverage arithmetic, BPE pair-counting equivalence with counting
over the raw corpus, and plan shape (top-k via TakeOrderedAndProject)."""

from __future__ import annotations

from collections import Counter

import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators import vocab

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat cat cat"),
    (3, ""),
    (4, None),
    (5, "The CAT"),  # lowercased: counts merge with 'the'/'cat'
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_stats():
    cf: Counter[str] = Counter()
    dfreq: Counter[str] = Counter()
    for _, t in DOCS:
        ws = (t or "").strip().lower().split()
        cf.update(ws)
        dfreq.update(set(ws))
    return cf, dfreq


def test_term_stats_exact(docs):
    cf, dfreq = _py_stats()
    got = {r["term"]: (r["cf"], r["df"]) for r in vocab.term_stats(docs).collect()}
    assert got == {t: (cf[t], dfreq[t]) for t in cf}


def test_top_vocab_rank_and_coverage(docs):
    cf, _ = _py_stats()
    total = sum(cf.values())
    order = sorted(cf, key=lambda t: (-cf[t], t))
    rows = vocab.top_vocab(docs, k=3).orderBy("rank").collect()
    assert [r["term"] for r in rows] == order[:3]
    running = 0
    for r in rows:
        running += cf[r["term"]]
        assert r["coverage"] == running / total
    # full vocab covers everything exactly
    full = vocab.top_vocab(docs, k=1000).orderBy("rank").collect()
    assert full[-1]["coverage"] == 1.0


def test_bpe_candidates_match_corpus_counting(docs):
    """Counting pairs over the weighted term table must equal counting
    pairs over every token occurrence in the corpus — the equivalence
    that lets BPE iterate on the vocab table instead of the corpus."""
    corpus_pairs: Counter[str] = Counter()
    for _, t in DOCS:
        for w in (t or "").strip().lower().split():
            for i in range(len(w) - 1):
                corpus_pairs[w[i : i + 2]] += 1
    got = {
        r["pair"]: r["weight"]
        for r in vocab.bpe_merge_candidates(vocab.term_stats(docs), top_m=1000).collect()
    }
    assert got == dict(corpus_pairs)
    # rank 1 is the argmax pair with pair-string tiebreak
    best = min(corpus_pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    top = (
        vocab.bpe_merge_candidates(vocab.term_stats(docs), top_m=5)
        .orderBy("rank")
        .first()
    )
    assert top["pair"] == best


def test_topk_plan_avoids_global_sort(docs):
    plan = vocab.top_vocab(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def _py_learn_bpe(word_freqs, num_merges):
    """Reference BPE trainer (independent re-implementation for parity)."""
    words_ = {tuple(w) + ("</w>",): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, cnt in words_.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(list(best))
        nw = {}
        for syms, cnt in words_.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + cnt
        words_ = nw
    return merges


BPE_DOCS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest newest newest newest"),
    (2, "widest widest widest new new"),
]


@pytest.fixture(scope="module")
def bpe_docs(spark):
    return spark.createDataFrame(BPE_DOCS, "doc_id long, text string")


def test_learn_bpe_matches_reference(bpe_docs):
    freqs = Counter()
    for _, t in BPE_DOCS:
        freqs.update(t.split())
    model = vocab.learn_bpe(bpe_docs, num_merges=8)
    assert model["merges"] == _py_learn_bpe(dict(freqs), 8)
    # every merged symbol is in the vocab
    for a, b in model["merges"]:
        assert a + b in model["vocab"]


def test_bpe_encode_round_trip(bpe_docs):
    model = vocab.learn_bpe(bpe_docs, num_merges=10)
    for w in ("low", "lower", "newest", "widest", "new", "unseen"):
        toks = vocab.bpe_encode(w, model)
        assert "".join(toks) == w + "</w>"


def test_bpe_tokenize_col_matches_python(bpe_docs):
    model = vocab.learn_bpe(bpe_docs, num_merges=6)
    rows = bpe_docs.select(
        "doc_id", vocab.bpe_tokenize_col(model, "text").alias("toks")
    ).collect()
    got = {r["doc_id"]: list(r["toks"]) for r in rows}
    for did, text in BPE_DOCS:
        want = [t for w in text.lower().split() for t in vocab.bpe_encode(w, model)]
        assert got[did] == want, did
    # empty/NULL text -> []
    from pyspark.sql import functions as F
    extra = bpe_docs.sparkSession.createDataFrame(
        [(9, ""), (10, None)], "doc_id long, text string"
    )
    er = {
        r["doc_id"]: list(r["toks"])
        for r in extra.select("doc_id", vocab.bpe_tokenize_col(model, "text").alias("toks")).collect()
    }
    assert er == {9: [], 10: []}


def test_learn_bpe_deterministic_across_partitionings(bpe_docs):
    a = vocab.learn_bpe(bpe_docs, num_merges=5)
    b = vocab.learn_bpe(bpe_docs.repartition(7), num_merges=5)
    assert a == b
